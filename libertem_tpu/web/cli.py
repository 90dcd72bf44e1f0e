"""``libertem-tpu-server`` CLI
(reference: libertem/web/cli.py:60 — port, host, browser, token file,
preload, open-ds).  Run as ``python -m libertem_tpu.web.cli``.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="libertem_tpu web API server"
    )
    parser.add_argument("--host", default="localhost")
    parser.add_argument("--port", type=int, default=9000)
    parser.add_argument("--browser", action="store_true",
                        help="open a browser after startup")
    parser.add_argument("--token-path", default=None,
                        help="file containing the auth token")
    parser.add_argument("--log-level", default="INFO")
    parser.add_argument(
        "--preload", action="append", default=[],
        help="module(s) to import before starting",
    )
    args = parser.parse_args(argv)
    logging.basicConfig(level=args.log_level.upper())
    from ..common.tracing import maybe_setup_tracing
    from ..preload import do_preloads, preload_modules
    maybe_setup_tracing("libertem-tpu-server")
    do_preloads()  # LIBERTEM_TPU_PRELOAD env hook
    preload_modules(args.preload)
    token = None
    if args.token_path:
        with open(args.token_path) as f:
            token = f.read().strip()
    from .server import run_server
    run_server(
        host=args.host, port=args.port, token=token,
        browser=args.browser,
    )


if __name__ == "__main__":
    main()
