"""``libertem-worker``-equivalent entry point
(reference: executor/cli.py:19 connects dask workers to a scheduler).

There are no worker processes to launch in the TPU design — the
"workers" are the devices of the local jax mesh, driven by a single
controller.  This module exists to give migrating users an
actionable message.
"""
import sys


def main(argv=None):
    sys.stderr.write(
        "libertem_tpu has no separate worker processes: execution is\n"
        "single-controller over the local jax device mesh. Use\n"
        "Context.make_with('sharded') in your script, or start the\n"
        "GUI with `python -m libertem_tpu.web.cli`.\n"
    )
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
