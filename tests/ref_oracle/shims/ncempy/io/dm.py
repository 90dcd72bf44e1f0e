class fileDM:
    """Metadata-neutral stand-in: the oracle recordings never ship a
    .gtg, so the reference's K2IS nav-shape probe sees no tags and
    falls back to its time-series path (k2is.py:826) — the decode
    path under test is unaffected."""

    def __init__(self, *a, **kw):
        self.allTags = {}

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False
