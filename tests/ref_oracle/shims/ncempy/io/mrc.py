def mrcReader(*a, **kw):
    raise NotImplementedError(
        "ncempy stub: MRC sidecar files not available in the "
        "oracle environment"
    )


class fileMRC:
    def __init__(self, *a, **kw):
        raise NotImplementedError("ncempy stub")
