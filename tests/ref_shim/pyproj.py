"""Stub pyproj — satisfies the reference's module-level import; the golden
paths never call projection (srs_out is None)."""


class Proj:
    def __init__(self, *a, **k):
        raise NotImplementedError("pyproj stub: projection not available")


def transform(*a, **k):
    raise NotImplementedError("pyproj stub: projection not available")
