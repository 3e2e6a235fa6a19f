"""Stub lz4.frame (zlib-backed) — only used when importing the reference
node_catalog in the golden generator; compression codec choice does not
affect tiling semantics."""

import zlib


def compress(data, *a, **k):
    return zlib.compress(data)


def decompress(data, *a, **k):
    return zlib.decompress(data)
