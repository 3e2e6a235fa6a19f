"""Geohash encode — the third north-rule bucketing index next to the S2
quad id (functions/s2.py) and the planar Morton grid (functions/geometry
xyz_to_key): base32 interleaved-bit geohash of (lon, lat), built as ONE
native column expression — zero Python, zero UDF — plus a character-
identical ANSI-SQL generator for the DuckDB gate oracle.

Construction (public geohash spec, Niemeyer 2008): binary-subdivide the
(lon, lat) box MSB-first, lon owns the even global bit positions and lat
the odd ones; every 5 bits become one character of the base32 alphabet
"0123456789bcdefghjkmnpqrstuvwxyz". Equivalent closed form used here:
quantize lon to ceil(5p/2) bits and lat to floor(5p/2) bits as integers,
interleave, slice 5-bit groups. A shared prefix = a shared ancestor cell,
so the string is range-partitionable and prefix-joinable exactly like the
tiler's quadkeys.

Boundary caveat (hypothesis-found): the closed form computes
floor((v - lo) / range * 2^bits); for inputs within one ulp of a cell
boundary the `v - lo` addition can round across it, so such points may
land one cell off versus the textbook successive-bisection formulation
(which compares against exact midpoints). The closed form is what BOTH
the Spark expr and the SQL twin evaluate — bit-identical doubles either
side — so engine parity always holds; only sub-ulp-from-boundary inputs
differ from other geohash libraries.

At 100 TB this is the cheap bucketing path for lat/lon keyed corpora:
the whole encode stays inside whole-stage codegen, groupBy(geohash)
gets map-side partial aggregation, and prefix truncation
(substring(gh, 1, k)) gives every coarser rollup level without
re-encoding.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
MAX_PRECISION = 12          # 60 bits total: lon 30 + lat 30, fits BIGINT


def _check_precision(precision: int) -> tuple[int, int]:
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError(f"precision must be in [1, {MAX_PRECISION}]")
    total = 5 * precision
    lon_bits = (total + 1) // 2         # lon owns even positions -> ceil
    lat_bits = total // 2
    return lon_bits, lat_bits


def geohash_expr(precision: int = 7, lon_col: str = "x",
                 lat_col: str = "y") -> Column:
    """Geohash string of `precision` chars as one native expression."""
    lon_bits, lat_bits = _check_precision(precision)
    lon = F.col(lon_col).cast("double")
    lat = F.col(lat_col).cast("double")

    def quant(v: Column, lo: float, hi: float, bits: int) -> Column:
        n = 1 << bits
        raw = F.floor((v - lo) / (hi - lo) * n).cast("long")
        return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1))

    qlon = quant(lon, -180.0, 180.0, lon_bits)
    qlat = quant(lat, -90.0, 90.0, lat_bits)
    # global bit g (0 = MSB) is even -> lon bit, odd -> lat bit
    total = 5 * precision
    interleaved = F.lit(0).cast("long")
    for g in range(total):
        if g % 2 == 0:
            src, src_bits, pos = qlon, lon_bits, g // 2
        else:
            src, src_bits, pos = qlat, lat_bits, g // 2
        bit = F.shiftright(src, src_bits - 1 - pos).bitwiseAND(F.lit(1))
        interleaved = interleaved.bitwiseOR(
            F.shiftleft(bit, total - 1 - g))
    chars = [
        F.substring(
            F.lit(BASE32),
            (F.shiftright(interleaved, total - 5 * (c + 1))
             .bitwiseAND(F.lit(31)) + 1).cast("int"),
            1)
        for c in range(precision)]
    return F.concat(*chars)


def geohash_sql(precision: int, lon_sql: str, lat_sql: str) -> str:
    """The DuckDB/ANSI twin of geohash_expr as a SQL scalar expression
    over lon/lat sub-expressions — used by oracle_sql()."""
    lon_bits, lat_bits = _check_precision(precision)

    def quant(v: str, lo: float, hi: float, bits: int) -> str:
        n = 1 << bits
        return (f"least(greatest(CAST(floor((({v}) - ({lo})) / {hi - lo!r}"
                f" * {n}) AS BIGINT), 0), {n - 1})")

    qlon = quant(lon_sql, -180.0, 180.0, lon_bits)
    qlat = quant(lat_sql, -90.0, 90.0, lat_bits)
    total = 5 * precision
    parts = []
    for g in range(total):
        if g % 2 == 0:
            src, src_bits, pos = qlon, lon_bits, g // 2
        else:
            src, src_bits, pos = qlat, lat_bits, g // 2
        parts.append(f"((({src} >> {src_bits - 1 - pos}) & 1)"
                     f" << {total - 1 - g})")
    inter = " | ".join(parts)
    chars = [
        f"substring('{BASE32}', "
        f"CAST(((({inter}) >> {total - 5 * (c + 1)}) & 31) + 1 AS INTEGER), 1)"
        for c in range(precision)]
    return " || ".join(chars)
