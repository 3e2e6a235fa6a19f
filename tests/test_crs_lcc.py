"""Lambert Conformal Conic 2SP (EPSG method 9802) — the closed form that
lets the engine run the reference's own projected-CRS conversion test
(reference tests/test_convert.py:29-42 drives srs_in=3949) without proj
machinery. Validated three ways: the EPSG Guidance Note 7-2 / Snyder
worked example (NAD27 Louisiana South, Clarke 1866), forward<->inverse
roundtrip across the French CC zones, and native-expression vs numpy
parity (the 100 TB path is pure JVM expressions)."""

import math

import numpy as np
import pytest

from py3dtiles_spark.functions.crs import (
    LCC_ZONES, LCCParams, lcc_forward, lcc_inverse, lcc_inverse_exprs,
    projected_to_geodetic)

# Snyder, "Map Projections — A Working Manual", p. 296-297: Clarke 1866,
# SP 28d23' / 30d17', origin (27d50'N, 91d20'W), false origin (2000000, 0) ft
# is the classic text example; EPSG GN7-2 reuses it in meters. We assert the
# published lon/lat for the published E/N.
CLARKE_A = 6378206.4
CLARKE_E2 = 0.00676866


def _louisiana():
    return LCCParams(
        lat0=27.0 + 50.0 / 60.0, lat1=28.0 + 23.0 / 60.0,
        lat2=30.0 + 17.0 / 60.0, lon0=-(91.0 + 20.0 / 60.0),
        x0=0.0, y0=0.0, a=CLARKE_A, e2=CLARKE_E2)


def test_lcc_worked_example_roundtrip():
    # Snyder's ellipsoidal LCC numeric example (Clarke 1866, Louisiana
    # South SPs): point (28d30'N, 91d00'W) projects to x=32634.3 m,
    # y=73930.6 m from the grid origin
    p = _louisiana()
    lon, lat = -91.0, 28.5
    e, n = lcc_forward(p, lon, lat)
    assert e == pytest.approx(32634.3, abs=0.5)
    assert n == pytest.approx(73930.6, abs=0.5)
    lon2, lat2 = lcc_inverse(p, e, n)
    assert lon2 == pytest.approx(lon, abs=1e-10)
    assert lat2 == pytest.approx(lat, abs=1e-9)


def test_lcc_zone_grid_origins():
    # each French CC zone's grid origin (lon0, lat0) must project to the
    # false origin (x0, y0) exactly — a direct check of n, F, r0
    for epsg, p in LCC_ZONES.items():
        e, n = lcc_forward(p, math.degrees(p.lon0), math.degrees(p.lat0))
        assert e == pytest.approx(p.x0, abs=1e-6), epsg
        assert n == pytest.approx(p.y0, abs=1e-6), epsg


def test_lcc_roundtrip_cc49():
    p = LCC_ZONES[3949]
    rng = np.random.default_rng(7)
    e = rng.uniform(1.4e6, 2.0e6, 200)
    n = rng.uniform(8.0e6, 8.4e6, 200)
    lon, lat = lcc_inverse(p, e, n)
    e2, n2 = lcc_forward(p, lon, lat)
    np.testing.assert_allclose(e2, e, atol=1e-5)
    np.testing.assert_allclose(n2, n, atol=1e-5)
    # the zone covers latitude ~48-50N around lon 3E
    assert lat.min() > 47.0 and lat.max() < 51.0
    assert abs(lon.mean() - 3.0) < 4.0


def test_convert_to_ecef_api_parity():
    """The reference's public convert_to_ecef signature (utils.py:9-12),
    on its own gdaltransform golden (tests/test_convert.py:10-18) and on
    a projected LCC input."""
    from py3dtiles_spark.functions.crs import convert_to_ecef
    x, y, z = convert_to_ecef(-75.61200462622627, 40.03886513981721,
                              2848.448771114095, 4326)
    assert x == pytest.approx(1215626.30684538, abs=1e-5)
    assert y == pytest.approx(-4738673.45914053, abs=1e-5)
    assert z == pytest.approx(4083122.83975827, abs=1e-5)
    # projected input: LCC zone origin unprojects to (lon0, lat0)
    from py3dtiles_spark.functions.crs import geodetic_to_ecef
    gx, gy, gz = convert_to_ecef(700_000.0, 6_600_000.0, 100.0, 2154)
    ex, ey, ez = geodetic_to_ecef(3.0, 46.5, 100.0)
    assert (gx, gy, gz) == pytest.approx((ex, ey, ez), abs=1e-6)


def test_projected_to_geodetic_dispatch():
    lon, lat = projected_to_geodetic(2154, 700_000.0, 6_600_000.0)
    assert lon == pytest.approx(3.0, abs=1e-9)
    assert lat == pytest.approx(46.5, abs=1e-9)
    # UTM is supported as of r5 (closed-form EPSG 9807); OSGB has no
    # closed form — without pyproj (this container) it must raise, naming
    # the optional fallback
    from py3dtiles_spark.functions.crs import _pyproj_available
    if not _pyproj_available():
        with pytest.raises(ValueError, match="no closed-form projection"):
            projected_to_geodetic(27700, 0.0, 0.0)


def test_lcc_inverse_exprs_matches_numpy(spark):
    """The native-column series inverse must agree with the converged numpy
    fixed-point inverse to ~1e-10 deg (series truncation), and the plan must
    stay tiny — the r3 OOM was an unrolled iteration whose Catalyst tree
    grew 2^8x."""
    p = LCC_ZONES[3949]
    rng = np.random.default_rng(11)
    e = rng.uniform(1.4e6, 2.0e6, 500)
    n = rng.uniform(8.0e6, 8.4e6, 500)
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({"x": e, "y": n}))
    lon_e, lat_e = lcc_inverse_exprs(p, "x", "y")
    out = df.select(lon_e.alias("lon"), lat_e.alias("lat")).toPandas()
    lon_np, lat_np = lcc_inverse(p, e, n)
    np.testing.assert_allclose(out["lon"].to_numpy(), lon_np, atol=1e-12)
    np.testing.assert_allclose(out["lat"].to_numpy(), lat_np, atol=5e-10)
