"""Geospatial radius join: grid blocking vs an all-pairs brute-force
reference (no false negatives/positives), the in-plan latitude-bound
guard, cell sizing math, SQL-twin agreement."""

import math

import duckdb
import pytest

from dataset_grouper_spark.operators import spatial

# (id, lat, lon) — a cluster around one city, a second cluster, a
# point straddling a cell boundary, an antimeridian-adjacent pair is
# deliberately NOT claimed (the grid does not wrap longitude)
POINTS = [
    (1, 40.7128, -74.0060),   # NYC
    (2, 40.7200, -74.0100),   # ~0.9 km from 1
    (3, 40.7589, -73.9851),   # ~5.5 km from 1
    (4, 34.0522, -118.2437),  # LA
    (5, 34.0622, -118.2537),  # ~1.4 km from 4
    (6, 34.0522, -118.2437),  # exact dup of 4 (dist 0)
    (7, -33.8688, 151.2093),  # Sydney, isolated
    (8, 40.7128, -73.9500),   # ~4.7 km east of 1
]
SCHEMA = "id: long, lat: double, lon: double"


def _r4(x):
    # numpy round == rint(x*10^4)/10^4 — bit-identical to the engine's
    # round_even (see functions/hashing.py)
    import numpy as np

    return float(np.round(x, 4))


def _hav(lat1, lon1, lat2, lon2):
    rl1, rl2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = (
        math.sin(dlat) ** 2
        + math.cos(rl1) * math.cos(rl2) * math.sin(dlon) ** 2
    )
    return 2.0 * spatial.EARTH_RADIUS_KM * math.asin(math.sqrt(a))


def _brute(radius_km):
    out = set()
    for i, (ia, la, lo) in enumerate(POINTS):
        for ib, lb, lob in POINTS[i + 1:]:
            a, b = min(ia, ib), max(ia, ib)
            d = _r4(_hav(la, lo, lb, lob))
            if d <= radius_km:
                out.add((a, b, d))
    return out


@pytest.mark.parametrize("radius", [1.0, 2.0, 6.0])
def test_radius_pairs_matches_brute_force(spark, radius):
    df = spark.createDataFrame(POINTS, SCHEMA)
    got = {
        (r["id_a"], r["id_b"], r["dist_km"])
        for r in spatial.radius_pairs(
            df, "id", "lat", "lon", radius
        ).collect()
    }
    assert got == _brute(radius)


def test_out_of_bound_latitude_raises_in_plan(spark):
    df = spark.createDataFrame(
        POINTS + [(99, 89.9, 0.0)], SCHEMA
    )
    out = spatial.radius_pairs(df, "id", "lat", "lon", 2.0)
    with pytest.raises(Exception, match="max_abs_lat"):
        out.collect()


def test_wider_declared_bound_admits_polar_points(spark):
    df = spark.createDataFrame(
        [(1, 89.0, 10.0), (2, 89.0, 10.001)], SCHEMA
    )
    out = spatial.radius_pairs(
        df, "id", "lat", "lon", 2.0, max_abs_lat=89.5
    ).collect()
    assert len(out) == 1 and out[0]["dist_km"] <= 2.0


def test_assert_lat_bound_eager_precheck(spark):
    df = spark.createDataFrame(POINTS, SCHEMA)
    spatial.assert_lat_bound(df, "lat", 75.0)  # no raise
    with pytest.raises(ValueError, match="max_abs_lat"):
        spatial.assert_lat_bound(df, "lat", 40.0)


def test_cell_edge_covers_radius_at_declared_lat():
    # one cell edge in km at max_abs_lat must be >= radius on BOTH axes
    edge = spatial.cell_edge_deg(5.0, 60.0)
    assert edge * spatial.KM_PER_DEG_LAT >= 5.0
    assert (
        edge * spatial.KM_PER_DEG_LAT * math.cos(math.radians(60.0))
        >= 5.0 - 1e-9
    )
    with pytest.raises(ValueError):
        spatial.cell_edge_deg(1.0, 90.0)


def test_sql_twin_agrees(spark):
    df = spark.createDataFrame(POINTS, SCHEMA)
    got = {
        (r["id_a"], r["id_b"], r["dist_km"])
        for r in spatial.radius_pairs(
            df, "id", "lat", "lon", 6.0
        ).collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE points_t AS SELECT * FROM (VALUES "
        + ",".join("(%d, %r, %r)" % p for p in POINTS)
        + ") v(id, lat, lon)"
    )
    want = {
        tuple(r)
        for r in con.sql(
            spatial.radius_pairs_sql(
                "SELECT * FROM points_t", "id", "lat", "lon", 6.0
            )
        ).fetchall()
    }
    assert got == want
