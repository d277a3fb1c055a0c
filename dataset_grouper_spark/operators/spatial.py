"""Geospatial radius join — north-star extension.

The scale shape mirrors every other "similarity" operator in this
engine (LSH bands, IVF cells, ER blocks): NEVER all-pairs. Points land
in an equirectangular degree grid; each left point probes its own cell
plus the neighbor ring, so candidate pairs come from ONE exploded
equijoin on (cell_x, cell_y) and the exact haversine predicate only
runs on co-located candidates. A 100 TB point set shuffles once on the
cell key; density skew (a hot city cell) is an AQE skew-join case, the
same answer as everywhere else in the repo.

Cell sizing is the correctness core: the grid guarantees NO FALSE
NEGATIVES iff any two points within ``radius_km`` differ by at most
one cell index on each axis. Latitude degrees are uniform
(111.045 km); longitude degrees shrink by cos(lat), so the cell edge
is sized for the WORST latitude the caller declares (``max_abs_lat``)
— conservative, never lossy, and the declared bound is enforced
against the data INSIDE the plan (an executor-side ``raise_error``
fires on the first out-of-band row — no second scan of a 100 TB point
set, and a silent out-of-band point can never silently lose pairs).

Haversine is a fixed IEEE-754 expression tree (sin/cos/asin/sqrt) that
Spark and DuckDB evaluate to within an ulp; distances round to 4
decimals (0.1 m) on both engines, far above libm divergence.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataset_grouper_spark.functions.hashing import round_even

KM_PER_DEG_LAT = 111.045  # mean earth: 2*pi*R / 360 at R = 6362.132? no:
# 111.045 is the standard mean-latitude degree length used by the
# cos-scaled equirectangular bound (Sinnott's horizon formula); the
# exact value only sizes CELLS (bigger = more candidates, never fewer),
# correctness rides on haversine below.
EARTH_RADIUS_KM = 6371.0088  # IUGG mean radius


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km — the classic haversine form, all
    Catalyst trig (JVM side, codegen'd)."""
    rl1, rl2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlon) * F.sin(dlon)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def haversine_km_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB twin — same expression tree, same constant."""
    return (
        f"2.0 * {EARTH_RADIUS_KM!r} * asin(sqrt("
        f"sin(radians(({lat2}) - ({lat1})) / 2)"
        f" * sin(radians(({lat2}) - ({lat1})) / 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians(({lon2}) - ({lon1})) / 2)"
        f" * sin(radians(({lon2}) - ({lon1})) / 2)))"
    )


def cell_edge_deg(radius_km: float, max_abs_lat: float) -> float:
    """Grid edge (degrees) guaranteeing the one-cell-ring property up
    to ``max_abs_lat``: latitude needs radius/111.045; longitude
    needs that over cos(max|lat|)."""
    import math

    if not 0 <= max_abs_lat < 90:
        raise ValueError("max_abs_lat must be in [0, 90)")
    lat_deg = radius_km / KM_PER_DEG_LAT
    return lat_deg / math.cos(math.radians(max_abs_lat))


def radius_pairs(
    points: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    max_abs_lat: float = 75.0,
) -> DataFrame:
    """All point pairs (id_a < id_b) within ``radius_km``, by
    neighbor-ring grid blocking + exact haversine verify. Output:
    (id_a, id_b, dist_km) with dist rounded to 4 decimals.

    Points beyond ``max_abs_lat`` raise AT RUNTIME, from the executors,
    via an in-plan guard (the cell-ring guarantee would silently break
    otherwise); raise the bound — at the cost of wider cells — or
    handle polar caps with a dedicated band join. The guard is a
    per-row codegen'd branch, not an extra aggregate pass, so a 100 TB
    point set is still scanned exactly once. Callers who want an eager
    pre-flight check instead can call :func:`assert_lat_bound`.
    """
    edge = cell_edge_deg(radius_km, max_abs_lat)
    lat = F.col(lat_col).cast("double")
    guarded_lat = F.when(
        lat.isNotNull() & (F.abs(lat) > max_abs_lat),
        F.raise_error(
            F.concat(
                F.lit("latitude "),
                lat.cast("string"),
                F.lit(
                    f" exceeds declared max_abs_lat={max_abs_lat};"
                    " widen the bound (wider cells) or band the polar"
                    " caps separately"
                ),
            )
        ).cast("double"),
    ).otherwise(lat)
    pts = points.select(
        F.col(id_col).alias("_id"),
        guarded_lat.alias("_lat"),
        F.col(lon_col).cast("double").alias("_lon"),
        F.floor(guarded_lat / edge).cast("long").alias("_cx"),
        F.floor(F.col(lon_col) / edge).cast("long").alias("_cy"),
    )
    # left side probes its 3x3 neighborhood; right side stays put —
    # each unordered candidate pair is produced once per (dx, dy) that
    # matches, and the id_a < id_b filter plus DISTINCT dedups the
    # double-count a pair straddling two cells would get
    offs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(dx).alias("dx"), F.lit(dy).alias("dy")
                )
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    )
    probe = pts.select(
        F.col("_id"), F.col("_lat"), F.col("_lon"),
        F.col("_cx"), F.col("_cy"), offs.alias("_o")
    ).select(
        F.col("_id").alias("id_a"),
        F.col("_lat").alias("lat_a"),
        F.col("_lon").alias("lon_a"),
        (F.col("_cx") + F.col("_o.dx")).alias("_jx"),
        (F.col("_cy") + F.col("_o.dy")).alias("_jy"),
    )
    base = pts.select(
        F.col("_id").alias("id_b"),
        F.col("_lat").alias("lat_b"),
        F.col("_lon").alias("lon_b"),
        F.col("_cx").alias("_jx"),
        F.col("_cy").alias("_jy"),
    )
    dist = haversine_km(
        F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
    )
    return (
        probe.join(base, ["_jx", "_jy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist_km", round_even(dist, 4))
        .filter(F.col("dist_km") <= radius_km)
        .select("id_a", "id_b", "dist_km")
        .distinct()
    )


def assert_lat_bound(points: DataFrame, lat_col: str, max_abs_lat: float) -> None:
    """One cheap aggregate guarding the cell-ring guarantee."""
    row = points.agg(
        F.max(F.abs(F.col(lat_col))).alias("m")
    ).collect()[0]
    if row["m"] is not None and row["m"] > max_abs_lat:
        raise ValueError(
            f"latitude {row['m']} exceeds declared max_abs_lat="
            f"{max_abs_lat}; widen the bound (wider cells) or band the"
            " polar caps separately"
        )


def radius_pairs_sql(
    points_sql: str,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    max_abs_lat: float = 75.0,
) -> str:
    """DuckDB twin of :func:`radius_pairs` — same grid, same neighbor
    ring (a 9-row offset cross join), same haversine + 4-decimal
    round."""
    edge = cell_edge_deg(radius_km, max_abs_lat)
    hav = haversine_km_sql("p.lat_a", "p.lon_a", "b.lat_b", "b.lon_b")
    return f"""
    WITH pts AS (
      SELECT {id_col} AS id,
             CAST({lat_col} AS DOUBLE) AS lat,
             CAST({lon_col} AS DOUBLE) AS lon,
             CAST(floor({lat_col} / {edge!r}) AS BIGINT) AS cx,
             CAST(floor({lon_col} / {edge!r}) AS BIGINT) AS cy
      FROM ({points_sql})
    ),
    offs AS (
      SELECT dx, dy FROM (VALUES (-1),(0),(1)) a(dx),
                         (VALUES (-1),(0),(1)) b(dy)
    ),
    probe AS (
      SELECT p.id AS id_a, p.lat AS lat_a, p.lon AS lon_a,
             p.cx + o.dx AS jx, p.cy + o.dy AS jy
      FROM pts p CROSS JOIN offs o
    ),
    base AS (
      SELECT id AS id_b, lat AS lat_b, lon AS lon_b,
             cx AS jx, cy AS jy FROM pts
    )
    SELECT DISTINCT p.id_a, b.id_b,
           round_even({hav}, 4) AS dist_km
    FROM probe p JOIN base b ON b.jx = p.jx AND b.jy = p.jy
    WHERE p.id_a < b.id_b
      AND round_even({hav}, 4) <= {radius_km!r}
    """
