"""Z-order layout: per-file min/max envelopes must stay narrow on BOTH
dimensions (that's the whole point), measured from real parquet footer
statistics."""

import glob
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dataset_grouper_spark.sinks import zorder


def _file_envelopes(path, cols):
    """[(min, max) per col] for each data file, from footer stats."""
    out = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        envs = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in cols:
                    continue
                st = col.statistics
                lo, hi = envs.get(name, (st.min, st.max))
                envs[name] = (min(lo, st.min), max(hi, st.max))
        out.append(envs)
    return out


@pytest.fixture(scope="module")
def grid_df(spark):
    return (
        spark.range(256 * 256)
        .select(
            (F.col("id") % 256).alias("x"),
            (F.col("id") / 256).cast("long").alias("y"),
        )
    )


def test_morton_interleave_known_values(spark):
    df = spark.createDataFrame([(3, 5)], "a long, b long")
    z = df.select(zorder.interleave_bits(F.col("a"), F.col("b"), 4).alias("z"))
    # a=0011, b=0101 -> z bits (a1 b0 a0 b1 ...) little pairs:
    # z = sum a_i<<(2i+1) + b_i<<2i = (1<<1)+(1<<3) + (1<<0)+(1<<4) = 27
    assert z.collect()[0]["z"] == 27


def test_to_grid_clamps(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (99.9,), (100.0,), (200.0,)], "v double")
    g = df.select(zorder.to_grid(F.col("v"), 0.0, 100.0, 4).alias("g"))
    vals = [r["g"] for r in g.collect()]
    assert vals[0] == 0 and vals[1] == 0
    assert vals[3] == 15 and vals[4] == 15


def test_zorder_envelopes_narrow_both_dims(spark, grid_df):
    zpath = tempfile.mkdtemp(prefix="zord_")
    xpath = tempfile.mkdtemp(prefix="xsort_")
    zorder.write_zordered(
        grid_df, zpath, F.col("x"), F.col("y"), bits=8, num_files=16
    )
    # baseline: classic single-column sort layout
    (
        grid_df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    zenv = _file_envelopes(zpath, {"x", "y"})
    xenv = _file_envelopes(xpath, {"x", "y"})
    assert len(zenv) == 16

    def mean_span(envs, c):
        return sum(e[c][1] - e[c][0] for e in envs) / len(envs)

    # z-order: both dims' envelopes are bounded fractions of the
    # domain (range boundaries don't align with Morton blocks, so
    # segments straddle two blocks — ~0.4-0.5 domain, not the aligned
    # ideal of 0.25; still a fraction on BOTH dims)
    assert mean_span(zenv, "x") <= 0.55 * 255
    assert mean_span(zenv, "y") <= 0.55 * 255
    # x-sorted: x razor-thin but y covers ~the whole domain
    assert mean_span(xenv, "x") <= 0.15 * 255
    assert mean_span(xenv, "y") >= 0.9 * 255

    # pruning a y-only box query: at least half the z-files are
    # skippable from footer stats alone; NO x-sorted file is
    box = lambda envs: sum(
        1 for e in envs if not (e["y"][1] < 0 or e["y"][0] > 31)
    )
    assert box(zenv) <= len(zenv) // 2
    assert box(xenv) == len(xenv)


def test_zorder_roundtrip_rows(spark, grid_df):
    zpath = tempfile.mkdtemp(prefix="zord_rt_")
    zorder.write_zordered(
        grid_df, zpath, F.col("x"), F.col("y"), bits=8, num_files=8
    )
    back = spark.read.parquet(zpath)
    assert back.count() == 256 * 256
    assert back.columns == ["x", "y"]
    s = back.agg(F.sum("x"), F.sum("y")).collect()[0]
    assert s[0] == s[1] == 255 * 256 // 2 * 256


def test_morton_interleave_is_bijective_property(spark):
    import random

    rng = random.Random(11)
    pairs = [(rng.randrange(256), rng.randrange(256)) for _ in range(64)]
    df = spark.createDataFrame(pairs, "a long, b long")
    rows = df.select(
        "a", "b", zorder.interleave_bits(F.col("a"), F.col("b"), 8).alias("z")
    ).collect()

    def deinterleave(z):
        a = b = 0
        for i in range(8):
            b |= ((z >> (2 * i)) & 1) << i
            a |= ((z >> (2 * i + 1)) & 1) << i
        return a, b

    for r in rows:
        assert deinterleave(r["z"]) == (r["a"], r["b"])
    # distinct inputs -> distinct codes
    assert len({r["z"] for r in rows}) == len({(a, b) for a, b in pairs})
