"""Keyer semantics: determinism, range, distribution sanity."""

from pyspark.sql import functions as F

from dataset_grouper_spark import keys


def test_by_feature_stringifies(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id: long, s: string")
    out = keys.with_group_key(df, keys.by_feature("id")).collect()
    assert {r.group_id for r in out} == {"1", "2"}


def test_random_deterministic_and_in_range(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "id: long")
    a = keys.with_group_key(df, keys.random("id", 16)).collect()
    b = keys.with_group_key(df, keys.random("id", 16)).collect()
    assert {r.id: r.group_id for r in a} == {r.id: r.group_id for r in b}
    groups = {int(r.group_id) for r in a}
    assert groups <= set(range(16))
    # uniform-ish: every bucket hit with 1000 rows over 16 buckets
    assert len(groups) == 16


def test_url_domain(spark):
    df = spark.createDataFrame(
        [("https://sub.example.com/x?q=1",), ("http://other.org/",)], "url: string"
    )
    out = keys.with_group_key(df, keys.url_domain("url")).collect()
    assert {r.group_id for r in out} == {"sub.example.com", "other.org"}


def test_dirichlet_respects_label_distribution(spark):
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(2000)], "vec_id: long, label: int"
    )
    keyed = keys.dirichlet(spark, df, "label", "vec_id", 4, 6, alpha=0.5, seed=3)
    rows = keyed.collect()
    assert len(rows) == 2000  # exactly one interval matched per row
    gs = {int(r.group_id) for r in rows}
    assert gs <= set(range(6))
    # determinism
    again = keys.dirichlet(spark, df, "label", "vec_id", 4, 6, alpha=0.5, seed=3)
    assert {(r.vec_id, r.group_id) for r in again.collect()} == {
        (r.vec_id, r.group_id) for r in rows
    }


def test_constant_single_group(spark):
    df = spark.createDataFrame([(i,) for i in range(5)], "id: long")
    out = keys.with_group_key(df, keys.constant("test_client"))
    assert out.select(F.countDistinct("group_id")).collect()[0][0] == 1


def test_scramble_no_overflow_for_large_ids(spark):
    from dataset_grouper_spark import keys

    big = 3_500_000_000  # above the old int64-overflow threshold
    df = spark.createDataFrame([(big,), (7,)], "id: long")
    got = {r.id: r.s for r in df.select(
        "id", keys.scramble("id").alias("s")).collect()}
    # python ground truth: (id mod 2^32) * KNUTH mod 2^32
    for i in (big, 7):
        assert got[i] == ((i % 2**32) * 2654435761) % 2**32


def test_binary_group_keys_roundtrip(spark):
    # types.py:31 parity: GetKeyFn -> bytes; non-utf8 keys representable
    from dataset_grouper_spark import keys

    raw = [
        (1, bytes([0xFF, 0xFE, 0x01])),  # invalid utf-8
        (2, b"plain-text-key"),           # safe utf-8 -> verbatim layout
        (3, "café".encode()),        # multibyte utf-8, safe
        (4, b"%x:DEAD"),                  # collides with escape marker
        (5, b"a/b,c|d"),                  # unsafe separators
        (6, b""),                         # empty key
    ]
    df = spark.createDataFrame(raw, "id: long, k: binary")
    keyed = keys.with_group_key(df, F.col("k"), binary=True)
    assert dict(keyed.dtypes)[keys.GROUP_BYTES_COL] == "binary"
    assert dict(keyed.dtypes)[keys.GROUP_COL] == "string"
    rows = {r.id: r for r in keyed.collect()}
    assert rows[2][keys.GROUP_COL] == "plain-text-key"  # readable layout
    assert rows[3][keys.GROUP_COL] == "café"
    assert rows[1][keys.GROUP_COL].startswith("%x:")
    assert rows[4][keys.GROUP_COL].startswith("%x:")  # marker escaped
    assert rows[5][keys.GROUP_COL].startswith("%x:")
    # escape is injective and reversible
    back = keyed.select(
        "id", keys.unescape_bytes_key(F.col(keys.GROUP_COL)).alias("b")
    )
    got = {r.id: bytes(r.b) for r in back.collect()}
    assert got == {i: k for i, k in raw}
    ids = keyed.select(keys.GROUP_COL).distinct().count()
    assert ids == len(raw)


def test_binary_group_keys_partitioned_write_roundtrip(spark, tmp_path):
    from dataset_grouper_spark import keys

    raw = [(1, bytes([0x80, 0x81])), (2, b"ok"), (3, bytes([0x80, 0x81]))]
    df = spark.createDataFrame(raw, "id: long, k: binary")
    keyed = keys.with_group_key(df, F.col("k"), binary=True)
    out = str(tmp_path / "bykey")
    keyed.write.partitionBy(keys.GROUP_COL).mode("overwrite").parquet(out)
    back = spark.read.parquet(out).select(
        "id", keys.unescape_bytes_key(F.col(keys.GROUP_COL)).alias("b")
    )
    got = {r.id: bytes(r.b) for r in back.collect()}
    assert got == {i: k for i, k in raw}
