"""Per-file Bloom point-lookup index for Delta tables."""

import pytest

from dataset_grouper_spark.sources import delta, delta_bloom


def _make_table(spark, path, n=300, files=4):
    df = spark.createDataFrame(
        [(i, f"url-{i}.example.com", i % 7) for i in range(n)],
        "id long, url string, bucket long",
    )
    delta.delta_append(spark, df.repartition(files), path)
    return df


class TestBuildAndPrune:
    def test_index_prunes_misses_keeps_hits(self, spark, tmp_path):
        t = str(tmp_path / "t1")
        _make_table(spark, t)
        built = delta_bloom.delta_build_bloom_index(
            spark, t, "url", num_bits=1 << 16
        )
        assert len(built) >= 2  # one sidecar per data file
        adds, _meta = delta._replay(spark, t, delta._latest_version(t))
        # a value that exists: at least the owning file survives and
        # the read returns exactly that row
        kept = delta_bloom.delta_bloom_prune(
            spark, t, adds, "url", "url-42.example.com"
        )
        assert 1 <= len(kept) <= len(adds)
        got = (
            delta.read_delta(
                spark, t, bloom_point=("url", "url-42.example.com")
            )
            .filter("url = 'url-42.example.com'")
            .collect()
        )
        assert [r.id for r in got] == [42]
        # a value that exists nowhere: every file should miss (2^16
        # bits vs 300 keys -> FPR ~ 0)
        kept = delta_bloom.delta_bloom_prune(
            spark, t, adds, "url", "absent.example.com"
        )
        assert kept == {}
        assert (
            delta.read_delta(
                spark, t, bloom_point=("url", "absent.example.com")
            ).count()
            == 0
        )

    def test_unindexed_files_are_kept(self, spark, tmp_path):
        t = str(tmp_path / "t2")
        _make_table(spark, t, n=100, files=2)
        delta_bloom.delta_build_bloom_index(spark, t, "url")
        # append AFTER the index build: new files have no sidecar
        extra = spark.createDataFrame(
            [(1000, "late.example.com", 0)],
            "id long, url string, bucket long",
        )
        delta.delta_append(spark, extra.coalesce(1), t)
        got = delta.read_delta(
            spark, t, bloom_point=("url", "late.example.com")
        ).filter("url = 'late.example.com'")
        assert [r.id for r in got.collect()] == [1000]

    def test_wrong_column_index_is_ignored(self, spark, tmp_path):
        t = str(tmp_path / "t3")
        _make_table(spark, t, n=50, files=1)
        delta_bloom.delta_build_bloom_index(spark, t, "url")
        adds, _m = delta._replay(spark, t, delta._latest_version(t))
        # probing on a different column: sidecars don't apply -> keep
        kept = delta_bloom.delta_bloom_prune(spark, t, adds, "id", 7)
        assert kept == adds

    def test_partition_and_schema_gates(self, spark, tmp_path):
        t = str(tmp_path / "t4")
        df = spark.createDataFrame(
            [(1, "a", "en"), (2, "b", "de")],
            "id long, v string, lang string",
        )
        delta.delta_append(spark, df, t, partition_by=["lang"])
        with pytest.raises(ValueError, match="partition column"):
            delta_bloom.delta_build_bloom_index(spark, t, "lang")
        with pytest.raises(ValueError, match="no column"):
            delta_bloom.delta_build_bloom_index(spark, t, "nope")
        # non-partition column on a partitioned table works
        delta_bloom.delta_build_bloom_index(spark, t, "v")
        got = delta.read_delta(spark, t, bloom_point=("v", "a")).filter(
            "v = 'a'"
        )
        assert [r.id for r in got.collect()] == [1]

    def test_sidecar_roundtrip_and_magic(self, tmp_path):
        p = str(tmp_path / "x.bloom")
        delta_bloom._write_sidecar(
            p, {"column": "c", "num_bits": 8}, b"\xff"
        )
        header, bits = delta_bloom._read_sidecar(p)
        assert header["column"] == "c" and bits == b"\xff"
        with open(p, "r+b") as f:
            f.write(b"XXXX")
        with pytest.raises(ValueError, match="sidecar"):
            delta_bloom._read_sidecar(p)

    def test_composes_with_dv_deletes(self, spark, tmp_path):
        """A DV-masked row still sits in the parquet: the bloom keeps
        the file (false positive only) and the DV drops the row."""
        t = str(tmp_path / "t5")
        _make_table(spark, t, n=60, files=2)
        delta.delta_delete_where(spark, t, "id = 10")
        delta_bloom.delta_build_bloom_index(spark, t, "url")
        got = delta.read_delta(
            spark, t, bloom_point=("url", "url-10.example.com")
        ).filter("url = 'url-10.example.com'")
        assert got.count() == 0

    def test_long_column_probed_with_python_int(self, spark, tmp_path):
        """xxhash64 is type-sensitive: a bigint column probed with a
        plain Python int literal must still HIT (read_delta casts the
        probe to the column's type — regression pin for the false-
        negative this once caused)."""
        t = str(tmp_path / "t6")
        _make_table(spark, t, n=40, files=2)
        delta_bloom.delta_build_bloom_index(spark, t, "id")
        got = delta.read_delta(spark, t, bloom_point=("id", 7)).filter(
            "id = 7"
        )
        assert got.count() == 1
