"""Byte/word scalar-function parity with the reference.

Goldens from tf_utils_test.py via FIXTURES.md F2/F3/F5 and the
reference word rule: len(s.strip().split(' ')) — empty string => 1.
"""

from pyspark.sql import functions as F

from dataset_grouper_spark.functions import textstats


def words(spark, s):
    df = spark.createDataFrame([(s,)], "t: string")
    return df.select(textstats.words_expr("t").alias("w")).collect()[0][0]


def test_word_rule_matches_python(spark):
    for s in ["", "   ", "foo", "bar bar", "baz baz baz", "a  b", " x ", None]:
        py = len((s or "").strip().split(" "))
        assert words(spark, s) == py, s


def test_f2_text_only_counts(spark):
    # FIXTURES F2: 'foo','bar bar','baz baz baz' => 3 examples, 21 bytes,
    # 6 words under a single constant group.
    df = spark.createDataFrame([("foo",), ("bar bar",), ("baz baz baz",)], "text: string")
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(textstats.row_bytes_expr(df)).alias("b"),
        F.sum(textstats.row_words_expr(df)).alias("w"),
    ).collect()[0]
    assert (row.n, row.b, row.w) == (3, 21, 6)


def test_f3_keyed_two_string_counts(spark):
    # FIXTURES F3: byte count includes ALL string features (key incl.).
    df = spark.createDataFrame(
        [("1", "foo"), ("1", "bar bar"), ("2", "baz baz baz"), ("2", "bat bat bat bat")],
        "a: string, b: string",
    )
    rows = {
        r.a: (r.n, r.b, r.w)
        for r in df.groupBy("a")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(textstats.row_bytes_expr(df)).alias("b"),
            F.sum(textstats.row_words_expr(df)).alias("w"),
        )
        .collect()
    }
    assert rows["1"] == (2, 12, 5)
    assert rows["2"] == (2, 28, 9)


def test_f5_fixed_width_and_arrays(spark):
    # FIXTURES F5: 12 int32 elements + 5 byte-sized elements + 7-char
    # string = 48 + 5 + 7 = 60 bytes; words counted on strings only.
    df = spark.createDataFrame(
        [(list(range(12)), list(range(5)), "7 chars")],
        "a0: array<int>, a1: array<tinyint>, b: string",
    )
    row = df.select(
        textstats.row_bytes_expr(df).alias("bytes"),
        textstats.row_words_expr(df).alias("words"),
    ).collect()[0]
    assert row.bytes == 12 * 4 + 5 * 1 + 7
    assert row.words == 2


def test_multidim_tensor_bytes_nested_structure(spark):
    # tf_utils_test.py:51-68 mirror: {'a': {'a0': int32[3,4],
    # 'a1': uint8[5]}, 'b': string[7]} => 12*4 + 5*1 + 7 = 60 bytes.
    # The 3x4 tensor is stored as array<array<int>>.
    df = spark.createDataFrame(
        [(([[1, 2, 3, 4]] * 3, list(range(5))), "a" * 7)],
        "a: struct<a0: array<array<int>>, a1: array<tinyint>>, b: string",
    )
    row = df.select(textstats.row_bytes_expr(df).alias("bytes")).collect()[0]
    assert row.bytes == 12 * 4 + 5 * 1 + 7


def test_multidim_tensor_bytes_nulls_and_ragged(spark):
    df = spark.createDataFrame(
        [
            ([[1.0, 2.0], [3.0]],),  # ragged 2-d: 3 doubles
            ([[], [1.0]],),  # empty inner row: 1 double
            ([None, [1.0, 2.0]],),  # null inner row contributes 0
            (None,),  # null tensor contributes 0
        ],
        "t: array<array<double>>",
    )
    got = [r.b for r in df.select(textstats.row_bytes_expr(df).alias("b")).collect()]
    assert got == [24, 8, 16, 0]


def test_three_dim_tensor_and_nested_strings(spark):
    df = spark.createDataFrame(
        [([[["ab", "c"]], [["defg"]]], [[1, 2], [3]])],
        "s: array<array<array<string>>>, t: array<array<int>>",
    )
    row = df.select(textstats.row_bytes_expr(df).alias("b")).collect()[0]
    assert row.b == (2 + 1 + 4) + 3 * 4


def test_format_group_count(spark):
    df = spark.createDataFrame(
        [("g", 3, 21, 6)], "group_id: string, num_examples: long, num_bytes: long, num_words: long"
    )
    line = df.select(textstats.format_group_count(",").alias("l")).collect()[0][0]
    assert line == "g,3,21,6"
    plus = df.select(textstats.format_group_count("+").alias("l")).collect()[0][0]
    assert plus == "g+3+21+6"
