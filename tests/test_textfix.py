"""Text normalization cascade: tags, entities, mojibake, whitespace."""

import duckdb
import pytest

from dataset_grouper_spark.functions import textfix


def _clean_spark(spark, s):
    return (
        spark.createDataFrame([(s,)], "s string")
        .select(textfix.clean_text("s").alias("c"))
        .collect()[0]["c"]
    )


def _clean_duck(s):
    return duckdb.sql(
        f"SELECT {textfix.clean_text_sql('s')} AS c FROM (SELECT ? AS s)",
        params=[s],
    ).fetchone()[0]


def test_strip_html_and_entities(spark):
    s = "a <b>bold</b><br/> &amp; <!-- hidden\nnote --> &lt;tag&gt; b"
    out = _clean_spark(spark, s)
    assert out == "a bold & <tag> b"


def test_nested_entities_decode_one_level_only(spark):
    # '&amp;lt;' is the DOUBLE-encoded form of '<': one decode pass must
    # yield the literal text '&lt;', not '<' — requires the &amp; pair
    # to be replaced LAST (standard entity-decode ordering).
    s = "&amp;lt;b&amp;gt; &amp;amp; &amp;"
    out = _clean_spark(spark, s)
    assert out == "&lt;b&gt; &amp; &"
    assert _clean_duck(s) == out


def test_mojibake_both_variants_repaired(spark):
    cafe_bad = "caf" + textfix.MOJIBAKE[0][0]
    apo_cp = "it" + textfix.MOJIBAKE[7][0] + "s"
    apo_l1 = "it" + textfix.MOJIBAKE[8][0] + "s"
    out = _clean_spark(spark, f"{cafe_bad} {apo_cp} {apo_l1}")
    assert out == "café it’s it’s"


def test_mojibake_table_is_derived_correctly():
    for bad, good in textfix.MOJIBAKE:
        assert bad != good
        # re-encode the bad string through the codec it was misdecoded
        # with; one of the two must give back the target's UTF-8 bytes
        assert good.encode("utf-8") in (
            *(bad.encode(c, errors="ignore") for c in ("cp1252", "latin-1")),
        )


def test_whitespace_and_control_chars(spark):
    s = "a\x00b\tc   d\r\ne\x1f "
    assert _clean_spark(spark, s) == "a b c d e"


def test_cross_engine_exact(spark):
    samples = [
        "plain text",
        "<div><p>nested <i>tags</i></p></div>",
        "ent &amp;&lt;&gt;&quot;&#39;&nbsp;ities",
        "caf" + textfix.MOJIBAKE[0][0] + " und " + textfix.MOJIBAKE[3][0],
        "  \t mixed \n lines \r\n  ",
        "",
    ]
    for s in samples:
        assert _clean_spark(spark, s) == _clean_duck(s), repr(s)
