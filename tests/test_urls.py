"""URL canonicalization semantics."""

from dataset_grouper_spark.functions.urls import canonicalize_url


def _canon(spark, url):
    df = spark.createDataFrame([(url,)], "u: string")
    return df.select(canonicalize_url("u").alias("c")).collect()[0].c


def test_full_mess(spark):
    assert (
        _canon(
            spark,
            "HTTPS://WWW.News.Example.COM/Path/9/?utm_source=a&id=3&utm_campaign=b&gclid=x#top",
        )
        == "https://news.example.com/Path/9/?id=3"
    )


def test_all_params_tracking_drops_query_entirely(spark):
    assert (
        _canon(spark, "http://a.com/x?utm_source=1&fbclid=2")
        == "http://a.com/x"
    )


def test_path_case_preserved_host_lowered(spark):
    assert _canon(spark, "HTTP://A.COM/CaseSensitive") == "http://a.com/CaseSensitive"


def test_trailing_slash_and_fragment(spark):
    assert _canon(spark, "https://a.com/b/#frag") == "https://a.com/b"


def test_schemeless_and_null_survive(spark):
    assert _canon(spark, "example.com/path?gclid=1") == "example.com/path"
    assert _canon(spark, None) == ""
