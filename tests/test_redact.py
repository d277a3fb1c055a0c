"""PII redaction: pattern semantics, cascade order, NULL safety."""

from dataset_grouper_spark.functions import redact


def _one(spark, text):
    df = spark.createDataFrame([(text,)], "t: string")
    row = redact.redact_table(df, "t", out_col="r").collect()[0]
    return row


def test_email_ip_phone_all_redacted(spark):
    r = _one(
        spark,
        "mail a.b+c@ex-ample.co.uk or 192.168.0.1 or +44 20-7946-0958 end",
    )
    assert r.r == "mail <EMAIL> or <IP> or <PHONE> end"
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 1, 1)


def test_cascade_order_email_digits_not_double_counted(spark):
    # the digits inside an email must not count as a phone
    r = _one(spark, "write to 12345678901@example.com please")
    assert r.r == "write to <EMAIL> please"
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 0, 0)


def test_ip_not_phone(spark):
    r = _one(spark, "host 10.123.0.250 up")
    assert r.r == "host <IP> up"
    assert (r.n_emails, r.n_ips, r.n_phones) == (0, 1, 0)


def test_null_and_clean_text(spark):
    df = spark.createDataFrame([(None,), ("no pii here",)], "t: string")
    rows = redact.redact_table(df, "t", out_col="r").collect()
    got = {r.r: (r.n_emails, r.n_ips, r.n_phones) for r in rows}
    assert got == {"": (0, 0, 0), "no pii here": (0, 0, 0)}
