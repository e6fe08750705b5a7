"""PII scrubbing (operators/text.scrub_pii)."""

from pos_dlt_spark.operators.text import scrub_pii


def _one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return scrub_pii(df).collect()[0]


def test_email_and_url(spark):
    r = _one(spark, "mail bob.smith+x@corp.example.org or see https://ex.org/a?b=1 now")
    assert r["text_scrubbed"] == "mail <EMAIL> or see <URL> now"
    assert r["n_email"] == 1 and r["n_url"] == 1
    assert r["n_ipv4"] == 0 and r["n_phone"] == 0


def test_url_containing_ip_not_double_counted(spark):
    r = _one(spark, "fetch http://10.0.0.1:8080/path then ping 192.168.1.1")
    assert r["text_scrubbed"] == "fetch <URL> then ping <IP>"
    assert r["n_url"] == 1 and r["n_ipv4"] == 1  # the URL's IP not counted twice


def test_phone_and_long_number(spark):
    r = _one(spark, "call +1 (415) 555-0199 ref 123456789012")
    assert "<PHONE>" in r["text_scrubbed"]
    assert "<NUM>" in r["text_scrubbed"] or r["n_long_number"] == 0
    assert r["n_phone"] >= 1


def test_clean_text_untouched(spark):
    r = _one(spark, "just regular words with a date 2024 and n 42")
    assert r["text_scrubbed"] == "just regular words with a date 2024 and n 42"
    assert r["n_email"] == r["n_url"] == r["n_ipv4"] == r["n_phone"] == r["n_long_number"] == 0
