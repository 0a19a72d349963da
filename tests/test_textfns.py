"""Unit tests for the PII redaction primitives (functions/text.py)."""

from pyspark.sql import functions as F

from bireme_spark.functions import text as T


def _one(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "s string")
    return df.select(T.redact_pii(F.col("s")).alias("r")).first().r


class TestPiiRedact:
    def test_each_kind(self, spark):
        assert _one(spark, "mail a.b+c@x-y.org now") == "mail <EMAIL> now"
        assert _one(spark, "call +1 555 1234 or 44-201-9999") == "call <PHONE> or <PHONE>"
        assert _one(spark, "host 192.168.0.1 down") == "host <IP> down"

    def test_email_wins_over_phone_digits(self, spark):
        # "555 1234..." would match the phone pattern, but the email
        # redacts first and swallows the digits — no <PHONE> appears
        assert _one(spark, "user555 1234567@example.com") == "user555 <EMAIL>"

    def test_counts_match_redactions(self, spark):
        s = "a@b.co c@d.io 1.2.3.4"
        df = spark.createDataFrame([(s,)], "s string").select(
            T.pii_count(F.col("s"), T.PII_EMAIL).alias("e"),
            T.pii_count(F.col("s"), T.PII_IPV4).alias("i"),
        )
        row = df.first()
        assert (row.e, row.i) == (2, 1)
