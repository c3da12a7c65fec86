

# --------------------------------------------------------------- PII scrub


def test_redact_pii_typed_placeholders(spark):
    from crawl4ai_spark.functions.entities import redact_pii

    df = spark.createDataFrame(
        [(1, "mail a@b.co ip 10.0.0.1 mac 00:1A:2B:3C:4D:5E uuid "
             "123e4567-e89b-12d3-a456-426614174000 end")],
        ["id", "t"],
    )
    (r,) = df.select(redact_pii("t").alias("v")).collect()
    assert r["v"] == (
        "mail <EMAIL> ip <IPV4> mac <MAC_ADDR> uuid <UUID> end"
    )


def test_redact_pii_leaves_clean_text_alone(spark):
    from crawl4ai_spark.functions.entities import redact_pii

    df = spark.createDataFrame([(1, "plain words only here")], ["id", "t"])
    (r,) = df.select(redact_pii("t").alias("v")).collect()
    assert r["v"] == "plain words only here"


def test_pii_counts_on_original_text(spark):
    from crawl4ai_spark.functions.entities import pii_counts

    df = spark.createDataFrame(
        [(1, "a@b.co and c@d.org from 10.0.0.1")], ["id", "t"]
    )
    (r,) = df.select(pii_counts("t").alias("m")).collect()
    assert r["m"]["email"] == 2
    assert r["m"]["ipv4"] == 1
    assert r["m"]["credit_card"] == 0


def test_redact_pii_custom_labels_and_order(spark):
    from crawl4ai_spark.functions.entities import redact_pii

    df = spark.createDataFrame([(1, "see https://x.io/a?b=1 now")], ["id", "t"])
    (r,) = df.select(redact_pii("t", labels=("url",)).alias("v")).collect()
    assert r["v"] == "see <URL> now"


def test_redact_pii_email_containing_ip_fully_redacted(spark):
    """An address whose domain is an IP must redact as ONE email —
    inner-pattern-first ordering would leave 'john.doe@' behind."""
    from crawl4ai_spark.functions.entities import redact_pii

    df = spark.createDataFrame(
        [(1, "contact john.doe@192.168.0.1 or 10.1.2.3")], ["id", "t"]
    )
    (r,) = df.select(redact_pii("t").alias("v")).collect()
    assert r["v"] == "contact <EMAIL> or <IPV4>"


def test_unicode_email_matched_and_redacted(spark):
    """Java \\w is ASCII-only without the U flag; the reference's
    Python \\w is unicode — 'josé@example.com' must match (and redact),
    or PII ships unredacted."""
    from crawl4ai_spark.functions.entities import matches, redact_pii
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("mail josé@example.com and čüser@example.org here",)], "t string"
    )
    row = df.select(
        matches("t", "email").alias("m"),
        redact_pii(F.col("t")).alias("r"),
    ).collect()[0]
    assert row["m"] == ["josé@example.com", "čüser@example.org"]
    assert row["r"] == "mail <EMAIL> and <EMAIL> here"
