"""Deterministic sampling operators (operators/sampling.py)."""

from pyspark.sql import functions as F

from crawl4ai_spark.operators.sampling import (
    E6,
    stratified_sample,
    uniform_e6,
    weighted_sample,
)


def _corpus(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("zz")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("lang"),
    )


def test_sample_is_deterministic(spark):
    df = _corpus(spark)
    a = {r["doc_id"] for r in stratified_sample(
        df, "lang", {"en": 300_000}, "doc_id", salt="s1").collect()}
    b = {r["doc_id"] for r in stratified_sample(
        df, "lang", {"en": 300_000}, "doc_id", salt="s1").collect()}
    assert a == b and a


def test_salts_decorrelate(spark):
    df = _corpus(spark)
    a = {r["doc_id"] for r in stratified_sample(
        df, "lang", {"en": 500_000}, "doc_id", salt="s1").collect()}
    b = {r["doc_id"] for r in stratified_sample(
        df, "lang", {"en": 500_000}, "doc_id", salt="s2").collect()}
    assert a != b
    # independent draws at 50%: overlap well away from both 0 and 100%
    inter = len(a & b)
    assert 0 < inter < min(len(a), len(b))


def test_samples_nest_as_rate_grows(spark):
    """u < 0.2 sample must be a subset of u < 0.4 under the same salt
    (free nested subsamples for scaling-law runs)."""
    df = _corpus(spark)
    small = {r["doc_id"] for r in stratified_sample(
        df, "lang", {"en": 200_000}, "doc_id", salt="s").collect()}
    big = {r["doc_id"] for r in stratified_sample(
        df, "lang", {"en": 400_000}, "doc_id", salt="s").collect()}
    assert small <= big and len(small) < len(big)


def test_rates_are_approximately_honored(spark):
    df = _corpus(spark, n=4000)  # 1000 per lang
    out = stratified_sample(
        df, "lang", {"en": 800_000, "de": 250_000}, "doc_id", salt="r"
    )
    counts = {
        r["lang"]: r["c"]
        for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()
    }
    assert abs(counts["en"] - 800) < 80
    assert abs(counts["de"] - 250) < 60
    assert "fr" not in counts and "zz" not in counts  # default rate 0


def test_default_rate_keeps_unlisted_strata(spark):
    df = _corpus(spark, n=400)
    out = stratified_sample(
        df, "lang", {"en": 0}, "doc_id", salt="d", default_rate_e6=E6
    )
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"de", "fr", "zz"}


def test_weighted_sample_extremes(spark):
    df = _corpus(spark, n=500)
    none = weighted_sample(df, F.lit(0), "doc_id", salt="w").count()
    full = weighted_sample(df, F.lit(E6), "doc_id", salt="w").count()
    over = weighted_sample(df, F.lit(10 * E6), "doc_id", salt="w").count()
    assert none == 0 and full == 500 and over == 500  # clamped


def test_uniform_spread(spark):
    df = spark.range(1000).select(F.col("id"))
    vals = [r["u"] for r in df.select(
        uniform_e6(F.col("id"), "u").alias("u")).collect()]
    assert all(0 <= v < E6 for v in vals)
    assert abs(sum(vals) / len(vals) - E6 / 2) < E6 * 0.05


def test_weighted_sample_null_weight_drops_row(spark):
    """NULL weight = no score, no keep. greatest/least SKIP nulls, so
    without the coalesce a NULL clamps to 1e6 — a certain keep."""
    df = spark.createDataFrame(
        [(1, None), (2, 0), (3, E6)], "id long, w long"
    )
    kept = {r["id"] for r in weighted_sample(df, F.col("w"), "id").collect()}
    assert 1 not in kept and 2 not in kept and 3 in kept
