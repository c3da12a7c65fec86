"""Host-level quality prior tests (operators/hostprior.py)."""

from pyspark.sql import functions as F

from crawl4ai_spark.operators.hostprior import apply_host_prior, host_prior_stats


def _corpus(spark):
    rows = [
        # good.com: 3 docs, metric mean (10+20+30)//3 = 20
        (1, "good.com", 10),
        (2, "good.com", 20),
        (3, "good.com", 30),
        # thin.com: 1 doc, high metric — fails min_docs
        (4, "thin.com", 99),
        # low.com: 3 docs, mean (1+2+3)//3 = 2 — fails min_mean
        (5, "low.com", 1),
        (6, "low.com", 2),
        (7, "low.com", 3),
    ]
    return spark.createDataFrame(rows, ["doc_id", "host", "m"])


def test_host_prior_stats_integer_mean(spark):
    st = {r["host"]: r for r in
          host_prior_stats(_corpus(spark), "host", F.col("m")).collect()}
    assert (st["good.com"]["n_docs"], st["good.com"]["metric_sum"],
            st["good.com"]["metric_mean"]) == (3, 60, 20)
    assert st["thin.com"]["n_docs"] == 1
    assert st["low.com"]["metric_mean"] == 2


def test_apply_host_prior_flags(spark):
    df = _corpus(spark)
    st = host_prior_stats(df, "host", F.col("m"))
    out = {r["doc_id"]: r["host_keep"] for r in
           apply_host_prior(df, st, "host", min_docs=2, min_mean=10).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 0, 5: 0, 6: 0, 7: 0}


def test_apply_host_prior_missing_host_gets_zero(spark):
    df = _corpus(spark)
    st = host_prior_stats(df.filter(F.col("host") != "thin.com"), "host", F.col("m"))
    out = {r["doc_id"]: r["host_keep"] for r in
           apply_host_prior(df, st, "host", min_docs=1, min_mean=0).collect()}
    assert out[4] == 0  # host absent from stats -> no support -> drop
    assert out[1] == 1


def test_apply_host_prior_preserves_rows_and_columns(spark):
    df = _corpus(spark)
    st = host_prior_stats(df, "host", F.col("m"))
    out = apply_host_prior(df, st, "host")
    assert out.count() == df.count()
    assert set(df.columns) <= set(out.columns)
