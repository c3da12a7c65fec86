"""End-to-end corpus pipeline (crawl4ai_spark/pipeline.py): funnel
consistency vs per-stage recomputation, monotone gates, packing
closure, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.quality_model import classifier_score_milli
from crawl4ai_spark.functions.text import quality_score, token_count
from crawl4ai_spark.operators.dedup import exact_dedup
from crawl4ai_spark.pipeline import CorpusConfig, build_corpus

SF_DIR = "/root/testdata/sf0.001"

CFG = CorpusConfig(
    quality_min_e6=200_000,
    classifier_min_milli=-900,
    minhash_threshold=0.5,
    sample_rates_e6={"en": 1_000_000, "de": 1_000_000,
                     "fr": 600_000, "es": 600_000},
    sample_default_e6=400_000,
    seq_len=256,
    docs_per_bucket=64,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "lang")
        .filter(F.col("doc_id") < 200)
    )
    # 20 exact copies under new ids -> exact-dedup work to do
    copies = base.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text", "lang"
    )
    return base.unionByName(copies).cache()


@pytest.fixture(scope="module")
def eval_docs(spark):
    # 10 corpus docs verbatim in the eval set -> guaranteed contamination
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") % 20 == 5)
        .filter(F.col("doc_id") < 200)
        .select("text")
    )


@pytest.fixture(scope="module")
def result(docs, eval_docs):
    out = build_corpus(docs, eval_docs, CFG)
    out["flags"] = out["flags"].cache()
    return out


def test_funnel_is_monotone_and_consistent(result, docs):
    f = result["funnel"].collect()[0]
    assert f.input_docs == docs.count()
    assert (
        f.input_docs >= f.q_keep >= f.exact_keep >= f.near_keep
        >= f.clean >= f.sampled > 0
    )
    # quality gate recomputed independently
    q = docs.filter(
        (quality_score("text") * 1_000_000 >= CFG.quality_min_e6)
        & (
            classifier_score_milli(F.split(F.col("text"), " "))
            >= CFG.classifier_min_milli
        )
    )
    assert f.q_keep == q.count()
    # exact gate matches the standalone operator on quality survivors
    assert f.exact_keep == exact_dedup(q, "text", "doc_id").count()


def test_exact_copies_deduped(result):
    flags = result["flags"]
    # of each (orig, orig+10000) exact pair where both pass quality,
    # only the smaller id survives exact dedup
    dup_survivors = flags.filter(
        (F.col("doc_id") >= 10_000) & F.col("exact_keep")
    ).count()
    orig_pass = result["flags"].filter(
        (F.col("doc_id") < 20) & F.col("q_keep")
    ).count()
    assert orig_pass > 0
    assert dup_survivors == 20 - orig_pass  # copy survives only if its
    # original failed the quality gate (then the copy is canonical)


def test_contaminated_docs_never_sampled(result, eval_docs):
    flags = result["flags"]
    eval_ids = [
        r.doc_id
        for r in flags.join(
            eval_docs.withColumnRenamed("text", "et"),
            flags.text == F.col("et"),
        ).collect()
    ]
    assert eval_ids  # the planted overlap is visible
    dirty_sampled = flags.filter(
        F.col("doc_id").isin(eval_ids) & F.col("sampled")
    ).count()
    assert dirty_sampled == 0


def test_corpus_equals_sampled_flags(result):
    flags_n = result["flags"].filter(F.col("sampled")).count()
    assert result["corpus"].count() == flags_n


def test_packing_covers_exactly_the_corpus(result):
    st = result["pack_stats"].collect()[0]
    expect = (
        result["corpus"]
        .agg(F.sum(token_count("text") + 1).alias("t"))
        .collect()[0]
        .t
    )
    assert st.tokens_placed == expect
    assert st.n_seqs == (expect + CFG.seq_len - 1) // CFG.seq_len


def test_deterministic_rerun(result, docs, eval_docs):
    again = build_corpus(docs, eval_docs, CFG)
    assert result["funnel"].collect() == again["funnel"].collect()
    a = sorted(tuple(r) for r in result["assignment"].collect())
    b = sorted(tuple(r) for r in again["assignment"].collect())
    assert a == b


def test_full_recipe_optional_stages(spark):
    """All optional stages on: line scrub -> host prior -> quality ->
    LM band -> dedup -> sample -> pack, with PII scrub on the release
    text. Asserts the extended funnel chain, that boilerplate lines
    were actually removed (the corpus has ~135 natural duplicate
    10-word windows), and that no raw email survives in the corpus."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ).alias("text"),
            "lang",
            F.col("source").alias("host"),
        )
    )
    cfg = CorpusConfig(
        quality_min_e6=200_000,
        line_dedup_min_dup=2,
        host_min_docs=3,
        host_min_mean_tokens=10,
        lm_max_milli=8_000,
        pii_scrub=True,
    )
    out = build_corpus(docs, None, cfg, host_col="host")
    f = out["funnel"].collect()[0]
    assert (
        f.input_docs >= f.host_keep >= f.q_keep >= f.lm_keep
        >= f.exact_keep >= f.near_keep >= f.clean >= f.sampled > 0
    )
    assert f.lines_removed > 0
    corpus = out["corpus"].select("text").collect()
    assert corpus
    assert all("@example.com" not in r["text"] for r in corpus)
    assert any("<EMAIL>" in r["text"] for r in corpus)


def test_full_recipe_gates_actually_gate(spark):
    """Each optional gate binds: turning it on strictly reduces (or
    holds) the corresponding funnel count vs the stage-off run."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "lang", F.col("source").alias("host"))
    )
    base = build_corpus(
        docs, None, CorpusConfig(quality_min_e6=200_000), host_col="host"
    )["funnel"].collect()[0]
    tight = build_corpus(
        docs,
        None,
        CorpusConfig(
            quality_min_e6=200_000,
            host_min_docs=3,
            host_min_mean_tokens=52,
            lm_max_milli=3_400,
        ),
        host_col="host",
    )["funnel"].collect()[0]
    assert base.host_keep == base.input_docs      # off -> pass-through
    assert base.lm_keep == base.q_keep
    assert tight.host_keep < tight.input_docs     # 52-token mean splits hosts
    assert tight.lm_keep < tight.q_keep           # 3400 is the LM median


def test_lm_band_passes_no_evidence_short_docs(spark):
    """lm_min_milli > 0 must not drop <2-token docs: their score is the
    no-evidence sentinel 0, not a measured perplexity."""
    from crawl4ai_spark.pipeline import corpus_flags

    rows = [(1, "hi", "en", "h1"), (2, "the cat sat on the mat rug", "en", "h1"),
            (3, "the cat sat on the mat rug", "en", "h1")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "host"])
    cfg = CorpusConfig(quality_min_e6=0, classifier_min_milli=-10_000,
                       lm_min_milli=500, lm_max_milli=50_000)
    got = {r["doc_id"]: (r["q_keep"], r["lm_keep"])
           for r in corpus_flags(docs, None, cfg).collect()}
    assert got[1] == (True, True)   # short doc passes through


def test_substring_scrub_dsir_and_keep_best_stages(spark):
    """The round-4 optional stages: exact-substring scrub rewrites the
    text (tokens actually removed), resolve_keep_best keeps each
    near-dup cluster's best-quality member, and dsir_k replaces the
    stratified coin with an importance top-k of exactly k docs."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "lang", F.col("source").alias("host"))
    )
    cfg = CorpusConfig(
        quality_min_e6=200_000,
        substring_dedup_k=5,
        resolve_keep_best=True,
        dsir_k=50,
        dsir_buckets=256,
    )
    out = build_corpus(docs, None, cfg, host_col="host")
    f = out["funnel"].collect()[0]
    assert (
        f.input_docs >= f.q_keep >= f.exact_keep >= f.near_keep
        >= f.clean >= f.sampled > 0
    )
    assert f.substr_tokens_removed > 0
    assert f.sampled == min(50, f.clean)
    # the dsir selection is importance-biased toward the en target:
    # en is 1/4 of the gate corpus but must dominate the picked mix
    langs = out["corpus"].groupBy("lang").count().collect()
    n_en = next((r["count"] for r in langs if r["lang"] == "en"), 0)
    assert n_en > f.sampled // 2
    # off -> the new funnel column is a plain zero pass-through
    base = build_corpus(
        docs, None, CorpusConfig(quality_min_e6=200_000), host_col="host"
    )["funnel"].collect()[0]
    assert base.substr_tokens_removed == 0


def test_lm_bucket_keep_tiering(spark):
    """lm_bucket_keep=2 keeps the head+middle perplexity tiers per
    language (CCNet §3.3) — strictly fewer docs than no LM gate, more
    than (or equal to) head-only, and short no-evidence docs pass."""
    from crawl4ai_spark.pipeline import corpus_flags

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text", "lang", F.col("source").alias("host"))
    )
    base = CorpusConfig(quality_min_e6=0)
    f0 = corpus_flags(docs, None, base).agg(
        F.sum(F.col("lm_keep").cast("long"))).collect()[0][0]
    f2 = corpus_flags(
        docs, None, CorpusConfig(quality_min_e6=0, lm_bucket_keep=2)
    ).agg(F.sum(F.col("lm_keep").cast("long"))).collect()[0][0]
    f1 = corpus_flags(
        docs, None, CorpusConfig(quality_min_e6=0, lm_bucket_keep=1)
    ).agg(F.sum(F.col("lm_keep").cast("long"))).collect()[0][0]
    assert f0 > f2 > f1 > 0
    # ~2/3 and ~1/3 of the measured population (cutoffs interpolate)
    assert abs(f2 - 2 * f0 / 3) < 0.1 * f0
    assert abs(f1 - f0 / 3) < 0.1 * f0
    # composes with the absolute band: strictly tighter than either
    fb = corpus_flags(
        docs, None,
        CorpusConfig(quality_min_e6=0, lm_bucket_keep=2, lm_max_milli=3400),
    ).agg(F.sum(F.col("lm_keep").cast("long"))).collect()[0][0]
    assert 0 < fb <= min(f2, corpus_flags(
        docs, None, CorpusConfig(quality_min_e6=0, lm_max_milli=3400)
    ).agg(F.sum(F.col("lm_keep").cast("long"))).collect()[0][0])
