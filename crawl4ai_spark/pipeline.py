"""End-to-end training-corpus construction: the composite pipeline a
user of this engine actually runs at 100 TB.

Chains the library's stages in the standard order —

    heuristic quality + model classifier     (row-local, no shuffle)
    -> exact dedup                           (one content-hash shuffle)
    -> MinHash-LSH near-dedup + components   (banded, never all-pairs)
    -> benchmark decontamination             (broadcast eval shingles)
    -> stratified training-mix sampling      (row-local md5 coins)
    -> sequence packing                      (two-phase prefix sum)

— and reports the funnel as ONE aggregation instead of a count job per
stage: every gate becomes a boolean lineage column on the corpus, the
final corpus is the conjunction, and a single pass sums the cumulative
survivor counts. At scale this means the expensive upstream (scan +
quality expressions) runs once, not once per stage count.

Stage ordering notes (the same reasons the published pipelines —
C4, CCNet, Gopher, RefinedWeb — give):
- quality BEFORE dedup: drop garbage before paying the dedup shuffles;
- near-dedup only among quality survivors (LSH candidate volume is
  quadratic in cluster sizes — boilerplate junk makes hot buckets);
- decontamination after dedup (fewer docs to shingle), before
  sampling (a contaminated doc must never be sampled in);
- packing last, over exactly the sampled corpus.

The reference has no corpus tier (it stops at per-page extraction);
this is the training-data extension over the same operators the
catalog gate-checks individually (dedup.py, decontam.py, sampling.py,
packing.py, quality_model.py, text.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .functions.quality_model import classifier_score_milli
from .functions.text import quality_score, token_count
from .operators.dedup import minhash_lsh_pairs, resolve_duplicates
from .operators.packing import pack_concat_chunk, packing_stats
from .operators.sampling import uniform_e6

_PIPELINE_CACHES: list[DataFrame] = []


def _cache_stage(df: DataFrame) -> DataFrame:
    """Persist a multi-consumer stage, evicting the previous call's
    caches (same bounded-registry discipline as operators/dedup.py:
    eviction is recompute-safe, so a long session holds at most one
    pipeline's worth of cached blocks)."""
    df = df.persist()
    _PIPELINE_CACHES.append(df)
    return df


def _evict_stage_caches() -> None:
    while _PIPELINE_CACHES:
        try:
            _PIPELINE_CACHES.pop().unpersist()
        except Exception:
            pass


@dataclass
class CorpusConfig:
    quality_min_e6: int = 350_000      # heuristic score floor, ppm of 1.0
    classifier_min_milli: int = -900   # model score floor, milli-units
    minhash_threshold: float = 0.7     # near-dup signature agreement
    minhash_hashes: int = 64
    minhash_bands: int = 16
    decontam_ngram: int = 13
    sample_rates_e6: dict[str, int] = field(
        default_factory=lambda: {"en": 1_000_000, "de": 1_000_000,
                                 "fr": 1_000_000, "es": 1_000_000}
    )
    sample_default_e6: int = 0
    sample_salt: str = "corpus1"
    seq_len: int = 2048
    eos_tokens: int = 1
    docs_per_bucket: int = 4096


def corpus_flags(
    docs: DataFrame,
    eval_docs: DataFrame | None,
    cfg: CorpusConfig,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """The corpus with one boolean lineage column per gate.

    Columns appended: q_keep, exact_keep, near_keep, clean, sampled —
    each ALREADY conjoined with the gates before it (a row with
    near_keep=true passed quality and exact dedup too), so funnel
    counts are plain sums and the final corpus is `sampled`.
    """
    t = F.col(text_col)
    q = (
        (quality_score(t) * 1_000_000 >= cfg.quality_min_e6)
        & (classifier_score_milli(F.split(t, " ")) >= cfg.classifier_min_milli)
    ).alias("q_keep")
    flagged = docs.withColumn("q_keep", q)

    # exact dedup among quality survivors: first id per content hash.
    # Dropped rows get a per-row singleton key instead of one shared
    # NULL — a shared key would funnel every rejected doc through a
    # single window task (the skew trap this library keeps out of its
    # plans); singletons hash-spread like any other key.
    sha = F.when(F.col("q_keep"), F.sha2(t, 256)).otherwise(
        F.concat(F.lit("drop:"), F.col(id_col).cast("string"))
    )
    flagged = (
        flagged.withColumn("_sha", sha)
        .withColumn(
            "exact_keep",
            F.col("q_keep")
            & (
                F.col(id_col)
                == F.min(F.when(F.col("q_keep"), F.col(id_col))).over(
                    Window.partitionBy("_sha")
                )
            ),
        )
        .drop("_sha")
    )

    # Fan-out point: the near-dup branch (pairs -> components) and the
    # final join's left side both read everything above — without a
    # persist the quality expressions and the dedup window run once
    # per branch (3x upstream at the contamination fan-out too).
    flagged = _cache_stage(flagged)

    # near-dedup among exact survivors
    survivors = flagged.filter(F.col("exact_keep"))
    pairs = minhash_lsh_pairs(
        survivors,
        text_col,
        id_col,
        num_hashes=cfg.minhash_hashes,
        bands=cfg.minhash_bands,
        jaccard_threshold=cfg.minhash_threshold,
    )
    resolution = resolve_duplicates(
        survivors.select(id_col), pairs, id_col
    ).select(id_col, F.col("is_canonical").cast("boolean").alias("_canon"))
    flagged = flagged.join(resolution, id_col, "left").withColumn(
        "near_keep", F.col("exact_keep") & F.coalesce("_canon", F.lit(False))
    ).drop("_canon")

    flagged = _cache_stage(flagged)

    # decontamination (skipped -> clean == near_keep)
    if eval_docs is not None:
        from .operators.decontam import contamination_check

        contam = contamination_check(
            flagged.filter(F.col("near_keep")),
            eval_docs,
            text_col=text_col,
            id_col=id_col,
            ngram=cfg.decontam_ngram,
        ).select(id_col, F.col("contaminated").cast("boolean").alias("_dirty"))
        flagged = flagged.join(contam, id_col, "left").withColumn(
            "clean", F.col("near_keep") & ~F.coalesce("_dirty", F.lit(True))
        ).drop("_dirty")
    else:
        flagged = flagged.withColumn("clean", F.col("near_keep"))

    # stratified sampling (row-local coin)
    rate = F.lit(int(cfg.sample_default_e6))
    for s, r in sorted(cfg.sample_rates_e6.items()):
        rate = F.when(F.col(lang_col) == s, F.lit(int(r))).otherwise(rate)
    return flagged.withColumn(
        "sampled",
        F.col("clean") & (uniform_e6(F.col(id_col), cfg.sample_salt) < rate),
    )


def corpus_funnel(flags: DataFrame) -> DataFrame:
    """Cumulative survivor counts, one aggregation job."""
    cnt = lambda c: F.sum(F.col(c).cast("long")).alias(c)  # noqa: E731
    return flags.agg(
        F.count("*").alias("input_docs"),
        cnt("q_keep"), cnt("exact_keep"), cnt("near_keep"),
        cnt("clean"), cnt("sampled"),
    )


def build_corpus(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    cfg: CorpusConfig | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> dict[str, DataFrame]:
    """Run the whole pipeline. Returns {corpus, funnel, assignment,
    pack_stats} — all lazy; `flags` is computed once and reused by
    corpus/funnel (persist it upstream for multi-consumer runs).

    `flags` and `assignment` are persisted (funnel/corpus both read
    flags; pack_stats reads assignment twice) under a bounded registry
    evicted at the next build_corpus call — without this, every
    consumer re-runs the MinHash banding and the component iterations.
    """
    cfg = cfg or CorpusConfig()
    _evict_stage_caches()
    flags = _cache_stage(
        corpus_flags(docs, eval_docs, cfg, text_col, id_col, lang_col)
    )
    corpus = flags.filter(F.col("sampled")).drop(
        "q_keep", "exact_keep", "near_keep", "clean", "sampled"
    )
    assignment = _cache_stage(
        pack_concat_chunk(
            corpus,
            id_col,
            token_count(text_col),
            cfg.seq_len,
            eos_tokens=cfg.eos_tokens,
            docs_per_bucket=cfg.docs_per_bucket,
        )
    )
    return {
        "flags": flags,
        "corpus": corpus,
        "funnel": corpus_funnel(flags),
        "assignment": assignment,
        "pack_stats": packing_stats(assignment, cfg.seq_len),
    }
