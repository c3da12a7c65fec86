"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line {"metric": ..., "value": N, "unit": "sec", "queries":
{...}, "sf": ...}.

Each query is forced end-to-end with a noop write (full computation, no
driver collect). Set SPARK_GRAFT_BENCH_QUERIES to a comma-list to run a
subset.
"""

from __future__ import annotations

import json
import os
import sys
import time

from crawl4ai_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline suite: heavier operators that dominate a real pipeline
HEADLINE = [
    "url_parts",
    "url_canonicalize",
    "url_pattern_filter",
    "url_scorers",
    "entities_extract",
    "text_lang_id",
    "text_quality",
    "term_stats",
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "sim_cosine_topk",
    "sim_cosine_topk_lsh",
    "topk_capacity",
    "politeness_budget",
    "lineitem_pricing",
]


def run_query(spark, name, fn):
    t0 = time.perf_counter()
    df = fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    from crawl4ai_spark.catalog import QUERIES

    names = HEADLINE
    override = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if override:
        names = [n.strip() for n in override.split(",") if n.strip()]

    spark = get_spark(parallelism=CPUS, app_name="crawl4ai_spark_bench")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings: dict[str, float] = {}
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        try:
            timings[name] = round(run_query(spark, name, fn), 3)
        except Exception as e:  # keep the suite going; report the failure
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t > 0), 3)
    result = {
        "metric": "catalog_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": CPUS,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
