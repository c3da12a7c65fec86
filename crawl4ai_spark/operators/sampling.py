"""Deterministic stratified / weighted sampling for training-mix
construction.

A training-data pipeline's last stage picks a MIX: per-language (or
per-source, per-quality-bucket) sampling rates, or rates proportional
to a per-document weight. The reference has no sampling tier (it
crawls and extracts); this supplies the standard one.

Everything is a row-local filter — zero shuffle, no RNG state:
the "coin flip" for a row is an md5 hash of (salt, key) reduced to a
uniform integer in [0, 1e6). That makes sampling

- deterministic and reproducible: same salt -> same sample, across
  retries, partitionings, engines (md5 is byte-identical in Spark and
  DuckDB, so the CORRECTNESS oracle replays the exact sample);
- decorrelated across uses: a different salt draws an independent
  sample (crucial when the same corpus feeds several mixes);
- mergeable: rate changes only add/remove the marginal rows
  (u < 0.3 sample is a superset of u < 0.2 — nested samples for
  scaling-law runs come free).

Modulo bias of `hash % 1e6` over a 60-bit hash is < 2^-40 — far
below any statistical test run on real mixes; documented rather than
rejected-sampled away to keep the expression row-local and branch-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

E6 = 1_000_000


def uniform_e6(key: Column, salt: str) -> Column:
    """Deterministic uniform integer in [0, 1e6) from md5(salt||key)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    return h % E6


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates_e6: dict[str, int],
    key_col: str,
    salt: str = "mix1",
    default_rate_e6: int = 0,
) -> DataFrame:
    """Keep each row of stratum s with probability rates_e6[s]/1e6.

    Unlisted strata fall back to default_rate_e6 (0 = drop — the
    common case for a language allowlist).
    """
    rate: Column = F.lit(int(default_rate_e6))
    for s, r in sorted(rates_e6.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(int(r))).otherwise(rate)
    return df.filter(uniform_e6(F.col(key_col), salt) < rate)


def weighted_sample(
    df: DataFrame,
    weight_e6: Column,
    key_col: str,
    salt: str = "mix1",
) -> DataFrame:
    """Keep each row with probability weight_e6/1e6 (clamped to
    [0, 1e6]) — quality-proportional sampling when the weight is a
    quality score. A NULL weight drops the row (no score, no keep):
    greatest/least SKIP nulls rather than propagate them, so without
    the coalesce a corrupt weight would clamp to 1e6 — a certain
    keep."""
    w = F.greatest(
        F.lit(0),
        F.least(F.coalesce(weight_e6.cast("long"), F.lit(0)), F.lit(E6)),
    )
    return df.filter(uniform_e6(F.col(key_col), salt) < w)


def rates_for_token_budget(
    stratum_totals: dict[str, int],
    budgets: dict[str, int],
) -> dict[str, int]:
    """Turn per-stratum TOKEN BUDGETS into the rate_e6 table
    stratified_sample() consumes.

    ``stratum_totals``: tokens (or docs — any consistent unit) per
    stratum in the corpus, e.g. from one groupBy; ``budgets``: desired
    tokens per stratum in the mix. Rate = budget/total clamped to 1e6
    (a stratum smaller than its budget is taken whole — oversampling
    is upstream's problem: sampling without replacement can't mint
    data). Strata without a budget get no entry (stratified_sample's
    default_rate_e6 applies). Driver-side pure arithmetic: the totals
    dict is one small aggregation result, never corpus data.
    """
    rates = {}
    for s, budget in budgets.items():
        total = stratum_totals.get(s, 0)
        if total <= 0:
            rates[s] = 0
        else:
            rates[s] = min(E6, int(budget * E6 // total))
    return rates
