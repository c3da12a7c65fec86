"""Recrawl scheduler: Cho & Garcia-Molina change-rate estimation and
staleness-ranked revisit priorities."""

from __future__ import annotations

import math
from datetime import datetime, timedelta, timezone

import pytest

from crawl4ai_spark.operators.recrawl import change_rate, recrawl_priorities

T0 = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _captures(url, digests, every_days=1.0):
    return [
        (url, T0 + timedelta(days=i * every_days), d)
        for i, d in enumerate(digests)
    ]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, digest string"
    )


def _expected_lambda(n_slots, x_changes, ibar_days):
    return -math.log((n_slots - x_changes + 0.5) / (n_slots + 0.5)) / ibar_days


def test_estimator_matches_closed_form(spark):
    rows = (
        _captures("https://a.com/static", ["d0"] * 10)          # 0/9 changed
        + _captures("https://a.com/news", list("abcdefghij"))   # 9/9 changed
        + _captures("https://a.com/mixed", ["x", "x", "y", "y", "z"])  # 2/4
    )
    got = {r["url"]: r for r in change_rate(_df(spark, rows)).collect()}

    assert got["https://a.com/static"]["n_changes"] == 0
    assert got["https://a.com/static"]["lambda_per_day"] == pytest.approx(
        _expected_lambda(9, 0, 1.0)
    )
    assert got["https://a.com/news"]["lambda_per_day"] == pytest.approx(
        _expected_lambda(9, 9, 1.0)
    )
    assert got["https://a.com/mixed"]["n_changes"] == 2
    assert got["https://a.com/mixed"]["lambda_per_day"] == pytest.approx(
        _expected_lambda(4, 2, 1.0)
    )
    # churny >> mixed >> static (0 observed changes -> exactly 0/day)
    lams = [got[f"https://a.com/{k}"]["lambda_per_day"]
            for k in ("news", "mixed", "static")]
    assert lams[0] > lams[1] > lams[2] >= 0


def test_single_capture_takes_prior(spark):
    rows = _captures("https://a.com/new", ["d0"])
    got = change_rate(_df(spark, rows), prior_lambda_per_day=0.05).collect()[0]
    assert got["n_obs"] == 1
    assert got["lambda_per_day"] == pytest.approx(0.05)


def test_irregular_intervals_use_mean_gap(spark):
    # 3 captures over 10 days (gaps 2 and 8 -> ibar 5), one change
    rows = [
        ("https://a.com/u", T0, "a"),
        ("https://a.com/u", T0 + timedelta(days=2), "a"),
        ("https://a.com/u", T0 + timedelta(days=10), "b"),
    ]
    got = change_rate(_df(spark, rows)).collect()[0]
    assert got["span_days"] == pytest.approx(10.0)
    assert got["lambda_per_day"] == pytest.approx(_expected_lambda(2, 1, 5.0))


def test_priorities_rank_stale_and_churny_first(spark):
    rows = (
        _captures("https://a.com/static", ["d"] * 8)
        + _captures("https://a.com/news", list("abcdefgh"))
    )
    now = T0 + timedelta(days=9)
    out = recrawl_priorities(_df(spark, rows), now).collect()
    assert [r["url"].rsplit("/", 1)[-1] for r in out] == ["news", "static"]
    news = out[0]
    lam = _expected_lambda(7, 7, 1.0)
    assert news["age_days"] == pytest.approx(2.0)  # last capture day 7
    assert news["staleness"] == pytest.approx(1.0 - math.exp(-lam * 2.0))
    assert news["priority"] == news["staleness"]
    # freshness cutoff drops the static page (its staleness is tiny)
    kept = recrawl_priorities(_df(spark, rows), now, min_staleness=0.5)
    assert [r["url"] for r in kept.collect()] == ["https://a.com/news"]


def test_staleness_grows_with_age(spark):
    rows = _captures("https://a.com/u", list("abcde"))
    s = {}
    for days in (1, 5, 30):
        r = recrawl_priorities(
            _df(spark, rows), T0 + timedelta(days=4 + days)
        ).collect()[0]
        s[days] = r["staleness"]
    assert 0 < s[1] < s[5] < s[30] <= 1.0


def test_null_digests_do_not_mask_changes(spark):
    """CDX digests are optional (sources/cdx.py): a NULL digest is
    uninformative, so [x, NULL, y] still observes the x->y transition
    — a plain lag() would NULL both comparisons and starve a changing
    page (lambda=0, staleness=0) out of the refetch frontier."""
    t0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    rows = [
        ("https://b.com/", t0, "x"),
        ("https://b.com/", t0 + timedelta(days=1), None),
        ("https://b.com/", t0 + timedelta(days=2), "y"),
    ]
    got = change_rate(_df(spark, rows)).collect()[0]
    assert got["n_obs"] == 3
    assert got["n_changes"] == 1
    # estimator runs over the 2 digest-bearing captures: 1 slot,
    # 1 change, ibar = 2 days
    assert got["lambda_per_day"] == pytest.approx(
        _expected_lambda(1, 1, 2.0)
    )
    # all-non-null histories are bit-unchanged (covered by the other
    # tests); an all-NULL history takes the cold-start prior
    rows2 = [
        ("https://c.com/", t0, None),
        ("https://c.com/", t0 + timedelta(days=1), None),
    ]
    got2 = change_rate(_df(spark, rows2), prior_lambda_per_day=0.05).collect()[0]
    assert got2["n_changes"] == 0
    assert got2["lambda_per_day"] == pytest.approx(0.05)
