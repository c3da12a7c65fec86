"""Sequence packing (operators/packing.py): assignment parity with a
pure-Python packer, bucketing/partitioning invariance (the two-phase
prefix sum), full-sequence invariants, and stats."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.operators.packing import (
    global_offsets,
    pack_concat_chunk,
    pack_truncate_pad,
    packing_stats,
)

L = 100


def _counts(n_docs: int) -> list[tuple[int, int]]:
    # deterministic ragged lengths incl. zero-token and >L docs
    return [(i, (i * 37 + 11) % 260 if i % 9 else 0) for i in range(n_docs)]


def _py_pack(counts: list[tuple[int, int]], seq_len: int, eos: int = 1):
    """Reference concat-and-chunk: walk the concatenated stream."""
    out = []
    g = 0
    for doc_id, n in counts:
        n_eff = n + eos
        start, end = g, g + n_eff
        s = start // seq_len
        while s * seq_len < end:
            p0 = max(start, s * seq_len)
            p1 = min(end, (s + 1) * seq_len)
            out.append((doc_id, s, p0 - start, p0 - s * seq_len, p1 - p0))
            s += 1
        g = end
    return sorted(out)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_counts(200), "doc_id long, n long")


def _assignment(docs, docs_per_bucket=16):
    return pack_concat_chunk(
        docs, "doc_id", F.col("n"), L, docs_per_bucket=docs_per_bucket
    )


def test_matches_python_reference(docs):
    got = sorted(
        tuple(r)
        for r in _assignment(docs)
        .select("doc_id", "seq_id", "doc_offset", "seq_offset", "n_piece")
        .collect()
    )
    assert got == _py_pack(_counts(200), L)


@pytest.mark.parametrize("bucket", [1, 7, 4096])
def test_bucket_size_invariance(docs, bucket):
    base = sorted(tuple(r) for r in _assignment(docs, 16).collect())
    other = sorted(tuple(r) for r in _assignment(docs, bucket).collect())
    assert base == other


def test_partitioning_invariance(docs):
    base = sorted(tuple(r) for r in _assignment(docs).collect())
    shuffled = sorted(
        tuple(r) for r in _assignment(docs.repartition(13)).collect()
    )
    assert base == shuffled


def test_all_but_last_sequence_full(docs):
    per_seq = (
        _assignment(docs)
        .groupBy("seq_id")
        .agg(F.sum("n_piece").alias("filled"))
        .collect()
    )
    last = max(r.seq_id for r in per_seq)
    for r in per_seq:
        assert r.filled == L or r.seq_id == last


def test_docs_reassemble_contiguously(docs):
    rows = (
        _assignment(docs)
        .orderBy("doc_id", "doc_offset")
        .groupBy("doc_id")
        .agg(
            F.sum("n_piece").alias("total"),
            F.min("doc_offset").alias("first"),
        )
        .collect()
    )
    counts = dict(_counts(200))
    for r in rows:
        assert r.first == 0
        assert r.total == counts[r.doc_id] + 1  # +1 EOS


def test_global_offsets_are_exclusive_prefix_sums(spark):
    df = spark.createDataFrame(
        [(i, i % 5 + 1) for i in range(50)], "doc_id long, n long"
    )
    rows = global_offsets(df, "doc_id", "n", 8).orderBy("doc_id").collect()
    acc = 0
    for r in rows:
        assert r._g == acc
        acc += r.n


def test_truncate_pad_caps_and_stats(docs):
    tp = pack_truncate_pad(docs, "doc_id", F.col("n"), L)
    rows = tp.collect()
    counts = dict(_counts(200))
    assert len(rows) == 200
    for r in rows:
        assert r.seq_id == r.doc_id and r.n_piece == min(counts[r.doc_id] + 1, L)
    st = packing_stats(tp, L).collect()[0]
    assert st.n_seqs == 200
    assert st.split_docs == 0
    assert st.tokens_placed == sum(min(n + 1, L) for n in counts.values())
    expected_ppm = (200 * L - st.tokens_placed) * 1_000_000 // (200 * L)
    assert st.pad_ppm == expected_ppm


def test_stats_empty_assignment_is_zero_row(spark):
    """cap = n_seqs * L is 0 on an empty assignment: stats must be a
    zero row, not nulls (or an ANSI division error)."""
    empty = spark.createDataFrame(
        [], "doc_id long, seq_id long, doc_offset long, "
            "seq_offset long, n_piece long"
    )
    (st,) = packing_stats(empty, L).collect()
    assert (st.n_seqs, st.tokens_placed, st.pad_ppm, st.split_docs) == (
        0, 0, 0, 0,
    )


def test_concat_chunk_stats_near_full(docs):
    cc = _assignment(docs)
    st = packing_stats(cc, L).collect()[0]
    total = sum(n + 1 for _, n in _counts(200))
    assert st.tokens_placed == total
    assert st.n_seqs == (total + L - 1) // L
    # only the final partial sequence pads
    assert st.pad_ppm == (st.n_seqs * L - total) * 1_000_000 // (st.n_seqs * L)
    assert st.split_docs > 0


def test_zero_length_doc_emits_no_phantom_pieces(spark):
    """With eos_tokens=0 a zero-token doc occupies no positions: it
    must emit NO assignment rows. At a sequence boundary its
    last_seq < first_seq and F.sequence would generate a DESCENDING
    range — phantom pieces with seq_offset outside [0, seq_len)."""
    df = spark.createDataFrame(
        [(0, 8), (1, 0), (2, 5)], "id long, n long"
    )
    out = pack_concat_chunk(
        df, "id", F.col("n"), seq_len=8, eos_tokens=0, docs_per_bucket=2
    ).collect()
    assert all(r["id"] != 1 for r in out)
    assert all(0 <= r["seq_offset"] < 8 for r in out)
    assert all(r["n_piece"] > 0 for r in out)
    # the real docs still tile exactly
    assert sum(r["n_piece"] for r in out) == 13
