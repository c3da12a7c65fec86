"""LLM adapter seam tests: retry/backoff contract, block shaping, and the
fake<->recorded adapter swap through the identical Spark pipeline
(reference: utils.py:1721-1790 backoff; extraction_strategy.py:626-704
TokenUsage + block/error shapes)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from crawl4ai_spark.functions.llm_adapter import (
    FakeAdapter,
    RateLimitedError,
    RecordedAdapter,
    complete_with_backoff,
    error_block,
    parse_blocks,
)
from crawl4ai_spark.functions.llm_stub import fake_llm, llm_extract_stage


# ---------------------------------------------------------------- unit level


def test_backoff_retries_rate_limits_with_exponential_delay():
    ad = RecordedAdapter({("i", "p"): '{"a": 1}'}, fail_first=2)
    delays = []
    resp = complete_with_backoff(ad, "p", "i", sleep=delays.append)
    assert json.loads(resp.content) == {"a": 1}
    assert ad.calls == 3
    assert delays == [2.0, 4.0]  # base * 2**attempt


def test_backoff_gives_up_after_max_attempts():
    ad = RecordedAdapter({}, fail_first=99)
    delays = []
    with pytest.raises(RateLimitedError):
        complete_with_backoff(ad, "p", "i", max_attempts=3, sleep=delays.append)
    assert ad.calls == 3
    assert delays == [2.0, 4.0]  # no sleep after the final attempt


def test_backoff_does_not_retry_other_errors():
    ad = RecordedAdapter({})  # unknown prompt -> KeyError
    with pytest.raises(KeyError):
        complete_with_backoff(ad, "missing", "i", sleep=lambda s: None)
    assert ad.calls == 1


def test_parse_blocks_shapes():
    # dict wrapping a single list unwraps
    blocks = parse_blocks('{"items": [{"x": 1}, {"x": 2}]}', 7)
    assert [b["x"] for b in blocks] == [1, 2]
    assert all(b["error"] is False and b["index"] == 7 for b in blocks)
    # bare dict becomes one block
    blocks = parse_blocks('{"x": 1, "y": 2}', 3)
    assert len(blocks) == 1 and blocks[0]["x"] == 1 and blocks[0]["index"] == 3
    # scalar / non-dict list items get wrapped
    blocks = parse_blocks('["a", {"b": 2}]', 0)
    assert blocks[0]["content"] == "a" and blocks[1]["b"] == 2
    # unparseable -> reference error block
    blocks = parse_blocks("not json {", 5)
    assert blocks == [error_block(5, "not json {")]
    assert blocks[0]["error"] is True and blocks[0]["tags"] == ["error"]


def test_fake_adapter_usage_counts_tokens():
    resp = FakeAdapter().complete("one two three", "do it")
    assert resp.usage.prompt_tokens == 5
    assert resp.usage.total_tokens == (
        resp.usage.prompt_tokens + resp.usage.completion_tokens
    )


# ---------------------------------------------- pipeline level (Spark)


def _docs(spark, sf_dir, n=8):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").limit(n)


def test_adapter_stage_emits_blocks_and_usage(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = llm_extract_stage(
        docs, "text", instruction="extract", adapter=FakeAdapter()
    )
    rows = out.collect()
    assert "llm_usage" in out.columns
    for r in rows:
        blocks = json.loads(r["extracted_content"])
        assert blocks and all(b["error"] is False for b in blocks)
        assert all("index" in b for b in blocks)
        assert r["llm_usage"]["total_tokens"] > 0
    # distributed TokenUsage totals: one agg away
    total = out.agg(
        F.sum("llm_usage.total_tokens").alias("t"),
        F.sum("llm_usage.prompt_tokens").alias("p"),
        F.sum("llm_usage.completion_tokens").alias("c"),
    ).first()
    assert total["t"] == total["p"] + total["c"] > 0


def test_fake_and_recorded_adapters_identical_plumbing(spark, sf_dir):
    """VERDICT r3 item 5 'done' criterion: swapping fake<->recorded adapters
    produces identical extraction through the same pipeline."""
    docs = _docs(spark, sf_dir)
    fake_out = llm_extract_stage(
        docs, "text", instruction="sum", adapter=FakeAdapter()
    ).collect()

    # record the transcript the fake produced, replay through RecordedAdapter
    texts = [r["text"] for r in docs.select("text").collect()]
    from crawl4ai_spark.functions.llm_stub import merge_chunks

    transcript = {}
    for t in texts:
        sections = merge_chunks(
            t.split("\n\n") if "\n\n" in t else [t], target_size=512, overlap=32
        )
        for s in sections:
            transcript[("sum", s)] = fake_llm(s, "sum")
    rec_out = llm_extract_stage(
        docs, "text", instruction="sum", adapter=RecordedAdapter(transcript)
    ).collect()

    fake_by_id = {r["doc_id"]: r["extracted_content"] for r in fake_out}
    rec_by_id = {r["doc_id"]: r["extracted_content"] for r in rec_out}
    assert fake_by_id == rec_by_id


def test_adapter_stage_provider_error_becomes_error_block(spark, sf_dir):
    """A provider error that isn't a rate limit degrades to the reference's
    error block (extraction_strategy.py:704) instead of failing the task."""
    docs = _docs(spark, sf_dir, n=3)

    class BrokenAdapter:
        def complete(self, prompt, instruction=""):
            raise ValueError("provider exploded")

    rows = llm_extract_stage(
        docs, "text", instruction="x", adapter=BrokenAdapter()
    ).collect()
    for r in rows:
        blocks = json.loads(r["extracted_content"])
        assert blocks and all(b["error"] is True for b in blocks)
        assert all(b["tags"] == ["error"] for b in blocks)
        assert "provider exploded" in blocks[0]["content"]
        assert r["llm_usage"]["total_tokens"] == 0


def test_legacy_callable_path_unchanged(spark, sf_dir):
    docs = _docs(spark, sf_dir, n=4)
    out = llm_extract_stage(docs, "text", instruction="extract")
    assert "llm_usage" not in out.columns
    for r in out.collect():
        blocks = json.loads(r["extracted_content"])
        assert blocks and blocks[0]["instruction"] == "extract"


def test_parse_blocks_salvages_embedded_objects():
    """Reference :682-690 salvage: whole-string parse fails, but every
    top-level {...} object is kept as-is (no error/index stamping) and
    unparseable segments ride ONE error block with the reference's
    hardcoded index 0."""
    from crawl4ai_spark.functions.llm_adapter import (
        split_and_parse_json_objects,
    )

    content = 'Here you go: {"a": 1} and {"b": } then {"c": 3} thanks!'
    parsed, unparsed = split_and_parse_json_objects(content)
    assert parsed == [{"a": 1}, {"c": 3}]
    assert unparsed == ['{"b": }']

    blocks = parse_blocks(content, 9)
    assert blocks[:2] == [{"a": 1}, {"c": 3}]  # untouched, like the reference
    assert blocks[2] == {
        "index": 0,  # reference quirk: 0, not the chunk index
        "error": True,
        "tags": ["error"],
        "content": ['{"b": }'],
    }

    # wrapping [...] stripped before the brace walk (utils.py:719-720)
    parsed, unparsed = split_and_parse_json_objects('[{"x": 1}, {"y": 2}]')
    assert parsed == [{"x": 1}, {"y": 2}] and unparsed == []

    # nested braces stay inside one segment
    parsed, _ = split_and_parse_json_objects('x {"a": {"b": 2}} y')
    assert parsed == [{"a": {"b": 2}}]

    # salvage finds nothing -> documented divergence: the engine keeps
    # the observable error block (reference silently returns [])
    blocks = parse_blocks("plain prose, no objects", 4)
    assert blocks == [error_block(4, "plain prose, no objects")]


def test_filter_stage_contentless_reply_drops_chunk_not_task(spark, sf_dir):
    """An OpenAI-shaped endpoint can reply with message.content=null
    (tool-call / content-filtered turns). The filter stage drops that
    chunk as failed instead of TypeError-ing the whole Spark task."""
    from crawl4ai_spark.functions.llm_adapter import LLMResponse, TokenUsage
    from crawl4ai_spark.functions.llm_stub import llm_filter_stage

    class NullContentAdapter:
        def complete(self, prompt, instruction=""):
            return LLMResponse(content=None, usage=TokenUsage(0, 0, 0))

    docs = _docs(spark, sf_dir)
    out = llm_filter_stage(docs, "text", adapter=NullContentAdapter())
    rows = out.collect()
    assert rows
    for r in rows:
        assert list(r["fit_blocks"]) == []
        assert r["llm_usage"]["failed_chunks"] >= 1
