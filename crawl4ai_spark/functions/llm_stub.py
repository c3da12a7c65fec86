"""LLM-backed strategies as pluggable deterministic stubs
(SURVEY.md §2.9 LLMContentFilter, §2.10 LLMExtractionStrategy).

The reference calls a hosted model (content_filter_strategy.py:780-1060;
extraction_strategy.py:479-802 — chunk merge, ThreadPool fan-out, JSON
blocks, md5 disk cache). No network exists in this environment, so the
model call is a PLUGGABLE HOOK with a deterministic fake default; the
Spark-side shape — token-budget chunk merging, Arrow-batched fan-out,
JSON block output, content-hash memoization — is real and tested.

``merge_chunks`` ports utils.py:162-224 algorithm-identically: the
token estimates size a fixed chunk count, raw words then distribute
sequentially with a word-overlap carryover, and the final chunk
absorbs any remainder unbounded.
"""

from __future__ import annotations

import hashlib
import json


def merge_chunks(
    docs: list[str],
    target_size: int = 512,
    overlap: int = 0,
    word_token_ratio: float = 1.3,
) -> list[str]:
    """Algorithm-identical port of utils.py:162-224 (pinned live in
    tests/test_reference_differential.py): per-doc token estimate =
    int(words * ratio) — docs whose estimate rounds to ZERO are dropped
    whole, a reference quirk — the estimates size a FIXED chunk count
    ceil(total/target), then raw words distribute sequentially,
    advancing (with `overlap` carryover words) once a chunk holds
    target_size words; the final chunk absorbs any remainder unbounded.
    Default ratio 1.3 matches what the LLM-extraction call site passes
    (config.WORD_TOKEN_RATE, extraction_strategy.py) — the reference
    FUNCTION's own signature defaults word_token_ratio to 1.0; callers
    expecting reference-signature parity should pass 1.0 explicitly."""
    all_tokens: list[list[str]] = []
    total_tokens = 0
    for doc in docs:
        tokens = doc.split()
        count = int(len(tokens) * word_token_ratio)
        if count:
            all_tokens.append(tokens)
            total_tokens += count
    if not total_tokens:
        return []

    num_chunks = max(1, (total_tokens + target_size - 1) // target_size)
    chunks: list[list[str]] = [[] for _ in range(num_chunks)]
    curr_chunk = 0
    curr_size = 0
    for token in (t for doc in all_tokens for t in doc):
        if curr_size >= target_size and curr_chunk < num_chunks - 1:
            if overlap > 0:
                overlap_tokens = chunks[curr_chunk][-overlap:]
                curr_chunk += 1
                chunks[curr_chunk].extend(overlap_tokens)
                curr_size = len(overlap_tokens)
            else:
                curr_chunk += 1
                curr_size = 0
        chunks[curr_chunk].append(token)
        curr_size += 1

    return [" ".join(chunk) for chunk in chunks if chunk]


def fake_llm(prompt: str, instruction: str = "") -> str:
    """Deterministic stand-in for a model call: extracts the capitalized
    terms and first sentence of the prompt into a JSON block — stable,
    hermetic, and obviously fake."""
    words = prompt.split()
    caps = sorted({w.strip(".,") for w in words if w[:1].isupper()})[:8]
    first_sentence = prompt.split(".")[0][:200]
    return json.dumps(
        {
            "summary": first_sentence,
            "entities": caps,
            "instruction": instruction,
            "n_tokens_est": len(words),
        },
        ensure_ascii=False,
        sort_keys=True,
    )


def extract_xml_data(tags: list[str], string: str) -> dict:
    """Port of reference utils.py:1688-1718: for each tag, the LONGEST
    ``<tag>...</tag>`` match (DOTALL), stripped; "" when absent."""
    import re

    data = {}
    for tag in tags:
        matches = re.findall(f"<{tag}>(.*?)</{tag}>", string, re.DOTALL)
        data[tag] = max(matches, key=len).strip() if matches else ""
    return data


def _sanitize_html_for_prompt(html: str) -> str:
    """Reference utils.py:752-773 sanitize_html: escape quotes."""
    return html.replace('"', '\\"').replace("'", "\\'")


# Functional mirror of the reference's PROMPT_FILTER_CONTENT contract
# (prompts.py:263): the model receives the HTML and the instruction and
# must answer with the cleaned markdown inside a <content> block.
FILTER_PROMPT_TEMPLATE = (
    "Filter and convert this HTML into clean, focused markdown, "
    "keeping only content relevant to the request.\n"
    "<html_input>{HTML}</html_input>\n<request>{REQUEST}</request>\n"
    "Return the markdown wrapped in <content>...</content> tags."
)
DEFAULT_FILTER_REQUEST = (
    "Convert this HTML into clean, relevant markdown, removing any "
    "noise or irrelevant content."
)


def llm_filter_stage(
    df,
    html_col: str,
    *,
    adapter,
    instruction: str | None = None,
    chunk_token_threshold: int = int(1e9),
    overlap_rate: float = 0.1,
    word_token_rate: float = 1.3,
    out_col: str = "fit_blocks",
    usage_col: str = "llm_usage",
    max_attempts: int = 3,
    base_delay: float = 2.0,
):
    """LLMContentFilter as one Arrow-batched mapInPandas (reference
    content_filter_strategy.py:780-1060 ``filter_content``): chunk the
    html with ``merge_chunks`` (defaults = the reference's — one giant
    chunk unless the caller lowers the threshold; overlap =
    ``int(threshold * overlap_rate)``), build the filter prompt per
    chunk (quotes escaped like sanitize_html), call the adapter through
    ``complete_with_backoff``, and keep each response's longest
    ``<content>`` block (extract_xml_data, utils.py:1688-1718). Failed
    or empty chunks are SKIPPED (the reference logs and drops them —
    no error blocks here, unlike extraction), but the drop count rides
    the usage struct as ``failed_chunks`` so a health monitor can tell
    an all-errored row from a legitimately empty one. Emits
    ``out_col array<string>`` (the ordered blocks — the reference's
    return value) and a per-row ``usage_col`` token struct; totals are
    one agg away, the distributed ``show_usage``. An in-batch md5 memo
    on (html-chunk, instruction) mirrors the reference's
    llm_cache/content_filter disk cache (:905-931) — memo hits account
    zero usage like the reference's cache path."""
    from .llm_adapter import complete_with_backoff

    request = instruction or DEFAULT_FILTER_REQUEST
    out_ddl = ", ".join(
        f.name + " " + f.dataType.simpleString() for f in df.schema.fields
    ) + (
        f", {out_col} array<string>, {usage_col} "
        "struct<prompt_tokens:bigint,completion_tokens:bigint,"
        "total_tokens:bigint,failed_chunks:bigint>"
    )
    overlap = int(chunk_token_threshold * overlap_rate)

    def process(batches):
        memo: dict[str, str] = {}
        for pdf in batches:
            vals, usages = [], []
            for html in pdf[html_col]:
                if html is None or not isinstance(html, str) or not html:
                    vals.append([])
                    usages.append(None)
                    continue
                chunks = merge_chunks(
                    [html],
                    target_size=chunk_token_threshold,
                    overlap=overlap,
                    word_token_ratio=word_token_rate,
                )
                blocks = []
                # failed_chunks makes dropped chunks observable: an
                # endpoint-down row would otherwise land as
                # fit_blocks=[] with all-zero usage — the same shape
                # as a legitimately filtered-to-empty memo-hit row
                usage = {
                    "prompt_tokens": 0,
                    "completion_tokens": 0,
                    "total_tokens": 0,
                    "failed_chunks": 0,
                }
                for chunk in chunks:
                    key = hashlib.md5(
                        (chunk + request).encode()
                    ).hexdigest()
                    if key in memo:
                        content = memo[key]
                    else:
                        prompt = FILTER_PROMPT_TEMPLATE.replace(
                            "{HTML}", _sanitize_html_for_prompt(chunk)
                        ).replace("{REQUEST}", request)
                        try:
                            resp = complete_with_backoff(
                                adapter,
                                prompt,
                                max_attempts=max_attempts,
                                base_delay=base_delay,
                            )
                        except Exception:  # noqa: BLE001 — chunk dropped
                            usage["failed_chunks"] += 1
                            continue
                        u = getattr(resp, "usage", None)
                        if u is not None:
                            usage["prompt_tokens"] += u.prompt_tokens
                            usage["completion_tokens"] += u.completion_tokens
                            usage["total_tokens"] += u.total_tokens
                        content = resp.content
                        memo[key] = content
                    if not isinstance(content, str):
                        # contentless reply (tool-call / filtered /
                        # None content) — drop the chunk, never the task
                        usage["failed_chunks"] += 1
                        continue
                    block = extract_xml_data(["content"], content)["content"]
                    if block:
                        blocks.append(block)
                vals.append(blocks)
                usages.append(usage)
            out = pdf.copy()
            out[out_col] = vals
            out[usage_col] = usages
            yield out

    return df.mapInPandas(process, schema=out_ddl)


def llm_extract_stage(
    df,
    text_col: str,
    *,
    instruction: str = "",
    chunk_token_threshold: int = 512,
    overlap: int = 32,
    llm=fake_llm,
    adapter=None,
    out_col: str = "extracted_content",
    usage_col: str = "llm_usage",
    max_attempts: int = 3,
    base_delay: float = 2.0,
):
    """Chunk-merge -> per-section model call -> JSON block list, as one
    Arrow-batched mapInPandas with an in-batch md5 memo (the reference's
    disk cache analog, extraction_strategy.py:537-556).

    Two call paths share the identical pipeline plumbing:

    - ``llm=`` (default): a bare ``(prompt, instruction) -> str`` callable;
      blocks are the parsed JSON verbatim and no usage column is emitted.
    - ``adapter=``: an ``llm_adapter`` object (``complete() -> LLMResponse``).
      Calls go through ``complete_with_backoff`` (3 attempts, exponential
      delay on rate limits — utils.py:1721-1790), responses are shaped by
      ``parse_blocks`` (dict-unwrap + index/error stamping,
      extraction_strategy.py:658-688), non-retryable provider errors become
      the reference's error block (:704) instead of failing the task, and a
      ``usage_col`` struct (prompt/completion/total tokens) is appended per
      row — the distributed equivalent of TokenUsage running totals
      (extraction_strategy.py:626-656): totals are one ``agg`` away. Memo
      hits account zero usage, mirroring the reference's cache-hit path.
    """
    out_ddl = ", ".join(
        f.name + " " + f.dataType.simpleString() for f in df.schema.fields
    ) + f", {out_col} string"
    if adapter is not None:
        out_ddl += (
            f", {usage_col} struct<prompt_tokens:bigint,"
            "completion_tokens:bigint,total_tokens:bigint>"
        )

    def run_sections(sections, memo):
        """Legacy callable path: parsed JSON verbatim, no usage."""
        blocks = []
        for s in sections:
            key = hashlib.md5((instruction + "\x00" + s).encode()).hexdigest()
            if key not in memo:
                memo[key] = llm(s, instruction)
            blocks.append(json.loads(memo[key]))
        return blocks, None

    def run_sections_adapter(sections, memo):
        from .llm_adapter import complete_with_backoff, error_block, parse_blocks

        blocks = []
        usage = {"prompt_tokens": 0, "completion_tokens": 0, "total_tokens": 0}
        for ix, s in enumerate(sections):
            key = hashlib.md5((instruction + "\x00" + s).encode()).hexdigest()
            if key in memo:
                blocks.extend(parse_blocks(memo[key], ix))
                continue
            try:
                resp = complete_with_backoff(
                    adapter,
                    s,
                    instruction,
                    max_attempts=max_attempts,
                    base_delay=base_delay,
                )
            except Exception as e:  # noqa: BLE001 — degrade, don't kill the task
                blocks.append(error_block(ix, f"{type(e).__name__}: {e}"))
                continue
            memo[key] = resp.content
            u = getattr(resp, "usage", None)
            if u is not None:  # adapters may omit usage accounting
                usage["prompt_tokens"] += u.prompt_tokens
                usage["completion_tokens"] += u.completion_tokens
                usage["total_tokens"] += u.total_tokens
            blocks.extend(parse_blocks(resp.content, ix))
        return blocks, usage

    runner = run_sections if adapter is None else run_sections_adapter

    def process(batches):
        memo: dict[str, str] = {}
        for pdf in batches:
            vals = []
            usages = []
            for text in pdf[text_col]:
                if text is None:
                    vals.append(None)
                    usages.append(None)
                    continue
                sections = merge_chunks(
                    text.split("\n\n") if "\n\n" in text else [text],
                    target_size=chunk_token_threshold,
                    overlap=overlap,
                )
                blocks, usage = runner(sections, memo)
                vals.append(json.dumps(blocks, ensure_ascii=False))
                usages.append(usage)
            out = pdf.copy()
            out[out_col] = vals
            if adapter is not None:
                out[usage_col] = usages
            yield out

    return df.mapInPandas(process, schema=out_ddl)
