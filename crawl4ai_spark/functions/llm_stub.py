"""LLM-backed strategies as pluggable deterministic stubs
(SURVEY.md §2.9 LLMContentFilter, §2.10 LLMExtractionStrategy).

The reference calls a hosted model (content_filter_strategy.py:780-1060;
extraction_strategy.py:479-802 — chunk merge, ThreadPool fan-out, JSON
blocks, md5 disk cache). No network exists in this environment, so the
model call is a PLUGGABLE HOOK with a deterministic fake default; the
Spark-side shape — token-budget chunk merging, Arrow-batched fan-out,
JSON block output, content-hash memoization — is real and tested.

``merge_chunks`` ports utils.py:162-224: greedy packing of chunks into
sections under a token budget with a word-overlap carryover.
"""

from __future__ import annotations

import hashlib
import json


def merge_chunks(
    docs: list[str],
    target_size: int = 512,
    overlap: int = 0,
    word_token_ratio: float = 0.75,
) -> list[str]:
    """Greedy token-budget packing of chunks into sections (reference
    merge_chunks utils.py:162-224 semantics: estimated tokens =
    words / ratio; a chunk that overflows the budget closes the current
    section; `overlap` words of the previous section's tail prefix the
    next)."""
    sections: list[str] = []
    current: list[str] = []
    current_tokens = 0.0
    for doc in docs:
        words = doc.split()
        tokens = len(words) / word_token_ratio
        if current and current_tokens + tokens > target_size:
            sections.append(" ".join(current))
            tail = current[-overlap:] if overlap > 0 else []
            current = list(tail)
            current_tokens = len(tail) / word_token_ratio
        current.extend(words)
        current_tokens += tokens
    if current:
        sections.append(" ".join(current))
    return sections


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


def llm_extract_stage(
    df,
    text_col: str,
    *,
    instruction: str = "",
    chunk_token_threshold: int = 512,
    overlap: int = 32,
    llm=fake_llm,
    out_col: str = "extracted_content",
):
    """Chunk-merge -> per-section model call -> JSON block list, as one
    Arrow-batched mapInPandas with an in-batch md5 memo (the reference's
    disk cache analog)."""
    out_ddl = ", ".join(
        f.name + " " + f.dataType.simpleString() for f in df.schema.fields
    ) + f", {out_col} string"

    def process(batches):
        import pandas as pd

        memo: dict[str, str] = {}
        for pdf in batches:
            vals = []
            for text in pdf[text_col]:
                if text is None:
                    vals.append(None)
                    continue
                sections = merge_chunks(
                    text.split("\n\n") if "\n\n" in text else [text],
                    target_size=chunk_token_threshold,
                    overlap=overlap,
                )
                blocks = []
                for s in sections:
                    key = hashlib.md5(
                        (instruction + "\x00" + s).encode()
                    ).hexdigest()
                    if key not in memo:
                        memo[key] = llm(s, instruction)
                    blocks.append(json.loads(memo[key]))
                vals.append(json.dumps(blocks, ensure_ascii=False))
            out = pdf.copy()
            out[out_col] = vals
            yield out

    return df.mapInPandas(process, schema=out_ddl)
