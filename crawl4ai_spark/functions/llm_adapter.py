"""Provider-agnostic LLM adapter: the model-call seam behind
LLMExtractionStrategy / LLMContentFilter.

The reference routes every model call through
``perform_completion_with_backoff`` (utils.py:1721-1790 — litellm
completion, 3 attempts, exponential backoff on rate limits) and
accounts per-request token usage into running totals
(extraction_strategy.py:626-656 TokenUsage; show_usage at :781+).
No network or provider SDK exists in this sandbox, so the adapter is
the pluggable boundary: anything with
``complete(prompt, instruction) -> LLMResponse`` plugs into the same
Spark pipeline — the deterministic fake in tests, a recorded
transcript for replay, or a real HTTP client in production. Retry and
usage logic live HERE (engine side), not in the provider, mirroring
the reference's split.

Usage accounting is Spark-shaped: instead of driver-side mutable
totals (which can't cross executors), ``llm_extract_stage`` emits a
per-row usage struct and totals are one ``agg`` away — the distributed
equivalent of ``show_usage``.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass


class RateLimitedError(Exception):
    """Adapter-raised signal that the provider throttled the request —
    the ONE error class the backoff loop retries (reference: litellm
    RateLimitError)."""


@dataclass
class TokenUsage:
    completion_tokens: int = 0
    prompt_tokens: int = 0
    total_tokens: int = 0


@dataclass
class LLMResponse:
    content: str
    usage: TokenUsage


class FakeAdapter:
    """Deterministic hermetic stand-in (wraps llm_stub.fake_llm):
    stable JSON blocks, usage estimated by whitespace token counts."""

    def complete(self, prompt: str, instruction: str = "") -> LLMResponse:
        from .llm_stub import fake_llm

        content = fake_llm(prompt, instruction)
        p = len(prompt.split()) + len(instruction.split())
        c = len(content.split())
        return LLMResponse(
            content=content,
            usage=TokenUsage(
                completion_tokens=c, prompt_tokens=p, total_tokens=p + c
            ),
        )


class RecordedAdapter:
    """Replay adapter: responses keyed by (instruction, prompt) —
    the transcript shape a production run records. Unknown prompts
    raise (a recorded run must be complete); optional injected
    failures exercise the retry path."""

    def __init__(self, transcript: dict, fail_first: int = 0):
        self.transcript = dict(transcript)
        self.fail_first = int(fail_first)
        self.calls = 0

    def complete(self, prompt: str, instruction: str = "") -> LLMResponse:
        self.calls += 1
        if self.calls <= self.fail_first:
            raise RateLimitedError("recorded 429")
        content = self.transcript[(instruction, prompt)]
        p = len(prompt.split()) + len(instruction.split())
        c = len(content.split())
        return LLMResponse(
            content=content,
            usage=TokenUsage(
                completion_tokens=c, prompt_tokens=p, total_tokens=p + c
            ),
        )


class HttpJsonAdapter:
    """Chat-completions HTTP adapter on stdlib urllib — the production
    shape of the seam the reference reaches through litellm
    (utils.py:1721-1790). Speaks the OpenAI-style wire format (the de
    facto cross-provider JSON shape):

    request:  POST {endpoint}  {"model", "messages":[{"role":"system",
              "content": instruction}?, {"role":"user","content":
              prompt}], "temperature"}
    response: {"choices":[{"message":{"content": ...}}],
               "usage":{"prompt_tokens","completion_tokens",
               "total_tokens"}}

    429/503/529 map to RateLimitedError (the one retry-eligible class
    of ``complete_with_backoff``); every other HTTP or transport error
    propagates, which ``llm_extract_stage`` turns into the reference's
    error block instead of a task failure. Offline-tested against a
    local http.server fake; no provider SDK involved."""

    RATE_LIMIT_CODES = (429, 503, 529)

    def __init__(
        self,
        endpoint: str,
        model: str = "default",
        api_key: str | None = None,
        timeout: float = 30.0,
        temperature: float = 0.0,
        extra_headers: dict | None = None,
        extra_body: dict | None = None,
    ):
        self.endpoint = endpoint
        self.model = model
        self.api_key = api_key
        self.timeout = float(timeout)
        self.temperature = float(temperature)
        self.extra_headers = dict(extra_headers or {})
        self.extra_body = dict(extra_body or {})

    def complete(self, prompt: str, instruction: str = "") -> LLMResponse:
        import urllib.error
        import urllib.request

        messages = []
        if instruction:
            messages.append({"role": "system", "content": instruction})
        messages.append({"role": "user", "content": prompt})
        body = dict(self.extra_body)
        body.update(
            {
                "model": self.model,
                "messages": messages,
                "temperature": self.temperature,
            }
        )
        headers = {"Content-Type": "application/json", **self.extra_headers}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        req = urllib.request.Request(
            self.endpoint,
            data=json.dumps(body).encode("utf-8"),
            headers=headers,
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                payload = json.loads(r.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if e.code in self.RATE_LIMIT_CODES:
                raise RateLimitedError(f"HTTP {e.code}") from e
            raise
        content = payload["choices"][0]["message"]["content"]
        u = payload.get("usage") or {}
        return LLMResponse(
            content=content,
            usage=TokenUsage(
                completion_tokens=int(u.get("completion_tokens", 0)),
                prompt_tokens=int(u.get("prompt_tokens", 0)),
                total_tokens=int(u.get("total_tokens", 0)),
            ),
        )


def complete_with_backoff(
    adapter,
    prompt: str,
    instruction: str = "",
    max_attempts: int = 3,
    base_delay: float = 2.0,
    sleep=time.sleep,
) -> LLMResponse:
    """The reference's retry contract (utils.py:1752-1753): up to
    ``max_attempts`` tries, exponential delay ``base_delay * 2**n``,
    retrying ONLY rate-limit signals — other errors propagate to the
    caller, which turns them into error blocks, not task failures.
    ``sleep`` is injectable so tests don't wait."""
    for attempt in range(int(max_attempts)):
        try:
            return adapter.complete(prompt, instruction)
        except RateLimitedError:
            if attempt == max_attempts - 1:
                raise
            sleep(base_delay * (2 ** attempt))
    raise RuntimeError("unreachable")


def split_and_parse_json_objects(json_string: str) -> tuple[list, list]:
    """Reference utils.py:707-750: strip a wrapping ``[...]``, walk the
    string tracking brace depth to cut out top-level ``{...}`` segments,
    then json-parse each — returns (parsed objects, unparseable segment
    strings). The salvage path for malformed LLM responses: a reply
    with trailing prose or a broken object still yields every valid
    object embedded in it."""
    if json_string.startswith("[") and json_string.endswith("]"):
        json_string = json_string[1:-1].strip()
    segments = []
    depth = 0
    start_index = 0
    for i, char in enumerate(json_string):
        if char == "{":
            if depth == 0:
                start_index = i
            depth += 1
        elif char == "}":
            depth -= 1
            if depth == 0:
                segments.append(json_string[start_index : i + 1])
    parsed, unparsed = [], []
    for segment in segments:
        try:
            parsed.append(json.loads(segment))
        except json.JSONDecodeError:
            unparsed.append(segment)
    return parsed, unparsed


def parse_blocks(content: str, ix: int) -> list[dict]:
    """Reference block-shaping (extraction_strategy.py:658-688): parse
    the JSON response; a dict wrapping a single list unwraps to that
    list; a bare dict becomes a one-block list; every parsed block is
    stamped error=False. A response that fails whole-string parsing
    falls back to the reference's salvage (:682-690): every top-level
    ``{...}`` object it contains is kept (as-is, no error/index
    stamping — the reference leaves salvaged blocks untouched), and
    unparseable segments ride ONE error block whose content is the
    segment list and whose index is the reference's hardcoded 0.
    Documented divergence: when salvage finds nothing at all (no
    braces — e.g. a prose reply, None, bytes), the reference silently
    returns []; this engine keeps the error block so the malformed
    response stays observable in the output table."""
    try:
        blocks = json.loads(content)
        if isinstance(blocks, dict):
            if len(blocks) == 1 and isinstance(next(iter(blocks.values())), list):
                blocks = next(iter(blocks.values()))
            else:
                blocks = [blocks]
        if not isinstance(blocks, list):
            blocks = [{"content": blocks}]
        out = []
        for b in blocks:
            if not isinstance(b, dict):
                b = {"content": b}
            b = dict(b)
            b.setdefault("index", ix)
            b["error"] = False
            out.append(b)
        return out
    except Exception:
        # TypeError (content=None/bytes from a misbehaving adapter) and
        # friends degrade like bad JSON — one malformed response must
        # never kill a whole Spark task
        try:
            parsed, unparsed = split_and_parse_json_objects(content)
        except Exception:
            parsed, unparsed = [], []
        if parsed or unparsed:
            blocks = list(parsed)
            if unparsed:
                blocks.append(
                    {
                        "index": 0,  # reference quirk: not ix
                        "error": True,
                        "tags": ["error"],
                        "content": unparsed,
                    }
                )
            return blocks
        return [error_block(ix, content)]


def error_block(ix: int, message: str) -> dict:
    """The reference's error block shape (extraction_strategy.py:704)."""
    return {"index": ix, "error": True, "tags": ["error"], "content": str(message)}
