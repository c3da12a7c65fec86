"""CosineStrategy analog: embed -> similarity prefilter -> cluster
(SURVEY.md §2.10, extraction_strategy.py:121-473).

The reference embeds page chunks with a HF model, cosine-prefilters
against a semantic query (threshold 0.3, at_least_k), then
hierarchically clusters (scipy ward linkage, max_dist 0.2) and filters
clusters by word count. No model or scipy ships here, so:

- the EMBEDDER is pluggable; the default is a deterministic hashed
  bag-of-words projection (stable across executors, unit-normalized) —
  real models drop in behind the same (texts)->ndarray signature;
- clustering is a from-scratch average-linkage agglomerative
  implementation in numpy (exact, O(n^3) worst case — per page, where
  n = chunks of ONE page, matching the reference's scale);
- everything runs per page inside one Arrow-batched mapInPandas;
  corpus-wide clustering is the documented Spark-ML path
  (BisectingKMeans over an embeddings table).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def hashed_embedder(texts: list[str], dim: int = 64) -> np.ndarray:
    """Deterministic hashed bag-of-words embeddings, L2-normalized.
    crc32-based so the vectors are identical across executors and runs
    (Python's builtin hash() is salted per process)."""
    from zlib import crc32

    out = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        for w in (t or "").lower().split():
            b = w.encode("utf-8")
            h = crc32(b)
            out[i, h % dim] += 1.0 if crc32(b, 1) % 2 else -1.0
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return out / norms


def hf_embedder(
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
    batch_size: int = 32,
    normalize: bool = True,
):
    """Factory for a real HF embedder behind the pluggable seam —
    the reference's model path (model_loader.py:86 loads
    AutoTokenizer + AutoModel for the same default model named at
    extraction_strategy.py:149; get_embeddings at
    extraction_strategy.py:285-338 mean-pools last_hidden_state in
    batches). Returns a (texts) -> ndarray callable with the exact
    signature `cosine_cluster_page(embedder=)` expects.

    `transformers`/`torch` do not ship in this sandbox, so the import
    is gated: calling the factory without them raises a loud
    NotImplementedError pointing at the hashed fallback. The
    tokenize -> forward -> mean-pool plumbing itself is real code,
    exercised in tests through a stub `transformers` module.

    At 100 TB this callable runs INSIDE mapInPandas tasks — each
    executor loads the model once per python worker (module-level
    lru_cache on the factory args would be the production add), and
    Arrow batches amortize the per-call overhead exactly like the
    reference's default_batch_size loop.
    """
    try:
        import torch
        from transformers import AutoModel, AutoTokenizer
    except ImportError as exc:  # pragma: no cover - sandbox path
        # transformers does not hard-require torch, so either import
        # can be the missing one — both route to the same helpful error
        raise NotImplementedError(
            "hf_embedder needs the `transformers` and `torch` packages "
            "(not shipped in this sandbox). Install transformers+torch, "
            "or pass the default hashed_embedder / any "
            "(texts)->ndarray callable as embedder=."
        ) from exc

    tokenizer = AutoTokenizer.from_pretrained(model_name)
    model = AutoModel.from_pretrained(model_name)
    model.eval()

    def embed(texts: list[str]) -> np.ndarray:
        chunks = []
        for i in range(0, len(texts), batch_size):
            batch = list(texts[i : i + batch_size])
            enc = tokenizer(
                batch, padding=True, truncation=True, return_tensors="pt"
            )
            with torch.no_grad():
                out = model(**enc)
            # mean pooling over the token axis, as the reference does
            chunks.append(out.last_hidden_state.mean(dim=1).cpu().numpy())
        emb = (
            np.vstack(chunks)
            if chunks
            else np.zeros((0, 0), dtype=np.float64)
        )
        emb = np.asarray(emb, dtype=np.float64)
        if normalize and emb.size:
            norms = np.linalg.norm(emb, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            emb = emb / norms
        return emb

    return embed


def cosine_sim_matrix(emb: np.ndarray) -> np.ndarray:
    return emb @ emb.T


def agglomerative_clusters(emb: np.ndarray, max_dist: float = 0.2) -> list[int]:
    """Average-linkage agglomerative clustering on cosine distance
    (1 - sim); merging stops when the closest pair exceeds max_dist.
    Returns a cluster label per row."""
    n = len(emb)
    if n == 0:
        return []
    labels = list(range(n))
    members: dict[int, list[int]] = {i: [i] for i in range(n)}
    sim = cosine_sim_matrix(emb)
    dist = 1.0 - sim
    np.fill_diagonal(dist, np.inf)
    active = set(range(n))
    while len(active) > 1:
        best = None
        best_d = max_dist
        for a in active:
            for b in active:
                if a < b:
                    d = np.mean(
                        [dist[i, j] for i in members[a] for j in members[b]]
                    )
                    if d <= best_d:
                        best_d = d
                        best = (a, b)
        if best is None:
            break
        a, b = best
        members[a].extend(members[b])
        del members[b]
        active.remove(b)
    out = [0] * n
    for label, idx in enumerate(sorted(members)):
        for i in members[idx]:
            out[i] = label
    return out


def cosine_cluster_page(
    chunks: list[str],
    *,
    semantic_filter: str | None = None,
    sim_threshold: float = 0.3,
    max_dist: float = 0.2,
    min_words: int = 3,
    embedder=hashed_embedder,
) -> list[dict]:
    """One page's chunks -> clustered sections (reference run() shape):
    optional query prefilter, cluster, drop thin clusters, emit
    {'cluster': k, 'chunks': [...], 'text': joined}."""
    kept = [c for c in chunks if c and c.strip()]
    if not kept:
        return []
    emb = embedder(kept)
    if semantic_filter:
        q = embedder([semantic_filter])[0]
        sims = emb @ q
        keep_idx = [i for i, s in enumerate(sims) if s >= sim_threshold]
        if not keep_idx:  # at_least_k fallback: best 1
            keep_idx = [int(np.argmax(sims))]
        kept = [kept[i] for i in keep_idx]
        emb = emb[keep_idx]
    labels = agglomerative_clusters(emb, max_dist=max_dist)
    clusters: dict[int, list[str]] = {}
    for label, chunk in zip(labels, kept):
        clusters.setdefault(label, []).append(chunk)
    out = []
    for label in sorted(clusters):
        text = " ".join(clusters[label])
        if len(text.split()) >= min_words:
            out.append({"cluster": label, "chunks": clusters[label], "text": text})
    return out


def cosine_cluster_stage(
    df,
    text_col: str,
    *,
    semantic_filter: str | None = None,
    sim_threshold: float = 0.3,
    max_dist: float = 0.2,
    min_words: int = 3,
    out_col: str = "clusters",
):
    """Arrow-batched per-page clustering: text split to paragraph chunks,
    clustered, emitted as a JSON string column."""
    import json

    out_ddl = ", ".join(
        f.name + " " + f.dataType.simpleString() for f in df.schema.fields
    ) + f", {out_col} string"

    def process(batches):
        for pdf in batches:
            vals = []
            for text in pdf[text_col]:
                if text is None:
                    vals.append(None)
                    continue
                chunks = [
                    c for c in (text.split("\n\n") if "\n\n" in text else
                                [" ".join(w) for w in _windows(text.split(), 20)])
                ]
                res = cosine_cluster_page(
                    chunks, semantic_filter=semantic_filter,
                    sim_threshold=sim_threshold, max_dist=max_dist,
                    min_words=min_words,
                )
                vals.append(json.dumps(res, ensure_ascii=False))
            out = pdf.copy()
            out[out_col] = vals
            yield out

    return df.mapInPandas(process, schema=out_ddl)


def _windows(words: list[str], size: int) -> list[list[str]]:
    return [words[i : i + size] for i in range(0, len(words), size)] or [[]]
