"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / resize / feature-extract / frame-sample stages.

These extend the crawl engine for large-scale training-data pipelines:
media fetched by a crawler lands as ``binary`` columns beside
``struct`` metadata; every processing stage is an Arrow-batched
``mapInPandas`` (schema, partitioning, UDF signature and batch shape
are real and tested).

Codec note: real image/audio codecs (PIL/libsndfile/ffmpeg) are not in
this container. The engine therefore defines a deterministic RAW
container (``RAW1`` header + uncompressed payload) that the synthetic
generator emits and the decode stage genuinely parses; third-party
codecs are a try-import fast path behind the same interface
(``NotImplementedError`` for formats without an available decoder).
All post-decode math (resize, features, frame sampling) is real numpy.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "mime string, width int, height int, channels int, "
    "sample_rate int, n_frames int"
)

_MAGIC = b"RAW1"


# ---------------------------------------------------------------------------
# RAW1 container: pack/unpack (deterministic, self-describing)
# ---------------------------------------------------------------------------


def pack_image(arr: np.ndarray) -> bytes:
    """uint8 HxWxC image -> RAW1 bytes."""
    h, w, c = arr.shape
    return _MAGIC + b"I" + struct.pack("<III", h, w, c) + arr.tobytes()


def pack_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono PCM -> RAW1 bytes."""
    return _MAGIC + b"A" + struct.pack("<II", sample_rate, len(samples)) + samples.astype("<i2").tobytes()


def pack_video(frames: np.ndarray) -> bytes:
    """uint8 NxHxWxC frame stack -> RAW1 bytes."""
    n, h, w, c = frames.shape
    return _MAGIC + b"V" + struct.pack("<IIII", n, h, w, c) + frames.tobytes()


class MediaDecodeError(ValueError):
    """Corrupt/truncated media payload — distinct from
    NotImplementedError (no codec available); both degrade a ROW to
    null in the stages, never the task."""


def decode_media(content: bytes):
    """Parse a RAW1 payload -> (kind, ndarray, meta). Unknown formats:
    try third-party codecs, else NotImplementedError; corrupt payloads
    (truncated RAW1, bytes PIL can't identify) -> MediaDecodeError."""
    if content is None:
        return None
    if content[:4] != _MAGIC:
        try:  # real-codec fast path when available
            import io

            from PIL import Image  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "no codec available for non-RAW1 media in this environment"
            )
        try:
            img = Image.open(io.BytesIO(content))
            arr = np.asarray(img)
        except Exception as exc:  # UnidentifiedImageError, OSError, ...
            raise MediaDecodeError(f"undecodable media bytes: {exc}") from exc
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return ("image", arr, {})
    try:
        tag = content[4:5]
        if tag == b"I":
            h, w, c = struct.unpack("<III", content[5:17])
            arr = np.frombuffer(content[17:], dtype=np.uint8).reshape(h, w, c)
            return ("image", arr, {"height": h, "width": w, "channels": c})
        if tag == b"A":
            sr, n = struct.unpack("<II", content[5:13])
            arr = np.frombuffer(content[13:], dtype="<i2")[:n]
            return ("audio", arr, {"sample_rate": sr, "n_samples": n})
        if tag == b"V":
            n, h, w, c = struct.unpack("<IIII", content[5:21])
            arr = np.frombuffer(content[21:], dtype=np.uint8).reshape(n, h, w, c)
            return ("video", arr, {"n_frames": n, "height": h, "width": w})
    except (struct.error, ValueError) as exc:  # truncated payload
        raise MediaDecodeError(f"truncated RAW1 payload: {exc}") from exc
    raise NotImplementedError(f"unknown RAW1 tag {tag!r}")


# ---------------------------------------------------------------------------
# synthetic media table (deterministic from doc_id)
# ---------------------------------------------------------------------------


def generate_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table from the documents ids: every doc gets
    an image; every 3rd an audio clip; every 5th a short video."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")

    def render(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                h, w = 8 + i % 8, 8 + (i * 3) % 8
                img = ((np.arange(h * w * 3, dtype=np.int64) * (i + 7)) % 256)
                img = img.astype(np.uint8).reshape(h, w, 3)
                rows.append(
                    (i * 10, "image", pack_image(img), "image/raw1",
                     w, h, 3, None, None)
                )
                if i % 3 == 0:
                    n = 1600 + (i % 5) * 160
                    t = np.arange(n, dtype=np.float64)
                    samples = (
                        np.sin(t * (0.01 + (i % 10) * 0.001)) * 3000
                    ).astype(np.int16)
                    rows.append(
                        (i * 10 + 1, "audio", pack_audio(samples, 16000),
                         "audio/raw1", None, None, None, 16000, None)
                    )
                if i % 5 == 0:
                    frames = (
                        (np.arange(6 * 4 * 4 * 3, dtype=np.int64) * (i + 3)) % 256
                    ).astype(np.uint8).reshape(6, 4, 4, 3)
                    rows.append(
                        (i * 10 + 2, "video", pack_video(frames), "video/raw1",
                         4, 4, 3, None, 6)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "content", "mime", "width", "height",
                    "channels", "sample_rate", "n_frames",
                ],
            )

    return docs.mapInPandas(render, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# processing stages (all Arrow-batched mapInPandas)
# ---------------------------------------------------------------------------


def _carry_ddl(df: DataFrame, extra: str) -> str:
    return ", ".join(
        f.name + " " + f.dataType.simpleString() for f in df.schema.fields
    ) + ", " + extra


def image_resize_stage(df: DataFrame, out_w: int, out_h: int,
                       content_col: str = "content") -> DataFrame:
    """Nearest-neighbor resize of RAW1 images -> ``resized`` binary
    (non-images pass through null). Narrow, no shuffle."""
    out_ddl = _carry_ddl(df, "resized binary")

    def process(batches):
        for pdf in batches:
            out = []
            for content in pdf[content_col]:
                try:
                    decoded = decode_media(bytes(content)) if content is not None else None
                except (NotImplementedError, MediaDecodeError):
                    decoded = None
                if decoded is None or decoded[0] != "image":
                    out.append(None)
                    continue
                _, arr, _ = decoded
                h, w, _c = arr.shape
                ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                out.append(pack_image(arr[ys][:, xs]))
            res = pdf.copy()
            res["resized"] = out
            yield res

    return df.mapInPandas(process, schema=out_ddl)


FEATURE_DDL = (
    "feat_mean array<double>, feat_std array<double>, phash bigint, "
    "embedding array<float>"
)


def media_features_stage(df: DataFrame, content_col: str = "content",
                         embed_dim: int = 16) -> DataFrame:
    """Per-media features: channel mean/std, a 64-bit perceptual-hash
    style fingerprint (average-threshold bits over an 8x8 downsample),
    and a deterministic projection embedding usable by the similarity
    operators. Audio gets loudness/zero-crossing features mapped into
    the same columns; video uses its middle frame."""
    out_ddl = _carry_ddl(df, FEATURE_DDL)

    def phash64(gray: np.ndarray) -> int:
        ys = (np.arange(8) * gray.shape[0] // 8).clip(0, gray.shape[0] - 1)
        xs = (np.arange(8) * gray.shape[1] // 8).clip(0, gray.shape[1] - 1)
        small = gray[ys][:, xs]
        bits = (small > small.mean()).astype(np.uint64).ravel()
        return int(
            (bits << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64).view(np.int64)
        )

    def project(vec: np.ndarray, dim: int) -> list[float]:
        n = max(len(vec), 1)
        idx = (np.arange(dim) * n // dim).clip(0, n - 1)
        base = vec[idx].astype(np.float64)
        return (base / (np.abs(base).max() + 1e-9)).astype(np.float32).tolist()

    def process(batches):
        for pdf in batches:
            means, stds, hashes, embs = [], [], [], []
            for content in pdf[content_col]:
                try:
                    decoded = decode_media(bytes(content)) if content is not None else None
                except (NotImplementedError, MediaDecodeError):
                    decoded = None
                if decoded is None or decoded[1].size == 0:
                    # zero-length audio / 0-dim images have no features;
                    # indexing into the empty vector would IndexError
                    means.append(None)
                    stds.append(None)
                    hashes.append(None)
                    embs.append(None)
                    continue
                kind, arr, _ = decoded
                if kind == "video":
                    arr = arr[arr.shape[0] // 2]
                    kind = "image"
                if kind == "image":
                    f = arr.reshape(-1, arr.shape[-1]).astype(np.float64)
                    means.append(f.mean(axis=0).tolist())
                    stds.append(f.std(axis=0).tolist())
                    gray = arr.astype(np.float64).mean(axis=2)
                    hashes.append(phash64(gray))
                    embs.append(project(f.mean(axis=1), 16))
                else:  # audio
                    a = arr.astype(np.float64)
                    zc = float(np.mean(np.abs(np.diff(np.sign(a))) > 0))
                    means.append([float(np.abs(a).mean()), zc])
                    stds.append([float(a.std())])
                    q = (a > a.mean()).astype(np.uint64)[:64]
                    q = np.pad(q, (0, 64 - len(q)))
                    hashes.append(
                        int((q << np.arange(64, dtype=np.uint64)).sum(
                            dtype=np.uint64).view(np.int64))
                    )
                    embs.append(project(a, 16))
            res = pdf.copy()
            res["feat_mean"] = means
            res["feat_std"] = stds
            res["phash"] = pd.array(hashes, dtype="Int64")
            res["embedding"] = embs
            yield res

    return df.mapInPandas(process, schema=out_ddl)


def video_frame_sample_stage(df: DataFrame, every_k: int = 2,
                             content_col: str = "content") -> DataFrame:
    """Explode videos into sampled frames (one row per kept frame):
    (media_id, frame_idx, frame binary) — the Spark-side shape of a
    frame-sampling pipeline; non-videos produce no rows."""
    out_ddl = "media_id bigint, frame_idx int, frame binary"

    def process(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf[content_col]):
                try:
                    decoded = decode_media(bytes(content)) if content is not None else None
                except (NotImplementedError, MediaDecodeError):
                    decoded = None
                if decoded is None or decoded[0] != "video":
                    continue
                _, arr, _ = decoded
                for i in range(0, arr.shape[0], every_k):
                    ids.append(int(mid))
                    idxs.append(i)
                    frames.append(pack_image(arr[i]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.mapInPandas(process, schema=out_ddl)
