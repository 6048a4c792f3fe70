"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is STUBBED (this container has no image/audio libraries):
``decode_image`` raises ``NotImplementedError`` unless a deterministic fake
decoder is requested. Everything Spark-side — schema, partitioning, UDF
signature, batch shape — is real and tested; swapping in PIL/torchaudio on
a real cluster changes only `_decode_bytes`.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, sample_rate int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, "
    "feat array<float>, frames int"
)


def _decode_bytes(payload: bytes, kind: str, fake: bool):
    if not fake:
        raise NotImplementedError(
            "media decode needs PIL/av/torchaudio — not in this container; "
            "pass fake=True for the deterministic test decoder")
    # deterministic fake: 8 'pixels'/'samples' derived from the payload
    vals = []
    for i in range(8):
        chunk = payload[i::8][:4].ljust(4, b"\0")
        vals.append(struct.unpack("<I", chunk)[0] % 997 / 997.0)
    return vals


def media_features(kind_filter: str | None = None, fake: bool = True,
                   frame_stride: int = 2):
    """mapInPandas op: decode → feature-extract → (optionally) frame-sample.
    Returns the UDF for ``df.mapInPandas(fn, FEATURE_SCHEMA)``.

    Bookkeeping (kind filter, byte counts, id/kind columns) is columnar on
    the Arrow batch; only the decode itself — inherently per-item on an
    opaque binary payload — runs in a Python loop. Swapping in a real
    decoder (PIL/av/torchaudio) changes only ``_decode_bytes``."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if kind_filter is not None:
                pdf = pdf[pdf["kind"] == kind_filter]
            payloads = [bytes(p) if p is not None else b""
                        for p in pdf["payload"]]
            kinds = pdf["kind"].tolist()
            feats = []
            for payload, kind in zip(payloads, kinds):
                feat = _decode_bytes(payload, kind, fake)
                if kind == "video":
                    feat = feat[::frame_stride]  # frame sampling
                feats.append([float(x) for x in feat])
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "kind": kinds,
                "n_bytes": [len(p) for p in payloads],
                "feat": feats,
                "frames": [len(f) for f in feats],
            }, columns=["media_id", "kind", "n_bytes", "feat", "frames"])

    return fn


def synth_media_df(spark, n: int = 64):
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(((i * 131 + j * 17) % 251) for j in range(64))
        rows.append((i, kind, payload,
                     32 if kind == "image" else None,
                     32 if kind == "image" else None,
                     16000 if kind == "audio" else None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
