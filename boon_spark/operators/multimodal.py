"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (the image/audio libraries are
not in this container — see the build brief): ``decode_images`` raises
``NotImplementedError`` unless a decoder is injected.  Everything
Spark-side is real and tested — schemas, batch iteration, partition
behavior, UDF signatures — so dropping in a PIL/torchaudio kernel is a
one-line change on a real cluster.

Scale notes: ``mapInPandas`` streams Arrow batches (no per-row Python);
binary payloads never shuffle — decoding is a narrow map stage.  Batch
size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
size it so batch_rows × payload ≤ executor Python memory.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

# (doc_id, payload, metadata) — the canonical multimodal table shape
MULTIMODAL_DDL = ("doc_id string, payload binary, "
                  "meta struct<kind: string, width: int, height: int, "
                  "sample_rate: int, n_frames: int>")

IMAGE_FEATURES_DDL = ("doc_id string, width int, height int, "
                      "channels int, features array<float>")


def deterministic_fake_decoder(payload: bytes) -> dict:
    """Test stand-in for a real image decoder: derives 'pixels' from the
    payload bytes deterministically.  Shape-compatible with a real kernel
    (returns width/height/channels + a fixed-length feature vector)."""
    if payload is None or len(payload) < 4:
        return {"width": 0, "height": 0, "channels": 0,
                "features": [0.0] * 8}
    w = payload[0] + 1
    h = payload[1] + 1
    feats = [(payload[i % len(payload)] / 255.0) for i in range(8)]
    return {"width": int(w), "height": int(h), "channels": 3,
            "features": feats}


def decode_images(df: DataFrame, *, payload_col: str = "payload",
                  id_col: str = "doc_id",
                  decoder: Optional[Callable[[bytes], dict]] = None
                  ) -> DataFrame:
    """Decode + feature-extract an image payload column via mapInPandas.

    ``decoder(payload_bytes) -> {width, height, channels, features}``.
    Without an injected decoder this raises NotImplementedError at plan
    execution (the container has no image libraries)."""
    dec = decoder

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if dec is None:
            raise NotImplementedError(
                "no image decoder available in this environment; inject "
                "one via decode_images(..., decoder=fn) — e.g. a "
                "PIL-based kernel on a real cluster")
        for pdf in it:
            out = pdf[payload_col].map(dec)
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": out.map(lambda d: d["width"]).astype("int32"),
                "height": out.map(lambda d: d["height"]).astype("int32"),
                "channels": out.map(lambda d: d["channels"]).astype("int32"),
                "features": out.map(lambda d: d["features"]),
            })

    return df.mapInPandas(batches, IMAGE_FEATURES_DDL)


def sample_frames(df: DataFrame, *, every_n: int = 10,
                  id_col: str = "doc_id",
                  payload_col: str = "payload") -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame index, payload slicing stubbed to byte windows (a real
    kernel would demux).  Demonstrates the 1→N mapInPandas shape.

    The 1→N explosion is vectorized (numpy repeat/arange over the whole
    Arrow batch — no pandas ``iterrows``); only the stub byte-window
    slice touches Python objects, once per OUTPUT row, which is the
    floor for a per-frame kernel."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col].map(lambda p: p or b"").to_numpy()
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                               count=len(payloads))
            n_frames = np.maximum(lens // 16, 1)
            n_samples = -(-n_frames // every_n)  # ceil: frames per row
            ids = np.repeat(pdf[id_col].to_numpy(), n_samples)
            frames = (np.concatenate(
                [np.arange(0, nf, every_n) for nf in n_frames])
                if len(n_frames) else np.array([], dtype=np.int64))
            rep_payloads = np.repeat(payloads, n_samples)
            chunks = [bytes(p[f * 16:(f + 1) * 16])
                      for p, f in zip(rep_payloads, frames)]
            # explicit dtypes: an EMPTY batch would otherwise infer
            # float64 for chunk and fail Arrow's binary conversion
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="object"),
                "frame": pd.Series(frames, dtype="int32"),
                "chunk": pd.Series(chunks, dtype="object")})

    return df.mapInPandas(batches, "doc_id string, frame int, chunk binary")
