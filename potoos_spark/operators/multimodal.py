"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so each partition streams record batches without
row-at-a-time Python. The decode step itself is STUBBED (no image/audio
libraries in this environment): ``decode_features(..., fake=True)``
produces deterministic per-payload features so the Spark-side plumbing
— schema, batching, partition behavior — is real and testable, while
``fake=False`` raises NotImplementedError where a codec would plug in.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len bigint, checksum string, mode_guess string, "
    "mean_byte double, frames bigint"
)


def attach_binary(
    df: DataFrame, source_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Wrap a source column as an opaque binary payload with typed
    metadata — the shape a real image/audio table would have:
    (id, payload binary, meta struct<byte_len, checksum, mime>)."""
    payload = F.col(source_col).cast("binary")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.octet_length(F.col(source_col)).cast("bigint").alias("byte_len"),
            F.md5(payload).alias("checksum"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def decode_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode payloads → per-item features via mapInPandas.

    With ``fake=True`` (the only mode available here), features are
    deterministic functions of the raw bytes (length, checksum, mean
    byte value, a fake frame count) standing in for real
    decode/resize/frame-sample output. A production build replaces the
    kernel body with PIL/libav calls — the Spark plumbing (Arrow
    batches, schema, partitioning) is identical.
    """
    if not fake:
        raise NotImplementedError(
            "real decoders (PIL/av) are not available in this environment; "
            "use fake=True for the deterministic stub"
        )

    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "mode_guess": payloads.map(
                        lambda b: "binary" if any(c > 127 for c in bytes(b)) else "ascii"
                    ),
                    "mean_byte": payloads.map(
                        lambda b: float(sum(bytes(b))) / max(len(b), 1)
                    ),
                    "frames": payloads.map(lambda b: max(1, len(b) // 64)).astype(
                        "int64"
                    ),
                }
            )
            yield out

    return df.select("doc_id", "payload").mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame,
    k: int = 5,
    frame_chars: int = 64,
    frame_ms: int = 250,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Uniform frame sampling plumbing (the video analogue of the decode
    stub): treat each payload as ``n_frames = max(len/frame_chars, 1)``
    fixed-size frames and pick ``k`` uniformly spaced indices
    ``idx_j = floor(j * n_frames / k)`` — the standard strided sampler a
    real video pipeline uses before per-frame decode. Each sampled frame
    carries its timestamp and an md5 signature of the frame's slice
    (standing in for decoded pixels; a codec swaps into the signature
    step only).

    In-row ``sequence → transform → array_distinct → explode``: the
    fan-out is exactly ≤ k rows per document, no shuffle, no Python.

    Output: (id_col, frame_idx, frame_ts_ms, frame_sig).
    """
    t = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        t.alias("__t"),
        F.greatest(
            F.floor(F.length(t) / int(frame_chars)).cast("bigint"), F.lit(1)
        ).alias("__nf"),
    )
    idxs = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.lit(int(k) - 1)),
            lambda j: F.floor(j * F.col("__nf") / int(k)).cast("bigint"),
        )
    )
    e = staged.select(
        F.col(id_col), "__t", F.explode(idxs).alias("frame_idx")
    )
    return e.select(
        F.col(id_col),
        "frame_idx",
        (F.col("frame_idx") * int(frame_ms)).alias("frame_ts_ms"),
        F.md5(
            F.substring(
                F.col("__t"),
                (F.col("frame_idx") * int(frame_chars) + 1).cast("int"),
                int(frame_chars),
            )
        ).alias("frame_sig"),
    )
