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
