"""Pluggable multimodal decode-kernel interface (VERDICT r2 item 3):
a user-supplied per-payload function and a batch-level kernel both run
through the same Arrow ``mapInPandas`` plumbing; the old
NotImplementedError path is gone."""

from __future__ import annotations

from pyspark.sql import functions as F

from potoos_spark.operators.multimodal import (
    attach_binary,
    byte_histogram,
    decode_features,
)
from tests.conftest import SF_DIR


def _payloads(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    return attach_binary(docs)


def test_default_kernel_runs(spark):
    out = decode_features(_payloads(spark)).collect()
    assert len(out) == 50
    assert all(r["byte_len"] >= 0 and len(r["checksum"]) == 32 for r in out)


def test_user_payload_fn_plugs_in(spark):
    def my_decoder(b: bytes) -> dict:
        return {"n_vowels": sum(b.count(v) for v in b"aeiou"), "first": int(b[0]) if b else -1}

    out = decode_features(
        _payloads(spark),
        payload_fn=my_decoder,
        schema="doc_id bigint, n_vowels bigint, first bigint",
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    texts = {
        r["doc_id"]: r["text"]
        for r in _payloads(spark).sparkSession.read.parquet(
            f"{SF_DIR}/documents.parquet"
        ).limit(50).collect()
    }
    assert len(rows) == 50
    for i, t in texts.items():
        b = t.encode()
        assert rows[i]["n_vowels"] == sum(b.count(v) for v in b"aeiou")
        assert rows[i]["first"] == (b[0] if b else -1)


def test_byte_histogram_counts_match_python(spark):
    pay = _payloads(spark)
    got = {}
    for r in byte_histogram(pay).collect():
        got.setdefault(r["doc_id"], {})[r["bin"]] = r["cnt"]
    texts = {
        r["doc_id"]: r["text"]
        for r in pay.sparkSession.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(50)
        .collect()
    }
    for i, t in texts.items():
        want = {}
        for c in t.encode():
            want[c >> 4] = want.get(c >> 4, 0) + 1
        assert got.get(i, {}) == want


def test_empty_payload_yields_no_histogram_rows(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "ok")], "doc_id bigint, text string"
    )
    out = byte_histogram(attach_binary(df)).collect()
    assert {r["doc_id"] for r in out} == {2}


def test_dhash_bit_packing_and_sign_convention(spark):
    """Hand-computed dHash: a 2-byte payload places anchor 0..63 on
    byte 0 and anchor 64 on byte 1, so only bit 63 can set — 'ba'
    yields exactly the sign bit (−2⁶³ as signed bigint), 'ab' yields
    0, and an empty payload yields no row."""
    from potoos_spark.operators.multimodal import attach_binary, dhash_features

    df = spark.createDataFrame(
        [(1, "ba"), (2, "ab"), (3, "")], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r["dhash"] for r in dhash_features(attach_binary(df)).collect()}
    assert got[1] == -(1 << 63)
    assert got[2] == 0
    assert 3 not in got


def test_pcm_energy_windows_silence_partial_and_odd_byte(spark):
    """Crafted payloads: an all-zero payload is silence in every
    window; a loud square wave is not; a trailing partial window
    reports its true sample count; a trailing odd byte is dropped
    (not half a sample)."""
    from potoos_spark.operators.multimodal import pcm_energy_windows

    loud = (b"\x00\x40" * 40)  # 40 samples of +16384, 2 windows (32+8)
    silent = b"\x00\x00" * 33  # 33 zero samples + ...
    odd = b"\x01\x00" * 3 + b"\x7f"  # 3 samples of +1, trailing odd byte
    df = spark.createDataFrame(
        [(1, bytearray(loud)), (2, bytearray(silent)), (3, bytearray(odd))],
        "doc_id bigint, payload binary",
    )
    rows = {(r["doc_id"], r["win"]): r for r in pcm_energy_windows(df).collect()}
    assert rows[(1, 0)]["n_samples"] == 32
    assert rows[(1, 0)]["energy_sq"] == 32 * 16384 * 16384
    assert rows[(1, 0)]["is_silence"] == 0
    assert rows[(1, 1)]["n_samples"] == 8  # trailing partial window
    assert rows[(2, 0)]["energy_sq"] == 0 and rows[(2, 0)]["is_silence"] == 1
    assert rows[(2, 1)]["n_samples"] == 1 and rows[(2, 1)]["is_silence"] == 1
    assert rows[(3, 0)]["n_samples"] == 3  # odd byte dropped
    assert rows[(3, 0)]["energy_sq"] == 3
    assert rows[(3, 0)]["is_silence"] == 1


def test_documents_fixture_is_ascii(spark):
    """ADVICE r5: the byte-level multimodal oracles (_MM_PCM_SQL,
    _MM_DHASH_SQL, _MM_BYTE_HISTOGRAM_SQL in catalog/pipeline.py) walk
    CHAR positions with ord()/length(), which equals the Spark side's
    BYTE walk only when every document is pure ASCII. Turn that
    invariant from a comment into a checked gate: octet length ==
    codepoint length for every row at both the test and oracle SF."""
    from tests.conftest import SF_ORACLE_DIR

    for d in {SF_DIR, SF_ORACLE_DIR}:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        non_ascii = docs.filter(
            F.octet_length("text") != F.length("text")
        ).count()
        assert non_ascii == 0, (
            f"{d}: {non_ascii} non-ASCII documents break the byte-level "
            "multimodal oracle equivalence"
        )


def test_dhash_hamming_pairs_planted_recall_and_radius(spark):
    """r7 banded-Hamming pairs over dHash: byte-identical payloads pair
    at hamming 0, a payload differing in exactly the bytes behind a few
    anchor comparisons pairs within the radius, and an unrelated
    payload is excluded — the pigeonhole guarantee (recall 1.0 within
    max_hamming) on planted data."""
    from potoos_spark.operators.multimodal import (
        attach_binary,
        dhash_features,
        dhash_hamming_pairs,
    )

    base = "".join(chr(65 + (i * 7) % 26) for i in range(200))
    # flip a contiguous run of bytes -> a handful of anchor comparisons
    near = base[:50] + "zzzz" + base[54:]
    far = "".join(chr(90 - (i * 11) % 26) for i in range(200))
    rows = [(1, base), (2, base), (3, near), (4, far)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    b = attach_binary(docs)
    ham = {
        r["doc_id"]: r["dhash"] for r in dhash_features(b).collect()
    }
    true_13 = bin((ham[1] ^ ham[3]) & ((1 << 64) - 1)).count("1")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_hamming_pairs(b, max_hamming=7).collect()
    }
    assert got[(1, 2)] == 0  # identical payloads
    if true_13 <= 7:
        assert got[(1, 3)] == true_13  # within radius -> found exactly
    assert not any(4 in p for p in got)  # far payload excluded


def test_vad_segments_islands(spark):
    """Hand-built energy frame: voiced wins {0,1,2, 5, 7,8} form
    segments [0-2], [5-5], [7-8] with exact integer energy sums."""
    from potoos_spark.operators.multimodal import vad_segments

    rows = [
        (1, 0, 32, 5000, 0), (1, 1, 32, 6000, 0), (1, 2, 32, 7000, 0),
        (1, 3, 32, 10, 1), (1, 4, 32, 10, 1),
        (1, 5, 32, 9000, 0), (1, 6, 32, 10, 1),
        (1, 7, 32, 4000, 0), (1, 8, 16, 3000, 0),
    ]
    e = spark.createDataFrame(
        rows, "doc_id bigint, win bigint, n_samples bigint, energy_sq bigint, is_silence bigint"
    )
    got = sorted(
        (r.start_win, r.end_win, r.n_windows, r.total_energy_sq)
        for r in vad_segments(e).collect()
    )
    assert got == [(0, 2, 3, 18000), (5, 5, 1, 9000), (7, 8, 2, 7000)]


def test_phash_brightness_invariance_and_determinism(spark):
    """A uniform +c on every byte moves ONLY the DC coefficient (DCT
    linearity), so the pHash — AC bits vs AC median — is identical;
    and the integer pipeline is partitioning-invariant."""
    from potoos_spark.operators.multimodal import phash64

    base = bytes([(i * 7) % 100 + 30 for i in range(256)])
    brighter = bytes(b + 50 for b in base)
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(brighter))],
        "doc_id bigint, payload binary",
    )
    got = {r.doc_id: (r.w_hi, r.w_lo, r.n_ac_above) for r in phash64(df).collect()}
    assert got[1] == got[2]
    again = {
        r.doc_id: (r.w_hi, r.w_lo, r.n_ac_above)
        for r in phash64(df.repartition(5)).collect()
    }
    assert got == again
    # DC bit is always 0: bit 0 of w_lo clear
    assert got[1][1] % 2 == 0


def test_bmp_ppm_codecs_round_trip_and_reject_unsupported():
    """r9: the pure-numpy BMP/PPM codecs must round-trip arbitrary RGB
    matrices (including widths whose BMP rows need padding) and fail
    loudly on unsupported containers rather than mis-decode."""
    import numpy as np
    import pytest

    from potoos_spark.operators.multimodal import (
        decode_bmp24,
        decode_image,
        decode_ppm6,
        encode_bmp24,
        encode_ppm6,
    )

    rng = np.random.default_rng(20260816)
    for h, w in [(8, 9), (1, 1), (5, 7), (16, 16), (3, 254)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_bmp24(encode_bmp24(px)) == px).all()
        assert (decode_ppm6(encode_ppm6(px)) == px).all()
        assert (decode_image(encode_bmp24(px)) == px).all()
    with pytest.raises(ValueError):
        decode_image(b"GIF89a not supported")
    with pytest.raises(ValueError):
        decode_bmp24(b"BM" + b"\x00" * 60)  # bpp 0 -> unsupported
    # PPM header comments and whitespace runs
    px = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    hdr = b"P6\n# a comment\n 3  2 \n# another\n255\n"
    assert (decode_ppm6(hdr + px.tobytes()) == px).all()


def test_image_dhash_real_decode_pairs_and_negative(spark, tmp_path):
    """The decode path's planted-pair gate: the SAME pixels through two
    different containers (BMP and PPM) must land on the same dhash,
    while a visibly different image must not. Input goes file ->
    read_binary_dir -> container parse -> luma -> hash; pixels are
    never synthesized past the codec."""
    import numpy as np

    from potoos_spark.operators.multimodal import (
        encode_bmp24,
        encode_ppm6,
        image_dhash_features,
    )
    from potoos_spark.operators.sources import read_binary_dir

    rng = np.random.default_rng(99)
    px = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    other = px.copy()
    other[::2] = 255 - other[::2]  # strong alternating-row inversion
    (tmp_path / "img10.bmp").write_bytes(encode_bmp24(px))
    (tmp_path / "img11.ppm").write_bytes(encode_ppm6(px))
    (tmp_path / "img20.bmp").write_bytes(encode_bmp24(other))
    got = {
        r["doc_id"]: r
        for r in image_dhash_features(
            read_binary_dir(spark, str(tmp_path))
        ).collect()
    }
    assert set(got) == {10, 11, 20}
    assert all(r["height"] == 32 and r["width"] == 48 for r in got.values())
    assert got[10]["dhash"] == got[11]["dhash"]  # same pixels, 2 containers
    assert got[10]["dhash"] != got[20]["dhash"]  # different image


def test_render_neardup_corpus_cluster_geometry(tmp_path):
    """Every rendered cluster honors the Hamming contract the catalog
    entry's non-vacuousness rests on: base-vs-A and base-vs-B differ in
    at most one dHash bit each (single-pixel perturbations at (0,0) and
    (7,8) feed bits 0 and 63 only), A-vs-B in at most two — all inside
    the default radius 7."""
    from potoos_spark.operators.multimodal import (
        decode_image,
        gray_luma,
        pixel_dhash,
        render_neardup_corpus,
    )

    out = render_neardup_corpus([3, 17], str(tmp_path))
    import os

    def dh(name):
        with open(os.path.join(out, name), "rb") as f:
            return pixel_dhash(gray_luma(decode_image(f.read())))

    for i in (3, 17):
        base = dh(f"img{i * 10}.bmp")
        pa = dh(f"img{i * 10 + 1}.ppm")
        pb = dh(f"img{i * 10 + 2}.bmp")
        ham = lambda x, y: bin((x ^ y) & ((1 << 64) - 1)).count("1")
        assert ham(base, pa) <= 1
        assert ham(base, pb) <= 1
        assert ham(pa, pb) <= 2


def test_pixel_neardup_catalog_recall_is_total(spark):
    """The r10 headline entry end-to-end on the sf0.001 fixture: the
    real file -> decode -> pixel-dHash -> banded-Hamming pipeline must
    recover EVERY planted intra-cluster pair (found = 1 on all truth
    rows) — the engine-side half of the driver-gated recall entry."""
    from potoos_spark.catalog.pipeline import (
        _mm_pixel_neardup_fn,
        _mm_pixel_recall_fn,
    )

    rec = _mm_pixel_recall_fn(spark, SF_DIR).collect()
    assert len(rec) > 0 and len(rec) % 3 == 0
    assert all(r["found"] == 1 for r in rec)
    pairs = _mm_pixel_neardup_fn(spark, SF_DIR)
    assert pairs.filter(F.col("hamming") > 7).count() == 0
