"""Source surface: every format lands in the identical canonical frame."""

from __future__ import annotations

import pytest

from potoos_spark.operators.sources import read_batch, read_stream, write_batch


@pytest.fixture(scope="module")
def sample(spark):
    rows = [("a", 1000 + i, float(i), i) for i in range(50)]
    return spark.createDataFrame(rows, "k string, t bigint, v double, s bigint")


def _expected(spark, sample):
    return sorted(
        (r["k"], r["t"], r["v"], r["s"]) for r in sample.collect()
    )


def test_csv_json_parquet_agree(spark, sample, tmp_path):
    want = _expected(spark, sample)
    for fmt in ("parquet", "csv", "json"):
        p = str(tmp_path / fmt)
        sample.write.format(fmt).option("header", "true").save(p)
        df = read_batch(
            spark, p, fmt, series_key="k", ts="t", value="v", seq="s",
            schema="k string, t bigint, v double, s bigint",
        )
        assert df.columns == ["series_key", "ts_ms", "value", "seq"]
        got = sorted(tuple(r) for r in df.collect())
        assert got == want, fmt


def test_stream_source_matches_batch(spark, sample, tmp_path):
    p = str(tmp_path / "sdir")
    sample.write.parquet(p)
    sdf = read_stream(
        spark, p, "k string, t bigint, v double, s bigint",
        series_key="k", ts="t", value="v", seq="s",
    )
    assert sdf.isStreaming
    q = (
        sdf.writeStream.format("memory")
        .queryName("src_replay")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=60)
    got = sorted(tuple(r) for r in spark.table("src_replay").collect())
    assert got == _expected(spark, sample)


def test_decode_json_payloads_stream(spark, sample, tmp_path):
    """Kafka-wire-shaped decode: (key, value-binary) rows -> canonical
    frame, exercised through a broker-less file stream."""
    import json

    from pyspark.sql import functions as F

    from potoos_spark.operators.sources import decode_json_payloads

    rows = [tuple(x) for x in sample.collect()]
    payloads = [
        (
            str(i),
            json.dumps(
                {"series_key": k, "ts_ms": t, "value": v, "seq": s}
            ).encode(),
        )
        for i, (k, t, v, s) in enumerate(rows)
    ]
    src = str(tmp_path / "wire")
    spark.createDataFrame(payloads, "key string, value binary").write.parquet(src)
    sdf = decode_json_payloads(
        spark.readStream.schema("key string, value binary").parquet(src)
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("wire_decode")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=60)
    got = sorted(tuple(r) for r in spark.table("wire_decode").collect())
    assert got == _expected(spark, sample)


def test_write_batch_roundtrip(spark, sample, tmp_path):
    from potoos_spark.operators.retrieval import series_frame

    frame = series_frame(sample, "k", "t", "v", seq="s")
    p = str(tmp_path / "sink")
    write_batch(frame, p)
    back = spark.read.parquet(p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, frame.collect()))


def test_read_binary_dir_feeds_multimodal_tier(spark, tmp_path):
    """r8: the production media entry point — a directory of opaque
    binary files lands in the multimodal canonical shape (filename
    digit run as doc_id, exact byte_len/checksum meta) and flows
    straight through dhash_features."""
    import hashlib

    from potoos_spark.operators.multimodal import dhash_features
    from potoos_spark.operators.sources import read_binary_dir

    payloads = {
        7: bytes(range(200)) * 3,
        42: b"some ascii-ish payload " * 40,
    }
    for i, b in payloads.items():
        (tmp_path / f"img_{i:04d}.bin").write_bytes(b)
    got = {r["doc_id"]: r for r in read_binary_dir(spark, str(tmp_path)).collect()}
    assert set(got) == set(payloads)
    for i, b in payloads.items():
        assert bytes(got[i]["payload"]) == b
        assert got[i]["meta"]["byte_len"] == len(b)
        assert got[i]["meta"]["checksum"] == hashlib.md5(b).hexdigest()
    hashes = dhash_features(read_binary_dir(spark, str(tmp_path))).collect()
    assert {r["doc_id"] for r in hashes} == set(payloads)
    assert all(isinstance(r["dhash"], int) for r in hashes)


def test_read_binary_dir_hash_ids_are_read_stable(spark, tmp_path):
    """Digit-less filenames fall back to a path hash that must be
    identical across reads (no partitioning-dependent ids)."""
    from potoos_spark.operators.sources import read_binary_dir

    (tmp_path / "noid.bin").write_bytes(b"x" * 64)
    a = read_binary_dir(spark, str(tmp_path)).collect()[0]["doc_id"]
    b = read_binary_dir(spark, str(tmp_path)).collect()[0]["doc_id"]
    assert a == b and a >= 0


def test_read_binary_dir_assert_unique_ids(spark, tmp_path):
    """ADVICE r8: digit-run ids collide across subdirectories or
    multi-counter names (a.1.bin vs b.1.bin). The opt-in uniqueness
    guard must raise on a planted collision and pass clean layouts."""
    import pytest

    from potoos_spark.operators.sources import read_binary_dir

    (tmp_path / "a.1.bin").write_bytes(b"first" * 10)
    (tmp_path / "b.1.bin").write_bytes(b"second" * 10)
    with pytest.raises(Exception, match="duplicate doc_id"):
        read_binary_dir(
            spark, str(tmp_path), assert_unique_ids=True
        ).collect()
    (tmp_path / "b.1.bin").unlink()
    (tmp_path / "b.2.bin").write_bytes(b"second" * 10)
    got = read_binary_dir(
        spark, str(tmp_path), assert_unique_ids=True
    ).collect()
    assert {r["doc_id"] for r in got} == {1, 2}


def test_read_binary_dir_hash_ids_nonnegative_mask(spark, tmp_path):
    """The hash fallback is xxhash64 & Long.MAX_VALUE — a true 63-bit
    mask (abs() kept Long.MIN_VALUE negative). All ids in a wide sample
    of digit-less names must be non-negative and distinct."""
    from potoos_spark.operators.sources import read_binary_dir

    names = [f"f{chr(97 + i)}{chr(97 + j)}.bin" for i in range(6) for j in range(6)]
    for nm in names:
        (tmp_path / nm).write_bytes(nm.encode())
    ids = [
        r["doc_id"]
        for r in read_binary_dir(spark, str(tmp_path)).collect()
    ]
    assert len(ids) == len(names) == len(set(ids))
    assert all(i >= 0 for i in ids)


def test_read_write_batch_orc_round_trip(spark, tmp_path):
    """ORC joins the exercised batch formats: write_batch -> read_batch
    must reproduce the canonical series frame exactly."""
    from potoos_spark.operators.sources import read_batch, write_batch

    rows = [("a", 1_000, 1.5, 0), ("a", 2_000, 2.5, 1), ("b", 1_500, -1.0, 2)]
    df = spark.createDataFrame(
        rows, "series_key string, ts_ms bigint, value double, seq bigint"
    )
    dst = str(tmp_path / "orc_series")
    write_batch(df, dst, fmt="orc")
    got = sorted(
        tuple(r)
        for r in read_batch(spark, dst, fmt="orc", seq="seq").collect()
    )
    assert got == sorted(rows)
