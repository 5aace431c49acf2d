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
