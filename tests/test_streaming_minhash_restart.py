"""Checkpoint-restart + late-arrival proof for the streaming
MinHash-LSH near-dup guard (VERDICT r8 item 5), following the
test_streaming_reorder_restart.py pattern: the stateful operator is the
watermarked per-doc alert dedup, so the decisive geometries are

* a re-delivered already-alerted doc arriving in a NEW query (resumed
  from the checkpoint) must NOT re-alert — the alert state survives the
  restart;
* a LATE but within-watermark near-dup arriving only after the restart
  must still alert exactly once;
* novel docs (no band collision with the index) never alert, before or
  after the restart.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from potoos_spark.operators.dedup import (
    lsh_band_index,
    streaming_minhash_neardup_alerts,
)

SCHEMA = "doc_id bigint, text string, ts_ms bigint"
BASE = 1_700_000_000_000

# Index corpus: two distinctive documents. Arriving near-copies share
# their full shingle sets (identical normalized text -> identical
# signature -> all 6 bands collide); novel docs share no shingles.
IDX_TEXTS = [
    "the quick brown fox jumps over the lazy dog tonight",
    "pack my box with five dozen liquor jugs before noon",
]
NOVEL = "completely unrelated content about spark structured streaming"


def _write(spark, rows, src):
    spark.createDataFrame(rows, SCHEMA).repartition(1).write.mode(
        "append"
    ).parquet(str(src))
    time.sleep(1.1)  # distinct file mtimes -> stable maxFilesPerTrigger order


def _run(spark, index, src, ckpt, out):
    sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ingest_time", F.timestamp_millis(F.col("ts_ms")))
    )
    q = (
        streaming_minhash_neardup_alerts(sdf, index, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", str(out))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)


def test_minhash_alerts_through_restart_with_late_and_redelivered(
    spark, tmp_path
):
    idx_df = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(IDX_TEXTS)],
        "doc_id bigint, text string",
    )
    index = lsh_band_index(idx_df).persist()
    src, ckpt, out = tmp_path / "src", tmp_path / "ckpt", tmp_path / "out"

    # run 1: doc 1 (near-dup of IDX_TEXTS[0], alerts) and doc 2 (novel,
    # no alert); max event time BASE+600s
    _write(
        spark,
        [
            (1, IDX_TEXTS[0], BASE + 10_000),
            (2, NOVEL, BASE + 600_000),
        ],
        src,
    )
    _run(spark, index, src, ckpt, out)
    got1 = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert got1 == {1}

    # run 2 (restarted from the checkpoint):
    #  * doc 1 is RE-DELIVERED (at-least-once source) — state must
    #    suppress the duplicate alert;
    #  * doc 3 arrives LATE (event time BASE+20s, well before the seen
    #    max but within the 1h watermark) and near-duplicates
    #    IDX_TEXTS[1] — must alert exactly once;
    #  * then a far tail advances the watermark past everything.
    _write(
        spark,
        [
            (1, IDX_TEXTS[0], BASE + 15_000),
            (3, IDX_TEXTS[1] + " extra tail words here", BASE + 20_000),
        ],
        src,
    )
    _write(spark, [(4, NOVEL, BASE + 90_000_000)], src)
    _run(spark, index, src, ckpt, out)

    rows = spark.read.parquet(str(out)).collect()
    ids = sorted(r["doc_id"] for r in rows)
    # doc 1 exactly once (no re-alert), doc 3 alerted late, novel docs
    # 2 and 4 never alert
    assert ids == [1, 3], rows
    index.unpersist()


def test_minhash_partial_shingle_overlap_alerts(spark, tmp_path):
    """A doc sharing only a prefix with an index doc still collides in
    at least one band when enough shingles survive — and a doc sharing
    a couple of words (but no 3-shingle) does not. Pins that the guard
    alerts on LSH-candidate semantics, not exact-text equality."""
    idx_df = spark.createDataFrame(
        [(200, IDX_TEXTS[0])], "doc_id bigint, text string"
    )
    index = lsh_band_index(idx_df).persist()
    src, ckpt, out = tmp_path / "s2", tmp_path / "c2", tmp_path / "o2"

    _write(
        spark,
        [
            # identical token stream -> identical signature -> alert
            (11, "The QUICK brown fox... jumps over the lazy dog tonight!", BASE),
            # two shared words, zero shared 3-shingles -> no alert
            (12, "brown dog sleeps all day long", BASE + 1_000),
        ],
        src,
    )
    _run(spark, index, src, ckpt, out)
    got = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert got == {11}
    index.unpersist()
