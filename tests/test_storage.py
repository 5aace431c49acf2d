"""The bucketed series store must deliver its scale promises locally:
round-trip fidelity, partition pruning on date, and shuffle-free
groupBy/join on the bucketed series_key."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from potoos_spark.operators.retrieval import events_series
from potoos_spark.operators.storage import read_series_store, write_series_store
from tests.conftest import SF_DIR


def _plan(df, mode="simple") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("series_store")
    series = events_series(spark, SF_DIR).select("series_key", "ts_ms", "value", "seq")
    write_series_store(series, "series_store_t", n_buckets=8, path=str(path / "t"))
    yield "series_store_t"
    spark.sql("DROP TABLE IF EXISTS series_store_t")


def test_round_trip(spark, store):
    orig = events_series(spark, SF_DIR).select("series_key", "ts_ms", "value", "seq")
    back = read_series_store(spark, store)
    assert back.count() == orig.count()
    a = sorted(map(tuple, orig.collect()))
    b = sorted(map(tuple, back.select("series_key", "ts_ms", "value", "seq").collect()))
    assert a == b


def test_time_bounds_prune_partitions(spark, store):
    lo, hi = 1_704_412_800_000, 1_704_499_199_999  # one day
    df = read_series_store(spark, store, from_ms=lo, to_ms=hi)
    plan = _plan(df, "formatted")
    # the date bounds must appear as partition filters, not data filters
    part = "".join(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "date" in part, plan
    rows = df.collect()
    assert rows and all(lo <= r["ts_ms"] <= hi for r in rows)


def test_groupby_series_key_is_shuffle_free(spark, store):
    df = spark.table(store).groupBy("series_key").agg(F.count("*").alias("n"))
    assert "Exchange" not in _plan(df), _plan(df)


def test_self_join_on_series_key_is_shuffle_free(spark, store):
    t = spark.table(store)
    a = t.groupBy("series_key").agg(F.max("value").alias("mx"))
    b = t.groupBy("series_key").agg(F.min("value").alias("mn"))
    joined = a.join(b, "series_key")
    assert "Exchange" not in _plan(joined), _plan(joined)


def test_compact_parquet_rewrites_row_exact_and_reduces_files(spark, tmp_path):
    import os

    from potoos_spark.operators.storage import compact_parquet

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    rows = [("s%d" % (i % 3), 1000 * i, float(i)) for i in range(3000)]
    df = spark.createDataFrame(rows, "series_key string, ts_ms bigint, value double")
    # fragment: 60 tiny files (micro-batch-style output)
    df.repartition(60).write.parquet(src)
    n_src_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src_files >= 50

    n = compact_parquet(spark, src, dst, target_files=4)
    assert n == 3000
    n_dst_files = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_dst_files <= 8  # range partitions, far fewer files
    # row-exact rewrite
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert a == b
    # within-file contiguity: each file's (series_key, ts) range is sorted
    one = sorted(os.path.join(dst, f) for f in os.listdir(dst) if f.endswith(".parquet"))[0]
    part = spark.read.parquet(one).collect()
    keys = [(r.series_key, r.ts_ms) for r in part]
    assert keys == sorted(keys)


def test_zorder_key_gives_both_dims_locality(spark):
    """The z-order clustering property, measured: cutting the Morton
    keyspace into 64 buckets must give BOTH dimensions narrow per-bucket
    spans (each top bucket fixes 3 high bits of each dim → span ≤ 2^11
    per dim at 14 bits), while bucketing by one raw column leaves the
    OTHER dimension at ~full range. Also pins the interleave itself on
    hand values."""
    from pyspark.sql import functions as F

    from potoos_spark.operators.storage import zorder_key

    # hand-pinned interleave: a=0b101 (bits 0,2), b=0b011 (bits 0,1)
    # z bits: a0->0, b0->1, a1->2(0), b1->3, a2->4 ... = 1+2+8+16 = 27
    df1 = spark.createDataFrame([(5, 3)], "a long, b long")
    assert df1.select(zorder_key("a", "b", bits=3).alias("z")).collect()[0]["z"] == 27

    bits = 11  # fixture partkey range is 0..1999 ~ 2^11
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        F.pmod("l_partkey", F.lit(1 << bits)).cast("bigint").alias("pk"),
        F.pmod("l_orderkey", F.lit(1 << bits)).cast("bigint").alias("sk"),
    )
    z = li.withColumn(
        "bucket", F.shiftrightunsigned(zorder_key("pk", "sk", bits=bits), 2 * bits - 6)
    )
    zstats = z.groupBy("bucket").agg(
        (F.max("pk") - F.min("pk")).alias("pk_span"),
        (F.max("sk") - F.min("sk")).alias("sk_span"),
    ).collect()
    # every z bucket fixes 3 top bits of EACH dim -> span <= 2^8 per dim
    assert all(r["pk_span"] < (1 << 8) and r["sk_span"] < (1 << 8) for r in zstats)

    # contrast: bucket by pk alone -> sk spans stay ~full range
    lin = li.withColumn("bucket", F.shiftrightunsigned(F.col("pk"), bits - 6))
    lstats = lin.groupBy("bucket").agg(
        (F.max("sk") - F.min("sk")).alias("sk_span")
    ).collect()
    avg_sk = sum(r["sk_span"] for r in lstats) / len(lstats)
    assert avg_sk > (1 << 10), avg_sk  # other dim keeps ~full range


def test_zorder_compact_prunes_second_dimension(spark, tmp_path):
    """VERDICT r5 item 7: the storage-side z-order consumer. Rewrite
    lineitem two ways — sorted by l_partkey alone vs z-order compacted
    on (l_partkey, l_orderkey) — then check the parquet FOOTER stats a
    min/max-pruning reader would use: under a narrow predicate on the
    SECOND dimension (l_orderkey), the z layout must leave most row
    groups skippable while the single-dim sort leaves (nearly) all of
    them overlapping. Also asserts the rewrite is row-exact."""
    import glob as g

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from potoos_spark.operators.storage import zorder_compact

    src = f"{SF_DIR}/lineitem.parquet"
    n_src = spark.read.parquet(src).count()
    lo, hi = spark.read.parquet(src).agg(
        F.min("l_orderkey"), F.max("l_orderkey")
    ).collect()[0]
    q_lo = lo + (hi - lo) * 40 // 100
    q_hi = lo + (hi - lo) * 45 // 100  # a 5%-wide band on dim B

    z_dst = str(tmp_path / "z")
    a_dst = str(tmp_path / "a")
    n_z = zorder_compact(
        spark, src, z_dst, "l_partkey", "l_orderkey", bits=11, target_files=16
    )
    assert n_z == n_src  # row-exact rewrite
    (
        spark.read.parquet(src)
        .repartitionByRange(16, F.col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(a_dst)
    )

    def overlapping_row_groups(path):
        total, hit = 0, 0
        for f in g.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            ci = {
                md.row_group(0).column(i).path_in_schema: i
                for i in range(md.num_columns)
            }["l_orderkey"]
            for r in range(md.num_row_groups):
                st = md.row_group(r).column(ci).statistics
                total += 1
                if st.min <= q_hi and st.max >= q_lo:
                    hit += 1
        return total, hit

    tz, hz = overlapping_row_groups(z_dst)
    ta, ha = overlapping_row_groups(a_dst)
    assert tz >= 8 and ta >= 8  # both layouts actually split
    # single-dim sort: dim B at ~full range per file -> ~no skipping
    assert ha == ta, (ha, ta)
    # z layout: most row groups' l_orderkey ranges exclude the band
    assert hz <= tz // 2, (hz, tz)

    # and the data survives: band row-count identical across layouts
    band = lambda p: (
        spark.read.parquet(p)
        .filter((F.col("l_orderkey") >= q_lo) & (F.col("l_orderkey") <= q_hi))
        .count()
    )
    assert band(z_dst) == band(a_dst) == band(src)


def test_ivf_index_roundtrip_equals_in_memory_and_prunes(spark, tmp_path):
    """r6 IVF storage consumer: (1) the cell-partitioned layout is
    row-exact; (2) probing the stored index returns BIT-IDENTICAL
    results to the in-memory ivf_topk_md5 on the same corpus; (3) the
    probe's parquet scan carries a dynamic-partition-pruning filter on
    the cell column, so only probed cells' files are read."""
    from pyspark.sql import functions as F

    from potoos_spark.operators.similarity import ivf_topk_md5
    from potoos_spark.operators.storage import probe_ivf_index, write_ivf_index
    from tests.conftest import SF_DIR

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dst = str(tmp_path / "ivf")
    n = write_ivf_index(spark, e, dst, n_cells=8)
    assert n == e.count()

    q = e.filter(F.col("vec_id") < 5)
    got = probe_ivf_index(spark, dst, q, k=5, n_probe=2)
    want = ivf_topk_md5(q, e, k=5, n_cells=8, n_probe=2)
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and g  # bit-identical, non-empty

    plan = got._jdf.queryExecution().executedPlan().toString()
    # the INDEX scan must carry a dynamic-partition-pruning filter on
    # the cell partition column (scan Location strings are truncated
    # in plan text, so match the pruning expression itself)
    pruned = [
        l
        for l in plan.splitlines()
        if "FileScan" in l
        and "PartitionFilters: [" in l
        and "dynamicpruningexpression" in l
        and "cell" in l.split("PartitionFilters: [")[1]
    ]
    assert pruned, plan


def test_delete_rows_rewrites_only_affected_partitions(spark, tmp_path):
    """r6 targeted delete: tombstoned rows disappear, surviving rows in
    affected partitions are preserved exactly, and UNTOUCHED
    partitions' files are byte-identical (not rewritten — pinned by
    file path + mtime)."""
    import os
    import time

    from pyspark.sql import functions as F

    from potoos_spark.operators.storage import delete_rows

    rows = [
        # (id, v, date) — two partitions, deletes hit only 2024-01-01
        (1, 10.0, "2024-01-01"), (2, 20.0, "2024-01-01"), (3, 30.0, "2024-01-01"),
        (4, 40.0, "2024-01-02"), (5, 50.0, "2024-01-02"),
    ]
    df = spark.createDataFrame(rows, "id bigint, v double, date string")
    path = str(tmp_path / "store")
    df.write.partitionBy("date").parquet(path)

    def files(day):
        d = f"{path}/date={day}"
        return {
            f: os.path.getmtime(f"{d}/{f}")
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before_untouched = files("2024-01-02")
    time.sleep(1.1)  # mtime resolution guard

    ts = spark.createDataFrame([(1,), (3,)], "id bigint")
    delete_rows(path, spark, ts, key_cols=["id"])

    got = sorted(
        (r["id"], r["v"], str(r["date"]))  # partition col reads back as DATE
        for r in spark.read.parquet(path).collect()
    )
    assert got == [
        (2, 20.0, "2024-01-01"),
        (4, 40.0, "2024-01-02"),
        (5, 50.0, "2024-01-02"),
    ]
    assert files("2024-01-02") == before_untouched  # not rewritten


def test_delete_rows_drops_fully_emptied_partitions(spark, tmp_path):
    """r7 (VERDICT r6 item 6): deleting ALL rows of a partition must
    remove that partition's DIRECTORY — dynamic overwrite has nothing
    to write there, so without the explicit drop the stale files would
    silently resurrect the deleted rows. Untouched partitions stay
    byte-identical."""
    import os
    import time

    from potoos_spark.operators.storage import delete_rows

    rows = [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-02")]
    df = spark.createDataFrame(rows, "id bigint, date string")
    path = str(tmp_path / "store2")
    df.write.partitionBy("date").parquet(path)

    d2 = f"{path}/date=2024-01-02"
    before = {
        f: os.path.getmtime(f"{d2}/{f}")
        for f in os.listdir(d2)
        if f.endswith(".parquet")
    }
    time.sleep(1.1)
    delete_rows(path, spark, spark.createDataFrame([(1,)], "id bigint"), ["id"])
    left = {r["id"] for r in spark.read.parquet(path).collect()}
    assert left == {2, 3}  # the full-partition delete actually happened
    assert not os.path.exists(f"{path}/date=2024-01-01")  # dir gone
    after = {
        f: os.path.getmtime(f"{d2}/{f}")
        for f in os.listdir(d2)
        if f.endswith(".parquet")
    }
    assert after == before  # untouched partition not rewritten


def test_compact_partitions_merges_small_files_and_drops_dead_dirs(
    spark, tmp_path
):
    """r7 maintenance pass: a partition fragmented into many files is
    rewritten to ~1 file row-exactly, a healthy partition's files stay
    byte-identical, and a zero-live-row partition directory (aborted
    writer debris) is removed."""
    import os
    import time

    from potoos_spark.operators.storage import compact_partitions

    path = str(tmp_path / "store3")
    # fragmented partition: 5 appends of 1 row each
    for i in range(5):
        spark.createDataFrame(
            [(i, "2024-01-01")], "id bigint, date string"
        ).coalesce(1).write.mode("append").partitionBy("date").parquet(path)
    # healthy partition: one file
    spark.createDataFrame(
        [(10, "2024-01-02"), (11, "2024-01-02")], "id bigint, date string"
    ).coalesce(1).write.mode("append").partitionBy("date").parquet(path)
    # dead partition dir: a 0-row parquet write
    spark.createDataFrame([], "id bigint").write.parquet(
        f"{path}/date=2024-01-03"
    )

    def pq_files(day):
        d = f"{path}/date={day}"
        return {
            f: os.path.getmtime(f"{d}/{f}")
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    assert len(pq_files("2024-01-01")) == 5
    healthy_before = pq_files("2024-01-02")
    before_rows = sorted(
        (r["id"], str(r["date"])) for r in spark.read.parquet(path).collect()
    )
    time.sleep(1.1)

    res = compact_partitions(spark, path, "date", max_files_per_partition=1)
    assert res["rewritten"] == ["2024-01-01"]
    assert res["dropped"] == ["2024-01-03"]
    assert len(pq_files("2024-01-01")) == 1          # merged
    assert pq_files("2024-01-02") == healthy_before  # untouched
    assert not os.path.exists(f"{path}/date=2024-01-03")
    after_rows = sorted(
        (r["id"], str(r["date"])) for r in spark.read.parquet(path).collect()
    )
    assert after_rows == before_rows  # row-exact rewrite
