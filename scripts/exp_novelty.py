"""Round-4 experiment: shapes for ngram_novelty (2.1s headline query).

A: current — shingle explode feeds totals (groupBy id) and the
   first-owner chain (groupBy s -> groupBy owner); explode evaluated
   twice.
B: A + persist on the exploded shingle frame.
C: totals computed IN-ROW (size of the shingle array — no explode, no
   shuffle) + first-owner chain carrying the owner's total through the
   min-struct, so the explode subtree is consumed ONCE.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from potoos_spark.operators.curate import ngram_novelty
from potoos_spark.operators.dedup import shingle_frame
from potoos_spark.operators.text import shingles, tokens
from potoos_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    n = spark.sparkContext.defaultParallelism
    return d.repartition(n, "doc_id")


def variant_a(spark):
    return ngram_novelty(docs(spark))


def variant_b(spark):
    d = docs(spark)
    sh = shingle_frame(d, "text", "doc_id", 3).persist()
    totals = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    owned = (
        sh.groupBy("s")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_novel"))
    )
    j = totals.join(owned, "doc_id", "left")
    n_novel = F.coalesce("n_novel", F.lit(0)).cast("bigint")
    return j.select(
        "doc_id", "n_shingles", n_novel.alias("n_novel"),
        (n_novel.cast("double") / F.col("n_shingles").cast("double")).alias("novelty"),
    )


def variant_c(spark):
    d = docs(spark)
    totals = d.select(
        "doc_id",
        F.size(shingles(tokens("text"), 3)).cast("bigint").alias("n_shingles"),
    ).filter(F.col("n_shingles") > 0)
    sh = shingle_frame(d, "text", "doc_id", 3)
    owned = (
        sh.groupBy("s")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_novel"))
    )
    j = totals.join(owned, "doc_id", "left")
    n_novel = F.coalesce("n_novel", F.lit(0)).cast("bigint")
    return j.select(
        "doc_id", "n_shingles", n_novel.alias("n_novel"),
        (n_novel.cast("double") / F.col("n_shingles").cast("double")).alias("novelty"),
    )


def run(spark, fn, label):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
    print(f"{label}: {best:.2f}s", flush=True)


def main():
    spark = get_session("exp_novelty")
    spark.read.parquet(f"{SF}/documents.parquet").limit(1).count()
    run(spark, variant_a, "A current")
    run(spark, variant_b, "B persist-sh")
    run(spark, variant_c, "C inrow-totals")
    ra = sorted(map(tuple, variant_a(spark).collect()))
    rc = sorted(map(tuple, variant_c(spark).collect()))
    print("A==C rows:", ra == rc, len(ra), len(rc))


if __name__ == "__main__":
    main()
