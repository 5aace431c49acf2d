"""Round-4 experiment: physical shapes for bottomk_containment_pairs
(the other 3.6s headline query).

A: current — df_capped_shingles join-back, then md5 + per-doc window +
   inverted probe join (capped sh re-evaluated per consumer).
B: A with the hashed capped-shingle relation persisted (3 consumers:
   sizes, bottom-k window, probe side).
C: postings shape — groupBy(s).collect_list (bounded arrays) feeds an
   exploded (id, h) relation, persisted once; bottom-k via groupBy(id)
   slice(array_sort(collect_list)) instead of a row_number window.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F, Window as W

from potoos_spark.operators import dedup as D
from potoos_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CAP, K, THR = 100, 8, 0.5


def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    n = spark.sparkContext.defaultParallelism
    return d.repartition(n, "doc_id")


def variant_a(spark):
    sh = D.df_capped_shingles(D.shingle_frame(docs(spark)), CAP)
    return D.bottomk_containment_pairs(sh, k=K, threshold=THR)


def variant_b(spark):
    sh = D.df_capped_shingles(D.shingle_frame(docs(spark)), CAP)
    h = sh.select("doc_id", F.md5("s").alias("h")).persist()
    sizes = h.groupBy("doc_id").agg(F.count("*").alias("sz"))
    w = W.partitionBy("doc_id").orderBy("h")
    bk = h.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= K
    ).drop("__rn")
    m = (
        bk.withColumnsRenamed({"doc_id": "id_a"})
        .join(h.withColumnsRenamed({"doc_id": "id_b"}), "h")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("m"))
    )
    k_used = F.least(F.col("sz"), F.lit(K))
    est = (
        m.join(sizes.withColumnsRenamed({"doc_id": "id_a"}), "id_a")
        .withColumn("k_used", k_used.cast("bigint"))
        .withColumn(
            "est_containment", F.col("m").cast("double") / F.col("k_used").cast("double")
        )
    )
    return est.select("id_a", "id_b", "m", "k_used", "est_containment").filter(
        F.col("est_containment") >= THR
    )


def variant_c(spark):
    sh = D.shingle_frame(docs(spark))
    posts = (
        sh.groupBy("s")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") <= CAP)
    )
    h = posts.select(
        F.explode("ids").alias("doc_id"), F.md5("s").alias("h")
    ).persist()
    sizes = h.groupBy("doc_id").agg(F.count("*").alias("sz"))
    bk = (
        h.groupBy("doc_id")
        .agg(F.slice(F.array_sort(F.collect_list("h")), 1, K).alias("bh"))
        .select("doc_id", F.explode("bh").alias("h"))
    )
    m = (
        bk.withColumnsRenamed({"doc_id": "id_a"})
        .join(h.withColumnsRenamed({"doc_id": "id_b"}), "h")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("m"))
    )
    k_used = F.least(F.col("sz"), F.lit(K))
    est = (
        m.join(sizes.withColumnsRenamed({"doc_id": "id_a"}), "id_a")
        .withColumn("k_used", k_used.cast("bigint"))
        .withColumn(
            "est_containment", F.col("m").cast("double") / F.col("k_used").cast("double")
        )
    )
    return est.select("id_a", "id_b", "m", "k_used", "est_containment").filter(
        F.col("est_containment") >= THR
    )


def run(spark, fn, label):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
    print(f"{label}: {best:.2f}s", flush=True)
    return best


def main():
    spark = get_session("exp_bottomk")
    spark.read.parquet(f"{SF}/documents.parquet").limit(1).count()
    run(spark, variant_a, "A current")
    run(spark, variant_b, "B persist-h")
    run(spark, variant_c, "C postings+agg-bottomk")
    ra = sorted(map(tuple, variant_a(spark).collect()))
    rc = sorted(map(tuple, variant_c(spark).collect()))
    print("A==C rows:", ra == rc, len(ra), len(rc))


if __name__ == "__main__":
    main()
