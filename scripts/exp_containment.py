"""Round-4 experiment: alternative physical shapes for the df-capped
containment pair scorer (headline's two heaviest queries, 3.6s each).

A: current — df_capped_shingles (join back on shingle key) feeding the
   inverted-index self-join.
B: A + persist() on the capped shingle frame (kills re-evaluation).
C: posting-array shape — ONE corpus explode -> groupBy(s).collect_list
   (arrays bounded by the cap) -> in-row double-explode pair generation
   (no self-join) + sizes from the same postings relation.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from potoos_spark.operators import dedup as D
from potoos_spark.session import get_session

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CAP = 100


def docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    n = spark.sparkContext.defaultParallelism
    return d.repartition(n, "doc_id")


def variant_a(spark):
    sh = D.df_capped_shingles(D.shingle_frame(docs(spark)), CAP)
    return D.containment_pairs(sh).filter(F.col("containment") >= 0.5)


def variant_b(spark):
    sh = D.df_capped_shingles(D.shingle_frame(docs(spark)), CAP).persist()
    return D.containment_pairs(sh).filter(F.col("containment") >= 0.5)


def variant_c(spark):
    sh = D.shingle_frame(docs(spark))
    posts = (
        sh.groupBy("s")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") <= CAP)
        .persist()
    )
    pairs = (
        posts.select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    sizes = (
        posts.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("sz"))
    )
    out = (
        pairs.join(sizes.withColumnsRenamed({"doc_id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc_id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "containment",
            F.col("shared").cast("double") / F.least("sz_a", "sz_b").cast("double"),
        )
        .select("id_a", "id_b", "shared", "sz_a", "sz_b", "containment")
        .filter(F.col("containment") >= 0.5)
    )
    return out


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
    spark = get_session("exp_containment")
    spark.read.parquet(f"{SF}/documents.parquet").limit(1).count()
    a = run(spark, variant_a, "A current")
    b = run(spark, variant_b, "B persist-capped")
    c = run(spark, variant_c, "C posting-array")
    # cross-check identical results
    ra = sorted(map(tuple, variant_a(spark).collect()))
    rc = sorted(map(tuple, variant_c(spark).collect()))
    print("A==C rows:", ra == rc, len(ra), len(rc))


if __name__ == "__main__":
    main()
