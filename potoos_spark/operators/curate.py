"""End-to-end corpus curation: the composed training-data pipeline
(extension tier; no reference file:line — SURVEY.md §2.6 north star).

    quality gate → exact dedup → near-dup dedup → deterministic split

Every stage is one of this engine's deterministic operators, so the
whole pipeline is reproducible run-to-run and cluster-size-independent
(min-id keeper rules, md5-derived split) — and therefore holds to the
same DuckDB hash-match standard as a single operator.

Scale shape (100 TB): the quality gate is scan-local column math; the
exact dedup is one hash-groupBy; the SimHash near-dup pass is one
explode + groupBy per doc (linear, no pair join); the split is a
scan-local expression. Three shuffles total, each on a key that
partitions evenly (content hash / doc id / fingerprint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import exact_dedup, simhash
from .text import quality_filter


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_frac_hex: str = "e6",  # 230/256 ≈ 90% train
) -> DataFrame:
    """Returns (id_col, split) for the surviving corpus: documents that
    pass the quality gate, are the min-id keeper of their exact-content
    group, and the min-id keeper of their SimHash near-dup group."""
    passed = quality_filter(df, text_col, id_col).select(id_col)
    docs_q = df.join(passed, id_col)

    keepers = exact_dedup(docs_q, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    docs_e = docs_q.join(keepers, id_col)

    near = simhash(docs_e, text_col, id_col)
    keep2 = near.groupBy("simhash").agg(F.min(id_col).alias(id_col))

    h2 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return keep2.select(
        id_col,
        F.when(h2 < train_frac_hex, "train").otherwise("val").alias("split"),
    )
