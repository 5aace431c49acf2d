"""Catalog: MLlib-backed operators (rows-only checks — seeded MLlib
hash families / cluster assignments are deterministic within Spark but
not reproducible in set-oriented SQL; the md5-based deterministic
variants in pipeline.py carry the bit-exact oracles for the same
surfaces)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import ml as M
from .common import QuerySpec, table


def _minhash_mllib_fn(spark, sf_dir):
    return M.minhash_lsh_dedup(table(spark, sf_dir, "documents"))


def _brp_lsh_fn(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    return M.brp_lsh_neighbors(e.filter(F.col("vec_id") < 5), e)


def _kmeans_scores_fn(spark, sf_dir):
    from .common import hourly_avg_frame

    return M.kmeans_distance_scores(hourly_avg_frame(spark, sf_dir))


QUERIES: dict[str, QuerySpec] = {
    "dedup_minhash_mllib": QuerySpec(_minhash_mllib_fn, None),
    "knn_brp_lsh_mllib": QuerySpec(_brp_lsh_fn, None),
    "det_kmeans_distance": QuerySpec(_kmeans_scores_fn, None),
}
