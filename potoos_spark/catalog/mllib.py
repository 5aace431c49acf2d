"""Catalog: the MLlib-surface slots, wired to deterministic twins (r5
verdict item 1: these were ``QuerySpec(fn, None)`` on the assumption of
a rows-only driver check that doesn't exist, so they could never pass
the driver gate). The MLlib operators themselves (``operators/ml.py``:
MinHashLSH, BucketedRandomProjectionLSH, KMeans distance scoring)
remain the library API — seeded hash families / cluster assignments
are deterministic within Spark but not reproducible in set-oriented
SQL — and stay pytest-covered via ``tests/test_mllib_twins.py``. Each
catalog slot certifies the same SURFACE with an md5/rank-deterministic
construction DuckDB replays bit-exactly:

* ``dedup_minhash_mllib`` — MinHash-LSH near-dup at the MLlib entry's
  operating point family, k=16 signatures in 4-row bands (a second,
  stricter point than ``dedup_minhash_lsh``'s k=12/2-row banding).
* ``knn_brp_lsh_mllib`` — E2LSH euclidean approx-join with md5-derived
  ±1 projection lines (``similarity.brp_lsh_neighbors_md5``).
* ``det_kmeans_distance`` — distance-to-nearest-centroid scoring with
  exact-quantile (rank-selected) centroids instead of Lloyd means
  (``ml.quantile_centroid_scores``) — order statistics, no float
  accumulation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import similarity as S
from ..operators.ml import quantile_centroid_scores
from ..operators.similarity import brp_sign
from .common import EVENTS_SQL, G_SQL, QuerySpec, hourly_avg_frame, table
from .pipeline import _BASE_SH, _CAND, _JACC, _SHARED, _SIZES

# --- MinHash at a second operating point (k=16, 4-row bands) ---------------

_MH16_K = 16
_MH16_RPB = 4
_MH16_THRESH = 0.3


def _minhash_mllib_fn(spark, sf_dir):
    return D.minhash_dedup_pairs(
        table(spark, sf_dir, "documents"),
        k=_MH16_K,
        rows_per_band=_MH16_RPB,
        jaccard_threshold=_MH16_THRESH,
    )


_SIG16 = (
    "sig AS (SELECT doc_id, "
    + ", ".join(f"MIN(md5('{j}|' || s)) AS mh{j}" for j in range(_MH16_K))
    + " FROM sh GROUP BY doc_id)"
)
_BANDS16 = (
    "band AS ("
    + " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, md5("
        + " || ".join(f"mh{b * _MH16_RPB + r}" for r in range(_MH16_RPB))
        + ") AS key FROM sig"
        for b in range(_MH16_K // _MH16_RPB)
    )
    + ")"
)
_MINHASH16_SQL = (
    f"{_BASE_SH}, {_SIG16}, {_BANDS16}, {_CAND}, {_SIZES}, {_SHARED}, {_JACC} "
    "SELECT j.id_a, j.id_b, j.shared, j.union_size, j.jaccard FROM jac j "
    "JOIN cand c ON c.id_a = j.id_a AND c.id_b = j.id_b "
    f"WHERE j.jaccard >= {_MH16_THRESH}"
)

# --- E2LSH euclidean approx-join -------------------------------------------

_BRP_TABLES = 4
_BRP_DIM = 64
_BRP_W = "500.0"  # bucket_length 0.5 in 1000x-scaled units
_BRP_SQ_THRESH = 4_000_000  # (2.0 * 1000)^2 — squared integer gate


def _brp_lsh_fn(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    return S.brp_lsh_neighbors_md5(
        e.filter(F.col("vec_id") < 5),
        e,
        threshold=2.0,
        bucket_length=0.5,
        n_tables=_BRP_TABLES,
        dim=_BRP_DIM,
    )


def _brp_plane_literal(t: int) -> str:
    return "[" + ", ".join(str(brp_sign(t, i)) for i in range(_BRP_DIM)) + "]"


_BRP_SCALED_V = (
    "v AS (SELECT vec_id, [CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT) "
    "for x in embedding] AS e FROM embeddings), "
    "nrm AS (SELECT vec_id, CAST(list_sum([x * x for x in e]) AS BIGINT) AS nn FROM v)"
)
_BRP_BUCKETS = " UNION ALL ".join(
    f"SELECT v.vec_id, {t} AS t, CAST(floor(CAST(list_sum(list_transform("
    f"list_zip(v.e, {_brp_plane_literal(t)}), p -> p[1] * p[2])) AS DOUBLE) "
    f"/ {_BRP_W}) AS BIGINT) AS bucket FROM v"
    for t in range(_BRP_TABLES)
)
_BRP_SQL = (
    f"WITH {_BRP_SCALED_V}, "
    f"bk AS ({_BRP_BUCKETS}), "
    "cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS match_id "
    "FROM bk q JOIN bk c ON q.t = c.t AND q.bucket = c.bucket "
    "AND q.vec_id < 5 AND q.vec_id <> c.vec_id), "
    "d AS (SELECT cand.query_id, cand.match_id, "
    "nq.nn + nc.nn - 2 * CAST(list_sum(list_transform(list_zip(vq.e, vc.e), "
    "p -> p[1] * p[2])) AS BIGINT) AS sq "
    "FROM cand JOIN v vq ON vq.vec_id = cand.query_id "
    "JOIN v vc ON vc.vec_id = cand.match_id "
    "JOIN nrm nq ON nq.vec_id = cand.query_id "
    "JOIN nrm nc ON nc.vec_id = cand.match_id) "
    "SELECT query_id, match_id, sqrt(CAST(sq AS DOUBLE)) / 1000.0 "
    f"AS euclidean_dist FROM d WHERE sq <= {_BRP_SQ_THRESH}"
)

# --- quantile-centroid distance scoring ------------------------------------

_KM_K = 8


def _kmeans_scores_fn(spark, sf_dir):
    return quantile_centroid_scores(hourly_avg_frame(spark, sf_dir), k=_KM_K)


_KM_FRACS = ", ".join(f"({2 * i + 1})" for i in range(_KM_K))
_KMEANS_SQL = (
    f"WITH series AS ({EVENTS_SQL}), g AS ({G_SQL}), "
    "r AS (SELECT value AS v, "
    "ROW_NUMBER() OVER (ORDER BY value, series_key, ts_ms) AS rk, "
    "COUNT(*) OVER () AS n FROM g), "
    f"cents AS (SELECT DISTINCT v AS c FROM r, (VALUES {_KM_FRACS}) t(num) "
    f"WHERE rk = CAST(ceil(CAST(n * num AS DOUBLE) / {2 * _KM_K}.0) AS BIGINT)), "
    "cl AS (SELECT list(c ORDER BY c) AS cs FROM cents) "
    "SELECT g.series_key, g.ts_ms, g.value, "
    "list_min([abs(g.value - c) for c in cl.cs]) AS score FROM g, cl"
)


QUERIES: dict[str, QuerySpec] = {
    "dedup_minhash_mllib": QuerySpec(_minhash_mllib_fn, _MINHASH16_SQL),
    "knn_brp_lsh_mllib": QuerySpec(_brp_lsh_fn, _BRP_SQL),
    "det_kmeans_distance": QuerySpec(_kmeans_scores_fn, _KMEANS_SQL),
}
