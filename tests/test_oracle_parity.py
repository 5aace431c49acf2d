"""t2-style correctness: every catalog query vs its DuckDB oracle.

Runs at sf0.01 (the driver's correctness scale) by default; set
SPARK_GRAFT_ORACLE_SF_DIR to change. Exact float comparison — the
catalog is engineered for bit-exact cross-engine results.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from tests.conftest import SF_ORACLE_DIR
from tests.oracle_harness import compare, duckdb_connection

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF_ORACLE_DIR)
    yield c
    c.close()


def test_every_query_has_callable_and_oracle_alignment():
    assert QUERIES, "queries() is empty"
    unknown = set(ORACLES) - set(QUERIES)
    assert not unknown, f"oracle_sql has keys missing from queries(): {unknown}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, con, name):
    df = QUERIES[name](spark, SF_ORACLE_DIR)
    diff = compare(df, ORACLES[name], con)
    assert diff is None, f"{name}: {diff}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_ORACLE_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns


def _synth_embeddings_parquet(tmpdir: str, n: int, dim: int = 8) -> str:
    """Write a deterministic clustered embeddings.parquet big enough to
    engage the two-level hierarchy (C = ceil(n/256) >= 64 at
    n >= 16,384). float32 column like the driver fixture."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(20260816)
    centers = rng.normal(size=(32, dim))
    vecs = (
        centers[np.arange(n) % 32] + 0.25 * rng.normal(size=(n, dim))
    ).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array((np.arange(n) % 32).astype(np.int32)),
        }
    )
    path = f"{tmpdir}/embeddings.parquet"
    pq.write_table(tbl, path)
    return path


def test_two_level_ivf_oracle_parity_engaged_regime(spark, tmp_path):
    """ADVICE r8 (high): the knn_ivf_two_level oracle and engine only
    met in the degenerate C < 64 regime because every fixture has 2000
    embeddings (C = 8). This pins the ENGAGED regime: N = 16,384 ->
    C = 64 = IVF2_HIER_MIN_CELLS -> S = 8 — hierarchical 2-super-union
    assignment and flat probing must match the SQL bit-for-bit."""
    import duckdb

    from potoos_spark.catalog.pipeline import QUERIES as CATQ
    from potoos_spark.operators.similarity import (
        IVF2_HIER_MIN_CELLS,
        _ivf2_n_super,
        auto_n_cells,
    )

    n = 16_384
    C = auto_n_cells(n)
    assert C >= IVF2_HIER_MIN_CELLS and _ivf2_n_super(C) < C  # engaged
    d = str(tmp_path)
    _synth_embeddings_parquet(d, n)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    spec = CATQ["knn_ivf_two_level"]
    diff = compare(spec.fn(spark, d), spec.sql, con)
    con.close()
    assert diff is None, diff


def test_semantic_cells_and_mutual_knn_engaged_regime_parity(
    spark, tmp_path
):
    """r9: semantic_dedup_cells and cell_knn_edges now assign through
    the two-level funnel; their oracles use the shared assignment CTE
    fragment. Pin BOTH in the engaged regime (N = 16,384 -> C = 64,
    S = 8) — a drift between the funnel and the shared SQL mirror must
    fail here, not at 10^7 vectors."""
    import duckdb

    from potoos_spark.catalog.pipeline import QUERIES as CATQ

    n = 16_384
    d = str(tmp_path)
    _synth_embeddings_parquet(d, n)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    for name in ("dedup_semantic_cells", "knn_mutual_neighbors"):
        spec = CATQ[name]
        spark.catalog.clearCache()
        diff = compare(spec.fn(spark, d), spec.sql, con)
        assert diff is None, f"{name}: {diff}"
    con.close()


def test_ivf_pq_engaged_regime_parity(spark, tmp_path):
    """r10: knn_ivf_pq composes the two-level funnel with PQ-ADC
    scoring. Pin the composition in the ENGAGED regime (N = 16,384 ->
    C = 64, S = 8) at the full 64-dim shape so all 8 PQ subspaces
    carry real data — the sf fixtures are degenerate (C = 8), and a
    funnel/LUT drift must fail here, not at production scale."""
    import duckdb

    from potoos_spark.catalog.pipeline import QUERIES as CATQ

    n = 16_384
    d = str(tmp_path)
    _synth_embeddings_parquet(d, n, dim=64)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{d}/embeddings.parquet'"
    )
    spec = CATQ["knn_ivf_pq"]
    diff = compare(spec.fn(spark, d), spec.sql, con)
    con.close()
    assert diff is None, diff


def test_rag_recall_eval_engaged_regime_parity(spark):
    """r10: corpus_rag_recall_eval shares _INDEX_CHAIN_CTES with
    corpus_index_e2e, but adds a QUERY side (flat probe + in-cell
    integer scan) the sf0.01 fixture only exercises at C = 8 (< 64,
    degenerate flat). sf0.1's ~20k chunks give C >= 64 — the engaged
    two-level corpus assignment under a flat query probe must match
    the SQL bit-for-bit there too (the fixture-degeneracy lesson of
    ADVICE r8)."""
    from potoos_spark.catalog.pipeline import QUERIES as CATQ
    from potoos_spark.operators.similarity import (
        IVF2_HIER_MIN_CELLS,
        auto_n_cells,
    )

    sf_dir = "/root/testdata/sf0.1"
    from potoos_spark.operators.curate import chunk_overlap

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_chunks = chunk_overlap(docs, chunk_words=12, stride_words=8).count()
    assert auto_n_cells(n_chunks) >= IVF2_HIER_MIN_CELLS  # engaged

    con = duckdb_connection(sf_dir)
    spec = CATQ["corpus_rag_recall_eval"]
    diff = compare(spec.fn(spark, sf_dir), spec.sql, con)
    con.close()
    assert diff is None, diff
