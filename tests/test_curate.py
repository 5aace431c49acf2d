"""Curation pipeline invariants beyond the oracle: partitioning
independence (the determinism claim — min-id keepers and md5 splits
cannot depend on cluster layout) and stage monotonicity."""

from __future__ import annotations

from potoos_spark.catalog.common import table
from potoos_spark.operators.curate import curate_corpus
from tests.conftest import SF_DIR


def test_curate_invariant_under_repartition(spark):
    docs = table(spark, SF_DIR, "documents")
    base = sorted(map(tuple, curate_corpus(docs).collect()))
    shuffled = sorted(map(tuple, curate_corpus(docs.repartition(7)).collect()))
    assert base == shuffled
    assert len(base) > 0


def test_curate_output_is_subset_with_sane_split(spark):
    docs = table(spark, SF_DIR, "documents")
    out = curate_corpus(docs).collect()
    ids = {r["doc_id"] for r in out}
    assert len(ids) == len(out)  # one row per kept doc
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert ids <= all_ids
    n_train = sum(1 for r in out if r["split"] == "train")
    assert 0.8 <= n_train / len(out) <= 0.97  # ~90% by construction
