"""The driver samples the first ~50 ``queries()`` entries per round, so
the ordering in ``__spark_entry__._ordered_catalog`` IS the coverage
policy: red rows (a shipped fix must be re-checked immediately) lead,
then never-sampled entries (coverage accrual), then the green rest.
No SparkSession needed — the ordering is pure dict bookkeeping.
"""

from __future__ import annotations

import importlib.util
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(HERE, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("__spark_entry__", mod)
    spec.loader.exec_module(mod)
    return mod


def _fake_rows(names):
    """Synthetic driver rows: first name red (hash fail), second red
    (error), third green."""
    a, b, c = names
    return {
        a: {"rows_match": True, "schema_match": True, "hash_match": False},
        b: {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "err": "boom",
        },
        c: {"rows_match": True, "schema_match": True, "hash_match": True},
    }


def test_red_rows_lead_then_fresh_then_green():
    mod = _entry_module()
    names = list(mod.CATALOG)
    # pick rows spread across the catalog so raw order can't fake a pass
    sampled = [names[5], names[len(names) // 2], names[-1]]
    ordered = list(mod._ordered_catalog(latest=_fake_rows(sampled)))
    assert set(ordered) == set(names), "ordering must be a permutation"
    # the two red rows lead, in catalog order
    assert ordered[:2] == [n for n in names if n in sampled[:2]]
    # the green sampled entry is last of all
    assert ordered[-1] == sampled[2]
    # everything between is the never-sampled tier, in catalog order
    fresh = [n for n in names if n not in sampled]
    assert ordered[2:-1] == fresh


def test_hash_match_absent_counts_as_green():
    """Rows-only entries (no oracle) report no hash_match key; a
    rows+schema pass must not be treated as red."""
    mod = _entry_module()
    names = list(mod.CATALOG)
    latest = {names[0]: {"rows_match": True, "schema_match": True}}
    ordered = list(mod._ordered_catalog(latest=latest))
    assert ordered[-1] == names[0]
    assert ordered[: len(names) - 1] == names[1:]


_NO_ORACLE_ROW = {
    # the driver's REAL rows-only shape: null-valued match keys, not
    # absent ones (CORRECTNESS_r04.json, e.g. sketch_distinct_hll)
    "rows_match": None,
    "schema_match": None,
    "hash_match": None,
    "spark_rows": 3,
    "oracle_rows": None,
    "err": "no_oracle",
}


def _fake_specs(names, with_sql):
    from potoos_spark.catalog.common import QuerySpec

    return {
        n: QuerySpec(lambda s, d: None, "SELECT 1" if n in with_sql else None)
        for n in names
    }


def test_no_oracle_row_without_sql_counts_as_seen():
    """ADVICE r4: a rows-only entry's no_oracle row must not park it in
    the red tier forever — with no oracle to gain, re-sampling it first
    buys nothing."""
    mod = _entry_module()
    names = ["a", "b", "c"]
    specs = _fake_specs(names, with_sql={"b", "c"})
    ordered = list(
        mod._ordered_catalog(latest={"a": dict(_NO_ORACLE_ROW)}, specs=specs)
    )
    assert ordered == ["b", "c", "a"]  # fresh first, 'a' seen-last, no red


def test_no_oracle_row_with_new_oracle_is_red_first():
    """Once the entry gains an oracle, the stale no_oracle row must be
    re-checked red-first (this is how the r5 sketch rewires heal)."""
    mod = _entry_module()
    names = ["a", "b", "c"]
    specs = _fake_specs(names, with_sql={"a", "b", "c"})
    ordered = list(
        mod._ordered_catalog(latest={"c": dict(_NO_ORACLE_ROW)}, specs=specs)
    )
    assert ordered == ["c", "a", "b"]


def test_no_oracle_row_with_failed_rows_match_stays_red():
    """A rows-only entry that actually FAILED (rows_match False) is a
    real defect: red-first even without an oracle."""
    mod = _entry_module()
    row = dict(_NO_ORACLE_ROW, rows_match=False)
    specs = _fake_specs(["a", "b"], with_sql={"b"})
    ordered = list(mod._ordered_catalog(latest={"a": row}, specs=specs))
    assert ordered == ["a", "b"]


def test_vacuous_green_resamples_after_fresh():
    """A green row that compared ZERO rows against a real oracle proves
    nothing (VERDICT r7: multimodal_dhash_pairs) — the entry re-samples
    right after the never-sampled tier until a non-trivial row lands."""
    mod = _entry_module()
    names = ["a", "b", "c", "d"]
    specs = _fake_specs(names, with_sql=set(names))
    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    latest = {
        "a": dict(green, spark_rows=0, oracle_rows=0),  # vacuous
        "b": dict(green, spark_rows=7, oracle_rows=7),  # real green
    }
    ordered = list(mod._ordered_catalog(latest=latest, specs=specs))
    assert ordered == ["c", "d", "a", "b"]


def test_vacuous_zero_rows_without_oracle_stays_seen():
    """rows-only entries legitimately return 0 rows on small fixtures;
    without an oracle there is nothing extra a re-sample would check."""
    mod = _entry_module()
    specs = _fake_specs(["a", "b"], with_sql=set())
    latest = {
        "a": dict(_NO_ORACLE_ROW, spark_rows=0),
    }
    ordered = list(mod._ordered_catalog(latest=latest, specs=specs))
    assert ordered == ["b", "a"]


def test_no_history_preserves_catalog_order():
    mod = _entry_module()
    assert list(mod._ordered_catalog(latest={})) == list(mod.CATALOG)


def test_current_disk_state_heals_r3_reds_first():
    """With the real CORRECTNESS files on disk, the two r3 hash
    failures must be the first two sampled entries until a green row
    lands for them (guard is skipped once they heal)."""
    mod = _entry_module()
    ordered = list(mod._ordered_catalog())
    reds = {"ts_heartbeat_sla", "q_scalar_json"}
    import glob as _glob
    import json as _json

    latest = {}
    for path in sorted(
        _glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))
    ):
        latest.update(_json.load(open(path)))
    still_red = {
        k
        for k in reds
        if k in latest
        and not (
            latest[k].get("rows_match")
            and latest[k].get("schema_match")
            and latest[k].get("hash_match", True)
            and not latest[k].get("err")
        )
    }
    assert set(ordered[: len(still_red)]) == still_red
