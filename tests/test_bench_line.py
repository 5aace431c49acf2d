"""The bench summary line must FIT THE DRIVER'S TAIL WINDOW.

BENCH_r07 recorded ``parsed: null`` because the 92-query JSON line
(default separators, ~2.5 KB) overflowed the driver's 2000-char stdout
tail — the first parse failure in seven rounds (VERDICT r7 item 1).
These tests pin the fix: whatever the headline set grows to, the final
line stays under ``bench.LINE_BUDGET`` (≤ 1800 < 2000), stays valid
JSON with the contract fields, ranks the retained per-query entries
most-expensive-first, and declares any truncation explicitly.
No Spark session needed — the emission is a pure function.
"""

from __future__ import annotations

import json
import random

import bench


def _fake_best(n: int, seed: int = 7) -> dict[str, float]:
    rng = random.Random(seed)
    return {
        f"q_{i:03d}_{'x' * rng.randint(5, 25)}": round(rng.uniform(0.1, 9.9), 3)
        for i in range(n)
    }


def test_current_headline_set_fits_budget():
    # the real names (the longest part of each entry) with worst-case
    # 2-decimal values
    best = {name: 99.99 for name in bench.HEADLINE}
    line = bench.build_summary_line(best, 0.1, "BENCH_QUERIES.json")
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == len(bench.HEADLINE)
    assert parsed["queries_omitted"] == len(bench.HEADLINE) - len(
        parsed["queries"]
    )
    assert parsed["queries_file"] == "BENCH_QUERIES.json"
    # the retained map is a subset of the real names
    assert set(parsed["queries"]) <= set(bench.HEADLINE)


def test_most_expensive_queries_survive_truncation():
    best = _fake_best(120)
    line = bench.build_summary_line(best, 0.1, "BENCH_QUERIES.json")
    assert len(line) <= bench.LINE_BUDGET
    parsed = json.loads(line)
    kept = parsed["queries"]
    assert 0 < len(kept) < len(best)  # truncation actually happened
    # every kept entry costs >= every dropped entry
    dropped = [v for k, v in best.items() if k not in kept]
    assert min(best[k] for k in kept) >= max(dropped)
    # total reflects ALL queries, not just the kept ones
    assert abs(parsed["value"] - round(sum(best.values()), 2)) < 0.05


def test_small_set_is_complete_and_untruncated():
    best = _fake_best(10)
    parsed = json.loads(
        bench.build_summary_line(best, 0.01, "BENCH_QUERIES.json")
    )
    assert parsed["queries_omitted"] == 0
    assert set(parsed["queries"]) == set(best)


def test_budget_holds_under_pathological_growth():
    # 3x the current headline count with long names still emits a
    # parseable line under budget
    best = _fake_best(3 * len(bench.HEADLINE))
    line = bench.build_summary_line(best, 1.0, "BENCH_QUERIES.json")
    assert len(line) <= bench.LINE_BUDGET
    json.loads(line)


def test_prior_omitted_rotation_guarantees_union_coverage():
    """r9 (VERDICT r8 item 4): simulate two consecutive rounds — every
    query omitted from round k's line must appear in round k+1's line,
    so the two driver-parsed artifacts jointly cover the full set."""
    best = _fake_best(105)
    line1 = bench.build_summary_line(best, 0.1, "BENCH_QUERIES.json")
    p1 = json.loads(line1)
    omitted1 = sorted(set(best) - set(p1["queries"]))
    assert omitted1  # rotation is only meaningful under truncation
    # the guarantee needs the omitted set to fit the line capacity —
    # true for the real headline set (31 omitted vs ~66 capacity at r8)
    assert len(omitted1) < len(p1["queries"])
    line2 = bench.build_summary_line(
        best, 0.1, "BENCH_QUERIES.json", prior_omitted=omitted1
    )
    p2 = json.loads(line2)
    assert len(line2) <= bench.LINE_BUDGET
    # everything omitted last round is in this round's line
    assert set(omitted1) <= set(p2["queries"])
    # and jointly the two lines cover every query
    assert set(p1["queries"]) | set(p2["queries"]) == set(best)
    # remaining budget still goes most-expensive-first: among the
    # NON-prioritized entries, every kept one costs >= every dropped one
    rest_kept = [best[k] for k in p2["queries"] if k not in set(omitted1)]
    dropped = [v for k, v in best.items() if k not in p2["queries"]]
    assert min(rest_kept) >= max(dropped)


def test_prior_derived_from_latest_driver_artifact(tmp_path):
    """r10 (VERDICT r9 item 2): the rotation prior comes from the
    newest BENCH_r{N}.json's parsed line — every current headline query
    the driver artifact did NOT show ranks first next run — so two
    consecutive DRIVER artifacts jointly cover the whole set even when
    a builder round-end run is interleaved between them."""
    best = {f"q_{i:02d}": 1.0 for i in range(10)}
    seen = {f"q_{i:02d}": 1.0 for i in range(6)}  # artifact showed 0-5
    (tmp_path / "BENCH_r08.json").write_text(
        json.dumps({"parsed": {"queries": {"q_00": 1.0}}})
    )
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps({"parsed": {"queries": seen}})
    )
    # a stale rolling file must NOT win over the artifact
    (tmp_path / "BENCH_QUERIES.json").write_text(
        json.dumps({"line_omitted": ["q_00"]})
    )
    prior = bench.compute_prior_omitted(
        best, str(tmp_path), "BENCH_QUERIES.json"
    )
    assert prior == [f"q_{i:02d}" for i in range(6, 10)]


def test_prior_falls_back_to_rolling_file_without_artifact(tmp_path):
    best = {"a": 1.0, "b": 2.0}
    (tmp_path / "BENCH_QUERIES.json").write_text(
        json.dumps({"line_omitted": ["b"]})
    )
    assert bench.compute_prior_omitted(
        best, str(tmp_path), "BENCH_QUERIES.json"
    ) == ["b"]
    # unparseable artifact is skipped, not fatal
    (tmp_path / "BENCH_r09.json").write_text("{not json")
    assert bench.compute_prior_omitted(
        best, str(tmp_path), "BENCH_QUERIES.json"
    ) == ["b"]


def test_repo_artifact_pair_covers_headline():
    """The committed-state half of the r10 rotation proof: whenever the
    rolling BENCH_QUERIES.json comes from a run NEWER than the latest
    BENCH_r{N}.json artifact (the round-end state the driver will turn
    into artifact N+1), everything its line omits must already be in
    artifact N's parsed line — so artifacts N and N+1 jointly cover
    every headline query."""
    import os

    here = os.path.dirname(os.path.abspath(bench.__file__))
    rolling_path = os.path.join(here, "BENCH_QUERIES.json")
    if not os.path.exists(rolling_path):
        return  # nothing to check yet
    with open(rolling_path) as f:
        rolling = json.load(f)
    artifacts = sorted(
        f
        for f in os.listdir(here)
        if f.startswith("BENCH_r") and f.endswith(".json")
    )
    parsed = None
    for fname in reversed(artifacts):
        with open(os.path.join(here, fname)) as f:
            p = json.load(f).get("parsed") or {}
        if p.get("queries"):
            parsed = p
            break
    if parsed is None or parsed.get("value") == round(rolling["value"], 2):
        return  # rolling file IS the latest artifact's own run
    missing = set(rolling.get("line_omitted", [])) - set(parsed["queries"])
    assert not missing, (
        f"queries invisible in both the latest artifact and the next "
        f"line: {sorted(missing)}"
    )
