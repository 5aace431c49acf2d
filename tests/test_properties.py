"""Property-based tests (hypothesis): randomized inputs against
brute-force Python references. Few examples, deadline off — each
example is a full Spark round-trip; the value is the randomized edge
shapes (duplicate timestamps, empty sides, single points, ties), not
the example count."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from potoos_spark.operators.asof import asof_join
from potoos_spark.operators.rollup import combine_partials, finalize, rollup_partials

TS = st.integers(min_value=0, max_value=50)
VAL = st.integers(min_value=-5, max_value=5)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _asof_reference(left, right, direction="backward", tolerance=None):
    out = []
    for lt, lv in left:
        if direction == "backward":
            cands = [(rt, rv) for rt, rv in right if rt <= lt]
            best = max(cands, key=lambda p: p[0]) if cands else None
        else:
            cands = [(rt, rv) for rt, rv in right if rt >= lt]
            best = min(cands, key=lambda p: p[0]) if cands else None
        if best is not None and tolerance is not None and abs(best[0] - lt) > tolerance:
            best = None
        out.append((lt, lv, best[1] if best else None))
    return sorted(out)


@given(
    left=st.lists(st.tuples(TS, VAL), min_size=1, max_size=15, unique_by=lambda p: p[0]),
    right=st.lists(st.tuples(TS, VAL), min_size=0, max_size=15, unique_by=lambda p: p[0]),
    direction=st.sampled_from(["backward", "forward"]),
    tolerance=st.sampled_from([None, 0, 3, 10]),
)
@SETTINGS
def test_asof_join_matches_bruteforce(spark, left, right, direction, tolerance):
    l = spark.createDataFrame(
        [("k", t, float(v)) for t, v in left], "k string, ts_ms bigint, lv double"
    )
    r = spark.createDataFrame(
        [("k", t, float(v)) for t, v in right], "k string, ts_ms bigint, rv double"
    ) if right else spark.createDataFrame([], "k string, ts_ms bigint, rv double")
    got = sorted(
        (row["ts_ms"], row["lv"], row["rv"])
        for row in asof_join(
            l, r, on="k", direction=direction, tolerance_ms=tolerance
        ).collect()
    )
    want = [
        (t, float(v), float(rv) if rv is not None else None)
        for t, v, rv in _asof_reference(left, right, direction, tolerance)
    ]
    assert got == want


@given(
    points=st.lists(
        st.tuples(st.integers(0, 99), VAL), min_size=1, max_size=40,
        unique_by=lambda p: p[0],
    ),
    agg=st.sampled_from(["min", "max", "count", "first", "last", "range"]),
)
@SETTINGS
def test_rollup_combine_equals_direct_partials(spark, points, agg):
    """Combining fine partials into coarse buckets must equal computing
    the coarse partials directly from raw points (algebraic closure)."""
    df = spark.createDataFrame(
        [("k", t, float(v), i) for i, (t, v) in enumerate(points)],
        "series_key string, ts_ms bigint, value double, seq bigint",
    )
    fine = rollup_partials(df, 10)
    combined = finalize(combine_partials(fine, 30), agg)
    direct = finalize(rollup_partials(df, 30), agg)
    a = sorted(map(tuple, combined.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b


def _session_reference(ts_list, gap):
    """Islands: a new session starts when ts - prev_ts > gap (Spark
    merges inclusively: an event exactly `gap` after the last one
    extends the session)."""
    out = []
    for t in sorted(ts_list):
        if out and t - out[-1][-1] <= gap:
            out[-1].append(t)
        else:
            out.append([t])
    return sorted((s[0], s[-1], len(s)) for s in out)


@given(
    ts_list=st.lists(
        st.integers(min_value=0, max_value=200), min_size=1, max_size=25, unique=True
    ),
    gap=st.sampled_from([1, 5, 17]),
)
@SETTINGS
def test_session_window_islands_match_reference(spark, ts_list, gap):
    """Pins the boundary rule the DuckDB session oracles rely on:
    an event exactly `gap` after the previous one MERGES into the
    current session (inclusive boundary)."""
    df = spark.createDataFrame(
        [("k", t, 1.0) for t in ts_list], "series_key string, ts_ms bigint, value double"
    )
    sess = (
        df.groupBy(
            "series_key",
            F.session_window(F.timestamp_millis("ts_ms"), f"{gap} milliseconds"),
        )
        .agg(F.min("ts_ms").alias("s"), F.max("ts_ms").alias("e"), F.count("*").alias("n"))
    )
    got = sorted((r["s"], r["e"], r["n"]) for r in sess.collect())
    assert got == _session_reference(ts_list, gap)


def _bucket_reference(points, b, offset, label, agg):
    """Brute-force A1-A16 core: floor((ts-offset)/b)*b + offset buckets,
    exact aggregators, bucket_timestamp label shift."""
    buckets = {}
    for t, v in points:
        s = t - offset
        start = s - (s % b) + offset  # python % is a true mod, like pmod
        buckets.setdefault(start, []).append((t, v))
    shift = {"-": 0, "~": b // 2, "+": b}[label]
    out = []
    for start, pts in buckets.items():
        vals = [v for _, v in pts]
        if agg == "min":
            r = float(min(vals))
        elif agg == "max":
            r = float(max(vals))
        elif agg == "count":
            r = float(len(vals))
        elif agg == "first":
            r = float(min(pts)[1])  # earliest ts (unique ts per input)
        else:  # last
            r = float(max(pts)[1])
        out.append((start + shift, r))
    return sorted(out)


@given(
    points=st.lists(
        st.tuples(st.integers(min_value=0, max_value=500), VAL),
        min_size=1, max_size=30, unique_by=lambda p: p[0],
    ),
    b=st.sampled_from([1, 7, 60]),
    offset=st.sampled_from([0, 3, 59]),
    label=st.sampled_from(["-", "~", "+"]),
    agg=st.sampled_from(["min", "max", "count", "first", "last"]),
)
@SETTINGS
def test_bucket_aggregation_matches_bruteforce(spark, points, b, offset, label, agg):
    from potoos_spark.config import TimeSeriesConfig
    from potoos_spark.operators.retrieval import apply_aggregation

    cfg = TimeSeriesConfig(
        aggregation_type=agg,
        bucket_size_msec=b,
        align=offset,
        bucket_timestamp=label,
    )
    df = spark.createDataFrame(
        [("k", t, float(v)) for t, v in points],
        "series_key string, ts_ms bigint, value double",
    )
    got = sorted((r["ts_ms"], r["value"]) for r in apply_aggregation(df, cfg).collect())
    assert got == _bucket_reference(points, b, offset % b, label, agg)


@given(
    rows=st.lists(
        st.tuples(TS, VAL, st.integers(min_value=0, max_value=99)),
        min_size=1, max_size=30, unique_by=lambda r: r[2],
    ),
)
@SETTINGS
def test_latest_dedup_matches_bruteforce(spark, rows):
    """A15: latest-per-timestamp keeps the value with the max ingestion
    seq — duplicate timestamps (the whole point) are generated freely."""
    from potoos_spark.config import TimeSeriesConfig
    from potoos_spark.operators.retrieval import apply_latest

    df = spark.createDataFrame(
        [("k", t, float(v), s) for t, v, s in rows],
        "series_key string, ts_ms bigint, value double, seq bigint",
    )
    got = sorted(
        (r["ts_ms"], r["value"])
        for r in apply_latest(df, TimeSeriesConfig(latest=True)).collect()
    )
    ref = {}
    for t, v, s in rows:
        if t not in ref or s > ref[t][0]:
            ref[t] = (s, float(v))
    assert got == sorted((t, v) for t, (_, v) in ref.items())


@given(
    rows=st.lists(
        st.tuples(TS, VAL, st.integers(min_value=0, max_value=99)),
        min_size=1, max_size=30, unique_by=lambda r: r[2],
    ),
    count=st.sampled_from([1, 3, 10]),
    reverse=st.booleans(),
)
@SETTINGS
def test_count_limit_matches_bruteforce(spark, rows, count, reverse):
    """A16 with duplicate timestamps: rank by (ts, seq) in scan
    direction — deterministic under any partitioning."""
    from potoos_spark.config import TimeSeriesConfig
    from potoos_spark.operators.retrieval import apply_count_limit

    df = spark.createDataFrame(
        [("k", t, float(v), s) for t, v, s in rows],
        "series_key string, ts_ms bigint, value double, seq bigint",
    ).repartition(5)
    cfg = TimeSeriesConfig(count=count, reversed=reverse)
    got = sorted(
        (r["ts_ms"], r["seq"]) for r in apply_count_limit(df, cfg).collect()
    )
    ordered = sorted(((t, s) for t, _, s in rows), reverse=reverse)
    assert got == sorted(ordered[:count])


def test_asof_join_dup_right_ts_latest_seq_wins(spark):
    """Duplicate right timestamps: with right_seq, the max-seq (latest
    ingested) row wins deterministically, in both directions."""
    from potoos_spark.operators.asof import asof_join

    l = spark.createDataFrame(
        [("k", 10, 1.0)], "k string, ts_ms bigint, lv double"
    )
    r = spark.createDataFrame(
        [("k", 10, 100.0, 1), ("k", 10, 200.0, 2), ("k", 10, 150.0, 0)],
        "k string, ts_ms bigint, rv double, ingest bigint",
    ).repartition(3)
    for direction in ("backward", "forward"):
        got = asof_join(
            l, r.drop("ingest").withColumn("ingest", F.col("rv").cast("bigint")),
            on="k", direction=direction, right_seq="ingest",
        ).collect()
        assert len(got) == 1 and got[0]["rv"] == 200.0, (direction, got)


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100_000),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda p: p[0],
    ),
    cd=st.integers(min_value=1, max_value=20_000),
)
@SETTINGS
def test_debounce_kept_points_respect_cooldown(spark, pts, cd):
    """Invariants: consecutive kept points ≥ cooldown apart; the first
    point of each series is kept; kept set is a subset of input."""
    from potoos_spark.operators.downsample import debounce

    rows = [("k", t, v, i) for i, (t, v) in enumerate(sorted(pts))]
    df = spark.createDataFrame(
        rows, "series_key string, ts_ms bigint, value double, seq bigint"
    )
    kept = sorted(r["ts_ms"] for r in debounce(df, cd).collect())
    assert kept[0] == rows[0][1]
    assert all(b - a >= cd for a, b in zip(kept, kept[1:]))
    assert set(kept) <= {r[1] for r in rows}


@given(
    vals=st.lists(
        # two-decimal values: exactly representable in the engine's
        # DECIMAL(18,2) cast, so the python Decimal mirror is exact
        st.integers(min_value=0, max_value=100_000).map(lambda c: c / 100.0),
        min_size=2,
        max_size=30,
    )
)
@SETTINGS
def test_counter_rate_total_increase_matches_positive_deltas(spark, vals):
    """Sum of per-bucket increases == sum of positive deltas (+ resets
    contributing their value), independent of bucketing."""
    from decimal import Decimal

    from potoos_spark.operators.rate import counter_rate

    rows = [("k", i * 1000, float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "series_key string, ts_ms bigint, value double, seq bigint"
    )
    out = counter_rate(df, 5_000).collect()
    total = sum(r["increase"] for r in out)
    dv = [Decimal(f"{v:.2f}") for v in vals]
    expect = sum(
        (b - a) if b >= a else b for a, b in zip(dv, dv[1:])
    )
    assert abs(total - float(expect)) < 1e-6


@given(
    vals=st.lists(
        st.integers(min_value=-50, max_value=50), min_size=1, max_size=40
    ),
)
@SETTINGS
def test_winsorize_matches_bruteforce(spark, vals):
    from potoos_spark.operators.rate import winsorize

    rows = [("k", 1000 * i, float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "series_key string, ts_ms bigint, value double, seq bigint"
    )
    got = {
        row["ts_ms"]: row["value_w"]
        for row in winsorize(df).collect()
    }
    # reference: LOW percentiles by rank ceil(n*p/100) over (value, ts)
    ordered = sorted((float(v), 1000 * i) for i, v in enumerate(vals))
    n = len(ordered)
    klo = max(1, -((-n * 5) // 100))
    khi = -((-n * 95) // 100)
    lo, hi = ordered[klo - 1][0], ordered[khi - 1][0]
    for i, v in enumerate(vals):
        want = min(max(float(v), lo), hi)
        assert got[1000 * i] == want, (vals, lo, hi)


@given(
    ranks_a=st.permutations(list(range(1, 8))),
    ranks_b=st.permutations(list(range(1, 8))),
)
@SETTINGS
def test_rrf_fuse_matches_bruteforce_and_is_list_order_invariant(
    spark, ranks_a, ranks_b
):
    from potoos_spark.operators.text import rrf_fuse

    la = [("q", d, r) for d, r in enumerate(ranks_a)]
    lb = [("q", d + 3, r) for d, r in enumerate(ranks_b)]  # partial overlap
    schema = "query_id string, doc_id bigint, rank bigint"
    A = spark.createDataFrame(la, schema)
    B = spark.createDataFrame(lb, schema)
    got = {
        (row["doc_id"]): (row["rrf_e9"], row["n_lists"], row["rank"])
        for row in rrf_fuse([A, B], topk=100).collect()
    }
    swapped = {
        (row["doc_id"]): (row["rrf_e9"], row["n_lists"], row["rank"])
        for row in rrf_fuse([B, A], topk=100).collect()
    }
    assert got == swapped  # fusion is list-order invariant
    # brute-force reference
    contrib = {}
    for _, doc, r in la + lb:
        contrib.setdefault(doc, []).append(round(1e9 / (60 + r)))
    want = {d: (int(sum(cs)), len(cs)) for d, cs in contrib.items()}
    assert {d: v[:2] for d, v in got.items()} == want
    # rank ordering: rrf_e9 desc, doc_id asc
    by_rank = sorted(got.items(), key=lambda kv: kv[1][2])
    assert [d for d, _ in by_rank] == [
        d for d, _ in sorted(want.items(), key=lambda kv: (-kv[1][0], kv[0]))
    ]


@given(
    vals=st.lists(
        st.integers(min_value=-30, max_value=30), min_size=1, max_size=30
    ),
)
@SETTINGS
def test_page_hinkley_scores_match_bruteforce(spark, vals):
    from potoos_spark.detectors.sequential import page_hinkley_detector

    rows = [("k", 1000 * i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "series_key string, ts_ms bigint, value double")
    got = {
        row["ts_ms"]: row["score"] for row in page_hinkley_detector(df).collect()
    }
    rng = float(max(vals) - min(vals))
    delta = 0.02 * rng
    s = 0.0
    up = dn = 0.0
    for i, v in enumerate(vals):
        v = float(v)
        s += v
        mean = s / (i + 1)
        up = max(up + ((v - mean) - delta), 0.0)
        dn = max(dn + ((mean - v) - delta), 0.0)
        want = max(up, dn) / rng if rng > 0 else 0.0
        assert got[1000 * i] == want, (vals, i)


def test_asof_join_null_payload_field_not_backfilled(spark):
    """The matched right row's NULL field must stay NULL — carrying
    payload columns independently would backfill it from an older row,
    emitting a mixed-row result that never existed."""
    from potoos_spark.operators.asof import asof_join

    l = spark.createDataFrame([("k", 25, 9.0)], "k string, ts_ms bigint, lv double")
    r = spark.createDataFrame(
        [("k", 10, 1.0, 2.0), ("k", 20, None, 3.0)],
        "k string, ts_ms bigint, a double, b double",
    )
    row = asof_join(l, r, on="k").collect()[0]
    assert row["a"] is None and row["b"] == 3.0


def test_nearest_asof_join_accepts_right_seq(spark):
    """right_seq is a tie-break input, not payload — it must not ride
    into the backward pass's output and trip the forward pass's
    collision check."""
    from potoos_spark.operators.asof import nearest_asof_join

    l = spark.createDataFrame([("k", 25, 9.0)], "k string, ts_ms bigint, lv double")
    r = spark.createDataFrame(
        [("k", 20, 1, 4.0), ("k", 20, 2, 5.0)],
        "k string, ts_ms bigint, ing bigint, v double",
    )
    out = nearest_asof_join(l, r, on="k", right_seq="ing").collect()
    assert len(out) == 1 and out[0]["v"] == 5.0  # max seq wins the tie


WORD = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])


@given(
    docs=st.lists(
        st.lists(WORD, min_size=3, max_size=10), min_size=2, max_size=5
    ),
)
@SETTINGS
def test_containment_dominates_jaccard_and_matches_bruteforce(spark, docs):
    """For every co-occurring pair: containment ≥ jaccard (min-size
    normalization can only grow the score), both within [0, 1], and
    both match a brute-force Python reference over 3-gram shingle
    sets."""
    from potoos_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
        shingle_frame,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    sh = shingle_frame(df)
    cont = {(r["id_a"], r["id_b"]): r for r in containment_pairs(sh).collect()}
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(sh).collect()}

    def sset(ws):
        return {"_".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    sets = {i: sset(ws) for i, ws in enumerate(docs)}
    assert set(cont) == set(jac)
    for (a, b), r in cont.items():
        inter = len(sets[a] & sets[b])
        assert r["shared"] == inter
        expect_c = inter / min(len(sets[a]), len(sets[b]))
        assert r["containment"] == pytest.approx(expect_c)
        assert r["containment"] >= jac[(a, b)] - 1e-12
        assert 0.0 <= r["containment"] <= 1.0


@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=500_000),
        min_size=1,
        max_size=12,
        unique=True,
    ),
    th=st.sampled_from([1, 1000, 60_000]),
)
@SETTINGS
def test_heartbeat_sla_matches_bruteforce(spark, ts, th):
    """Downtime equals the sum of gap excesses; uptime ∈ [0, 1] (NULL
    only for zero span); violations count gaps over the threshold."""
    from potoos_spark.operators.rate import heartbeat_sla

    rows = [("k", t, 0.0, i) for i, t in enumerate(ts)]
    df = spark.createDataFrame(
        rows, "series_key string, ts_ms bigint, value double, seq bigint"
    )
    r = heartbeat_sla(df, th).collect()[0]
    s = sorted(ts)
    gaps = [b - a for a, b in zip(s, s[1:])]
    span = s[-1] - s[0]
    down = sum(max(g - th, 0) for g in gaps)
    assert r["span_ms"] == span
    assert r["n_points"] == len(ts)
    assert r["n_violations"] == sum(1 for g in gaps if g > th)
    assert r["downtime_ms"] == down
    if span > 0:
        assert r["uptime_ratio"] == pytest.approx(1 - down / span)
        assert 0.0 <= r["uptime_ratio"] <= 1.0
    else:
        assert r["uptime_ratio"] is None


PRICE = st.floats(min_value=1.0, max_value=9.0, allow_nan=False, width=16)
SIZE = st.integers(min_value=1, max_value=9)


@given(
    pts=st.lists(st.tuples(PRICE, SIZE), min_size=1, max_size=14),
)
@SETTINGS
def test_skyline_sweep_matches_dominance_bruteforce(spark, pts):
    """The windowed sweep must return exactly the non-dominated set
    under strict Pareto dominance (min price, max size) — including
    duplicate-point ties, where both copies survive."""
    import potoos_spark.catalog.relational_ext as rx

    rows = [(i, float(p), int(s)) for i, (p, s) in enumerate(pts)]
    df = spark.createDataFrame(
        rows, "p_partkey bigint, p_retailprice double, p_size int"
    )

    class _Tbl:
        def __call__(self, spark_, sf_dir_, name_):
            return df

    orig = rx.table
    rx.table = _Tbl()
    try:
        got = {r["p_partkey"] for r in rx._skyline_fn(spark, "ignored").collect()}
    finally:
        rx.table = orig

    def dominated(a):
        return any(
            b[1] <= a[1] and b[2] >= a[2] and (b[1] < a[1] or b[2] > a[2])
            for b in rows
        )

    want = {a[0] for a in rows if not dominated(a)}
    assert got == want


def _ntile_reference(n_rows: int, n: int) -> list[int]:
    q, r = divmod(n_rows, n)
    out = []
    for tile in range(1, n + 1):
        out.extend([tile] * (q + 1 if tile <= r else q))
    return out


@given(
    vals=st.lists(st.integers(0, 50), min_size=1, max_size=60),
    n=st.sampled_from([1, 3, 10]),
    n_parts=st.sampled_from([1, 5, 64]),
)
@SETTINGS
def test_global_rank_and_ntile_match_reference(spark, vals, n, n_parts):
    """global_rank must equal the position in the sorted (v, i) order
    for ANY data/partition-count; global_ntile must reproduce the ANSI
    tile layout (first t%n tiles one row larger)."""
    from potoos_spark.operators.skew import global_ntile, global_rank

    rows = [(v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v bigint, i bigint")
    order = sorted(rows)
    want_rank = {t: k + 1 for k, t in enumerate(order)}
    got_rank = {
        (r["v"], r["i"]): r["rank"]
        for r in global_rank(df, ["v", "i"], n_parts=n_parts).collect()
    }
    assert got_rank == want_rank
    tiles = _ntile_reference(len(rows), n)
    want_tile = {t: tiles[k] for k, t in enumerate(order)}
    got_tile = {
        (r["v"], r["i"]): r["tile"]
        for r in global_ntile(df, ["v", "i"], n, n_parts=n_parts).collect()
    }
    assert got_tile == want_tile
    spark.catalog.clearCache()


@given(
    n_distinct=st.integers(1, 300),
    k=st.sampled_from([8, 64]),
)
@SETTINGS
def test_kmv_distinct_exact_below_k_and_bounded_above(spark, n_distinct, k):
    """KMV must be exact when the group has <= k distinct values and
    must produce a positive finite estimate otherwise (the estimator is
    unbiased but any single draw must at least be sane: est > k-1 since
    h_k < 1)."""
    from potoos_spark.operators.sketch import kmv_distinct

    df = spark.range(n_distinct * 2).select(
        F.lit("g").alias("g"),
        F.concat(F.lit("v"), (F.col("id") % n_distinct)).alias("v"),
    )
    row = kmv_distinct(df, ["g"], "v", k=k).collect()[0]
    assert row["exact_distinct"] == n_distinct
    if n_distinct <= k:
        assert row["est_distinct"] == float(n_distinct)
        assert row["rel_err"] == 0.0
    else:
        assert row["k_used"] == k
        assert row["est_distinct"] > k - 1
        assert row["est_distinct"] == row["est_distinct"]  # not NaN


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=1, max_value=5_000),
        ),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    k=st.integers(min_value=1, max_value=20),
)
def test_weighted_sample_matches_python_race(spark, rows, k):
    """Third-engine check: the Efraimidis–Spirakis winners computed by
    Spark equal a pure-Python replay of the identical md5 race (same
    uniform, same integer-scaled key, same (key desc, id) order) — the
    engine-portability claim behind the DuckDB oracle, reproduced
    against hashlib instead of an SQL engine."""
    import hashlib
    import math

    from potoos_spark.operators.curate import weighted_sample

    def half_up(x: float) -> int:
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    want = []
    for i, w in rows:
        v = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (v + 0.5) / 4294967296.0
        want.append((half_up(math.log(u) / w * 1e9), i, w))
    want.sort(key=lambda t: (-t[0], t[1]))
    expect = [(i, w, key) for key, i, w in want[:k]]

    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    got = [
        (r["doc_id"], r["w"], r["key_e9"])
        for r in weighted_sample(df, k, "w").collect()
    ]
    got.sort(key=lambda t: (-t[2], t[0]))
    assert got == expect


WORD = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh", "ii", "jj"])
DOC = st.lists(WORD, min_size=0, max_size=20).map(" ".join)


def _span_removal_reference(docs: dict[int, list[str]], n: int):
    """Pure-python replica of the documented algorithm: dup grams
    (>= 2 docs) keep min-id; every occurrence in a non-keeper doc
    covers its n positions (union); survivors rejoin in order."""
    gram_docs: dict[tuple, set] = {}
    for i, t in docs.items():
        for p in range(len(t) - n + 1):
            gram_docs.setdefault(tuple(t[p : p + n]), set()).add(i)
    keeper = {g: min(s) for g, s in gram_docs.items() if len(s) >= 2}
    out = {}
    for i, t in docs.items():
        covered = set()
        for p in range(len(t) - n + 1):
            g = tuple(t[p : p + n])
            if g in keeper and keeper[g] != i:
                covered.update(range(p, p + n))
        kept = [w for j, w in enumerate(t) if j not in covered]
        out[i] = (len(t), len(t) - len(kept), " ".join(kept))
    return out


@given(docs=st.lists(DOC, min_size=1, max_size=8))
@SETTINGS
def test_span_removal_matches_python_reference(spark, docs):
    """r6: the Spark rewrite must EQUAL a pure-python replica of the
    documented algorithm on random small-vocabulary corpora (n=4 so
    rolling windows actually collide) — covering keeper rules,
    overlapping-window unions, cross-doc gram ownership, fully-covered
    docs, and short/empty docs in one property."""
    from potoos_spark.operators.dedup import remove_duplicated_spans

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_dedup"])
        for r in remove_duplicated_spans(df, n=4).collect()
    }
    toks = {i: (d.split() if d else []) for i, d in enumerate(docs)}
    assert got == _span_removal_reference(toks, 4)


# ---- r8: sharded trailing windows vs the one-partition reference ----

_SH_TS = st.integers(min_value=0, max_value=400)


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), _SH_TS, VAL),
        min_size=1,
        max_size=30,
    ),
    window=st.sampled_from([1, 7, 25]),
    chunk_mult=st.sampled_from([1, 3, 24]),
)
@SETTINGS
def test_sharded_trailing_window_matches_global(spark, rows, window, chunk_mult):
    """Random cadences, DUPLICATE timestamps, and boundary-exact values
    against the unsharded window — count and exact bigint sum per row
    must be identical at every (window, chunk) geometry, including the
    degenerate chunk == window."""
    from pyspark.sql import Window as W

    from potoos_spark.operators import rolling

    df = spark.createDataFrame(
        [(k, t, v) for k, t, v in rows],
        "series_key string, ts_ms bigint, v bigint",
    )
    wg = (
        W.partitionBy("series_key").orderBy("ts_ms").rangeBetween(-window, 0)
    )
    want = sorted(
        tuple(r)
        for r in df.select(
            "series_key",
            "ts_ms",
            "v",
            F.count("*").over(wg).alias("n"),
            F.sum("v").over(wg).alias("s"),
        ).collect()
    )
    aug, w = rolling.sharded_trailing_window(
        df, window, chunk_ms=window * chunk_mult
    )
    got = sorted(
        tuple(r)
        for r in rolling.emit_owned(
            aug.select(
                "series_key",
                "ts_ms",
                "v",
                F.count("*").over(w).alias("n"),
                F.sum("v").over(w).alias("s"),
                rolling.OWNED,
                rolling.CHUNK,
            )
        ).collect()
    )
    assert got == want


# ---- r8: edge components vs a python union-find ----


@given(
    n_nodes=st.integers(min_value=1, max_value=12),
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ),
        max_size=12,
    ),
)
@SETTINGS
def test_edge_components_matches_union_find(spark, n_nodes, edges):
    """Random pair lists (self-loops and out-of-universe endpoints
    filtered, duplicates kept) against a reference union-find: every
    node's component must be the MIN reachable node id."""
    from potoos_spark.operators.dedup import edge_components

    pairs = [(a, b) for a, b in edges if a != b and a < n_nodes and b < n_nodes]
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n_nodes)}

    ids = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id bigint")
    pdf = (
        spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
        if pairs
        else spark.createDataFrame([], "id_a bigint, id_b bigint")
    )
    got = {
        r["doc_id"]: r["component"]
        for r in edge_components(ids, pdf).collect()
    }
    assert got == want


# ---- r8: vectorized per-cell kernels vs the expression tier ----


@given(
    vecs=st.lists(
        st.lists(st.integers(min_value=-3, max_value=3), min_size=4, max_size=4),
        min_size=2,
        max_size=14,
    ),
    k=st.sampled_from([1, 3]),
)
@SETTINGS
def test_cell_capped_topk_matches_expression_tier(spark, vecs, k):
    """The Arrow kernel's ranking must be BIT-identical to the
    expression tier (cosine_from_norms + row_number window) on random
    small integer vectors — including ties, negative components, and
    near-parallel pairs. Zero vectors are excluded (NaN cosine order
    is engine-undefined, documented)."""
    from pyspark.sql import Window as W

    from potoos_spark.operators.dedup import cosine_from_norms
    from potoos_spark.operators.similarity import cell_capped_topk

    vecs = [v for v in vecs if any(x != 0 for x in v)]
    if len(vecs) < 2:
        return
    rows = [
        (i, [x * 500 for x in v], sum((x * 500) ** 2 for x in v))
        for i, v in enumerate(vecs)
    ]
    assigned = spark.createDataFrame(
        [(i, e, n, 0) for i, e, n in rows],
        "__id bigint, e array<bigint>, n bigint, cell bigint",
    )
    got = sorted(
        tuple(r)
        for r in cell_capped_topk(assigned, k, cell_cap=512).collect()
    )
    a = assigned.select(
        "cell", F.col("__id").alias("query_id"),
        F.col("e").alias("ea"), F.col("n").alias("na"),
    )
    b = assigned.select(
        "cell", F.col("__id").alias("match_id"),
        F.col("e").alias("eb"), F.col("n").alias("nb"),
    )
    scored = (
        a.join(b, "cell")
        .filter(F.col("query_id") != F.col("match_id"))
        .select(
            "query_id",
            "match_id",
            cosine_from_norms(
                F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")
            ).alias("cosine"),
        )
    )
    wq = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "match_id")
    want = sorted(
        tuple(r)
        for r in scored.withColumn(
            "rank", F.row_number().over(wq).cast("bigint")
        )
        .filter(F.col("rank") <= k)
        .collect()
    )
    assert got == want
