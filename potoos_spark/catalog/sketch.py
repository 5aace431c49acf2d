"""Catalog: sketch tier. Every entry is hash-oracle-checked: all hash
families are md5-derived, so although the ANSWERS are approximate, the
sketches themselves are deterministic — DuckDB reproduces them
bit-for-bit. The seeded DataSketches operators (``hll_distinct``,
``hll_union_distinct``, ``kll_quantiles``, ``theta_overlap``) remain
the library API for JVM-side production use (tests/test_sketch.py pins
their error envelopes), but their CATALOG slots are wired to the
deterministic md5 twins (r4 verdict item 1: ``QuerySpec(fn, None)``
rows can never pass the driver gate — the driver has no rows-only
check — and burned red-first sampler slots every round)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sketch import (
    _HLL_P,
    _HLL_RHO_CAP,
    _hll_alpha_m2_scaled,
    bloom_probe,
    count_min_estimate,
    hll_distinct_md5,
    hll_union_md5,
    kmv_theta_overlap,
    kmv_union,
    sampled_quantiles_md5,
)
from .common import EVENTS_SQL, QuerySpec, events_frame, table


def _hll_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return hll_distinct_md5(li, ["l_returnflag"], "l_orderkey")


def _hll_union_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return hll_union_md5(
        li, ["l_returnflag", "l_linestatus"], ["l_returnflag"], "l_orderkey"
    )


def _kll_fn(spark, sf_dir):
    ev = events_frame(spark, sf_dir)
    return sampled_quantiles_md5(ev, ["series_key"], "value", "seq")


def _theta_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").alias("yr"), "l_partkey"
    )
    return kmv_theta_overlap(li, "yr", "l_partkey", 1996, 1997, k=_THETA_K)


# --- deterministic-HLL SQL (mirrors operators.sketch.hll_distinct_md5) ----

_HLL_M = 1 << _HLL_P
_HLL_A2 = repr(_hll_alpha_m2_scaled(_HLL_M, _HLL_RHO_CAP))
# rho over the 60-bit window after the bucket hex digits; string-op
# leading-zero count (no log2 — libm-portable), capped at the register
# cap so the scaled harmonic sum stays an exact integer
_HLL_TRIM = "ltrim(substr(h, 3, 15), '0')"
_HLL_RHO = (
    f"LEAST(CASE WHEN {_HLL_TRIM} = '' THEN 61 "
    f"ELSE 4 * (15 - length({_HLL_TRIM})) + (4 - CASE "
    f"WHEN substr({_HLL_TRIM}, 1, 1) IN "
    "('8','9','a','b','c','d','e','f') THEN 4 "
    f"WHEN substr({_HLL_TRIM}, 1, 1) IN ('4','5','6','7') THEN 3 "
    f"WHEN substr({_HLL_TRIM}, 1, 1) IN ('2','3') THEN 2 "
    f"ELSE 1 END) + 1 END, {_HLL_RHO_CAP})"
)
_HLL_S = (
    f"CAST(sp + ({_HLL_M} - nb) * (CAST(1 AS BIGINT) << {_HLL_RHO_CAP}) "
    "AS DOUBLE)"
)
_HLL_EST = f"{_HLL_A2} / {_HLL_S}"

_HLL_SQL = (
    "WITH d AS (SELECT DISTINCT l_returnflag AS g, "
    "CAST(l_orderkey AS VARCHAR) AS v FROM lineitem), "
    "hh AS (SELECT g, md5(v) AS h FROM d), "
    "rho AS (SELECT g, CAST(('0x' || substr(h, 1, 2)) AS INT) AS b, "
    f"{_HLL_RHO} AS r FROM hh), "
    "reg AS (SELECT g, b, MAX(r) AS m FROM rho GROUP BY 1, 2), "
    f"pg AS (SELECT g, SUM(CAST(1 AS BIGINT) << ({_HLL_RHO_CAP} - m)) AS sp, "
    "COUNT(*) AS nb FROM reg GROUP BY 1), "
    "ex AS (SELECT g, COUNT(*) AS exact_distinct FROM d GROUP BY 1) "
    f"SELECT pg.g AS l_returnflag, ex.exact_distinct, {_HLL_EST} AS est_distinct, "
    f"({_HLL_EST}) / CAST(ex.exact_distinct AS DOUBLE) - 1.0 AS rel_err "
    "FROM pg JOIN ex USING (g)"
)

# two-level union twin: registers per fine (flag, status) group, merged
# up to the coarse flag group by register-wise MAX before estimating
_HLL_UNION_SQL = (
    "WITH d AS (SELECT DISTINCT l_returnflag AS g, l_linestatus AS g2, "
    "CAST(l_orderkey AS VARCHAR) AS v FROM lineitem), "
    "hh AS (SELECT g, g2, md5(v) AS h FROM d), "
    "rho AS (SELECT g, g2, CAST(('0x' || substr(h, 1, 2)) AS INT) AS b, "
    f"{_HLL_RHO} AS r FROM hh), "
    "regf AS (SELECT g, g2, b, MAX(r) AS m FROM rho GROUP BY 1, 2, 3), "
    "reg AS (SELECT g, b, MAX(m) AS m FROM regf GROUP BY 1, 2), "
    f"pg AS (SELECT g, SUM(CAST(1 AS BIGINT) << ({_HLL_RHO_CAP} - m)) AS sp, "
    "COUNT(*) AS nb FROM reg GROUP BY 1), "
    "ex AS (SELECT g, COUNT(*) AS exact_distinct FROM "
    "(SELECT DISTINCT g, v FROM d) GROUP BY 1) "
    f"SELECT pg.g AS l_returnflag, ex.exact_distinct, {_HLL_EST} AS est_distinct, "
    f"({_HLL_EST}) / CAST(ex.exact_distinct AS DOUBLE) - 1.0 AS rel_err "
    "FROM pg JOIN ex USING (g)"
)

# deterministic sampled-quantile twin: md5(seq) % 8 == 0 row sample,
# exact lower quantiles (rank = ceil(n * num / den)) of the sample
_KLL_RANK = "CAST(ceil(CAST(n * {num} AS DOUBLE) / {den}.0) AS BIGINT)"
_KLL_SQL = (
    f"WITH series AS ({EVENTS_SQL}), "
    "s AS (SELECT series_key, value AS v FROM series WHERE "
    "CAST(('0x' || substr(md5(CAST(seq AS VARCHAR)), 1, 4)) AS BIGINT) % 8 = 0), "
    "r AS (SELECT series_key, v, "
    "ROW_NUMBER() OVER (PARTITION BY series_key ORDER BY v) AS rn, "
    "COUNT(*) OVER (PARTITION BY series_key) AS n FROM s) "
    "SELECT series_key, MAX(n) AS n_sampled, "
    + ", ".join(
        "MIN(CASE WHEN rn = "
        + _KLL_RANK.format(num=num, den=den)
        + f" THEN v END) AS p{100 * num // den}"
        for num, den in ((50, 100), (95, 100), (99, 100))
    )
    + " FROM r GROUP BY series_key"
)

# bottom-k theta set algebra: θ = min of the two sides' k-th hash
# fractions (1.0 when a side is exact); sets cut to hashes < θ,
# intersected/differenced as plain sets, estimates = count / θ
_THETA_K = 256
_HEX15_D = "1152921504606846976.0"  # 16^15, exact in a double
_THETA_SQL = (
    "WITH d AS (SELECT DISTINCT CAST(year(l_shipdate) AS INT) AS p, "
    "md5(CAST(l_partkey AS VARCHAR)) AS h FROM lineitem "
    "WHERE year(l_shipdate) IN (1996, 1997)), "
    "r AS (SELECT p, h, ROW_NUMBER() OVER (PARTITION BY p ORDER BY h) AS rn, "
    "COUNT(*) OVER (PARTITION BY p) AS nd FROM d), "
    "bk AS (SELECT p, h, rn, nd, "
    f"CAST(CAST(('0x' || substr(h, 1, 15)) AS BIGINT) AS DOUBLE) / {_HEX15_D} "
    f"AS frac FROM r WHERE rn <= {_THETA_K}), "
    f"st AS (SELECT p, nd, CASE WHEN nd <= {_THETA_K} THEN 1.0 ELSE frac END "
    f"AS th FROM bk WHERE rn = LEAST({_THETA_K}, nd)), "
    "sa AS (SELECT nd AS nd_a, th AS th_a FROM st WHERE p = 1996), "
    "sb AS (SELECT nd AS nd_b, th AS th_b FROM st WHERE p = 1997), "
    "t AS (SELECT nd_a, nd_b, th_a, th_b, LEAST(th_a, th_b) AS theta "
    "FROM sa, sb), "
    "kac AS (SELECT h FROM bk, t WHERE p = 1996 AND frac < theta), "
    "kbc AS (SELECT h FROM bk, t WHERE p = 1997 AND frac < theta), "
    "i AS (SELECT COUNT(*) AS n_inter FROM kac JOIN kbc USING (h)), "
    "o AS (SELECT COUNT(*) AS n_only FROM kac "
    "WHERE h NOT IN (SELECT h FROM kbc)) "
    "SELECT "
    f"CAST(CASE WHEN nd_a <= {_THETA_K} THEN CAST(nd_a AS DOUBLE) "
    f"ELSE floor({float(_THETA_K - 1)} / th_a) END AS BIGINT) AS n_a, "
    f"CAST(CASE WHEN nd_b <= {_THETA_K} THEN CAST(nd_b AS DOUBLE) "
    f"ELSE floor({float(_THETA_K - 1)} / th_b) END AS BIGINT) AS n_b, "
    "CAST(floor(CAST(n_inter AS DOUBLE) / theta) AS BIGINT) AS n_intersection, "
    "CAST(floor(CAST(n_only AS DOUBLE) / theta) AS BIGINT) AS n_only_a "
    "FROM t, i, o"
)


def _kmv_salted_fn(spark, sf_dir):
    """Skew-safe two-level salted bottom-k over the SAME input as
    sketch_kmv_distinct — row-identical by the pigeonhole merge
    argument, so it SHARES the direct form's oracle SQL (the shared
    oracle is the equivalence proof, the corpus_source_cap_2phase
    pattern)."""
    from ..operators.sketch import kmv_distinct_salted
    from ..operators.text import shingles, tokens

    docs = table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    t = docs.repartition(n_part, "doc_id").select(
        "source", F.explode(shingles(tokens("text"), 3)).alias("s")
    )
    return kmv_distinct_salted(t, ["source"], "s", k=_KMV_K)


def _kmv_union_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return kmv_union(
        li, ["l_returnflag", "l_linestatus"], ["l_returnflag"], "l_orderkey",
        k=_KMVU_K,
    )


# Direct coarse bottom-k sketch — the Spark side computes the two-level
# fine→coarse MERGE instead; hash equality of the two formulations IS
# the mergeability proof (union of fine bottom-k sets contains the
# coarse bottom-k by pigeonhole). Exact branch is nd < k STRICT: the
# merged set cannot tell nd == k from nd > k, so both engines use the
# estimator there.
_KMVU_K = 64
_KMVU_FRAC = (
    f"(CAST(CAST(('0x' || substr(h, 1, 15)) AS BIGINT) AS DOUBLE) / {_HEX15_D})"
)
_KMVU_EST = (
    f"CASE WHEN nd < {_KMVU_K} THEN CAST(nd AS DOUBLE) "
    f"ELSE {float(_KMVU_K - 1)} / {_KMVU_FRAC} END"
)
_KMV_UNION_SQL = (
    "WITH d AS (SELECT DISTINCT l_returnflag AS g, "
    "md5(CAST(l_orderkey AS VARCHAR)) AS h FROM lineitem), "
    "r AS (SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn, "
    "COUNT(*) OVER (PARTITION BY g) AS nd FROM d), "
    f"kth AS (SELECT * FROM r WHERE rn = LEAST({_KMVU_K}, nd)), "
    "ex AS (SELECT g, COUNT(*) AS exact_distinct FROM d GROUP BY 1) "
    "SELECT kth.g AS l_returnflag, ex.exact_distinct, "
    f"CAST(LEAST({_KMVU_K}, nd) AS BIGINT) AS k_used, "
    f"{_KMVU_EST} AS est_distinct, "
    f"({_KMVU_EST}) / CAST(ex.exact_distinct AS DOUBLE) - 1.0 AS rel_err "
    "FROM kth JOIN ex USING (g)"
)


def _cms_fn(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return count_min_estimate(ev, "user_id", depth=4, width=64)


# Count-Min point queries for every distinct user: depth-4 × width-64
# counters from md5-derived hashes (h_j = int(md5(j|key)[:4],16) % 64),
# estimate = min over rows — deterministic, so exact cross-engine match.
# The hash template takes the probed column as a {col} placeholder so
# build/probe sides stay in sync by construction.
_CMS_HASH = "CAST('0x' || substr(md5('{j}|' || CAST({col} AS VARCHAR)), 1, 4) AS INT) % 64"
_CMS_SQL = (
    "WITH cells AS ("
    + " UNION ALL ".join(
        f"SELECT {j} AS j, {_CMS_HASH.format(j=j, col='user_id')} AS bucket FROM events"
        for j in range(4)
    )
    + "), counters AS (SELECT j, bucket, COUNT(*) AS cnt FROM cells GROUP BY 1, 2), "
    "exact AS (SELECT user_id AS key, COUNT(*) AS exact_cnt FROM events GROUP BY 1), "
    "probes AS ("
    + " UNION ALL ".join(
        "SELECT key, exact_cnt, "
        f"{j} AS j, "
        + _CMS_HASH.format(j=j, col="key")
        + " AS bucket FROM exact"
        for j in range(4)
    )
    + ") "
    "SELECT p.key, p.exact_cnt, MIN(c.cnt) AS cms_estimate, "
    "MIN(c.cnt) - p.exact_cnt AS overestimate "
    "FROM probes p JOIN counters c USING (j, bucket) "
    "GROUP BY p.key, p.exact_cnt"
)


def _kmv_fn(spark, sf_dir):
    """Deterministic bottom-k (KMV) distinct estimate per source over
    trigram shingles (~1.2-1.5k distinct per source at sf0.01, so the
    estimator branch genuinely exercises; the fixture's ~31-token vocab
    would make per-token counts trivially exact at k=64). md5 hashing
    makes sketch AND estimate bit-reproducible, so this sketch entry is
    hash-oracle-checked (unlike the seeded DataSketches HLL entries,
    which are rows-only)."""
    from ..operators.sketch import kmv_distinct
    from ..operators.text import shingles, tokens

    # pre-explosion repartition: the interpreted HOF shingle projection
    # must run at full width even when the fixture is one parquet file
    # (one scan task) — same move as pipeline._spread_docs; measured
    # 13s -> ~1s at sf0.1 without it.
    docs = table(spark, sf_dir, "documents")
    n_part = spark.sparkContext.defaultParallelism
    t = docs.repartition(n_part, "doc_id").select(
        "source", F.explode(shingles(tokens("text"), 3)).alias("s")
    )
    return kmv_distinct(t, ["source"], "s", k=_KMV_K)


_KMV_K = 64
_HEX15 = 1152921504606846976.0  # 16^15, exact in a double
_KMV_SQL = (
    "WITH tok AS (SELECT source, doc_id, list_filter(string_split_regex(trim("
    "regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '), "
    "x -> x <> '') AS toks FROM documents), "
    "t AS (SELECT source, doc_id, unnest(toks) AS tok, "
    "generate_subscripts(toks, 1) AS pos FROM tok), "
    "tk AS (SELECT a.source, a.tok || '_' || b.tok || '_' || c.tok AS tok "
    "FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
    "JOIN t c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2), "
    "d AS (SELECT DISTINCT source, md5(tok) AS h FROM tk), "
    "r AS (SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn, "
    "COUNT(*) OVER (PARTITION BY source) AS nd FROM d), "
    f"kth AS (SELECT * FROM r WHERE rn = LEAST({_KMV_K}, nd)), "
    "est AS (SELECT source, nd, "
    f"CASE WHEN nd <= {_KMV_K} THEN CAST(nd AS DOUBLE) "
    f"ELSE {float(_KMV_K - 1)} / (CAST(CAST(('0x' || substr(h, 1, 15)) AS BIGINT) AS DOUBLE) / {_HEX15}) "
    "END AS e FROM kth) "
    "SELECT source, nd AS exact_distinct, "
    f"CAST(LEAST({_KMV_K}, nd) AS BIGINT) AS k_used, "
    "e AS est_distinct, e / CAST(nd AS DOUBLE) - 1.0 AS rel_err FROM est"
)


def _cms_merge_fn(spark, sf_dir):
    """Per-event-type CMS counter tables merged by cell-wise addition —
    bit-identical to the direct whole-table counters (linearity), so
    the oracle is simply the direct counter SQL."""
    from ..operators.sketch import count_min_merge

    ev = table(spark, sf_dir, "events")
    return count_min_merge(ev, "user_id", "event_type", depth=4, width=64)


# direct whole-table counters — the merged form must reproduce exactly
_CMS_COUNTERS_SQL = (
    "WITH cells AS ("
    + " UNION ALL ".join(
        f"SELECT {j} AS j, {_CMS_HASH.format(j=j, col='user_id')} AS bucket FROM events"
        for j in range(4)
    )
    + ") SELECT j, CAST(bucket AS BIGINT) AS bucket, COUNT(*) AS cnt "
    "FROM cells GROUP BY 1, 2"
)


def _bloom_union_fn(spark, sf_dir):
    """Per-nation Bloom bit sets unioned, then probed — bit-identical
    to bloom_probe on the whole build side (set union = filter of the
    union), so it SHARES the direct form's oracle SQL."""
    from ..operators.sketch import bloom_union

    cust = table(spark, sf_dir, "customer")
    build = cust.filter(F.col("c_acctbal") > 5000)
    return bloom_union(
        build, cust, "c_custkey", "c_custkey", "c_nationkey", k=3, m=_BLOOM_M
    )


def _bloom_fn(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    build = cust.filter(F.col("c_acctbal") > 5000)
    return bloom_probe(build, cust, "c_custkey", "c_custkey", k=3, m=_BLOOM_M)


# Bloom membership for every customer against the filter built from
# c_acctbal > 5000: 3 bit positions from md5 (int(md5(i|key)[:5],16)
# % m); member ⇔ all 3 set. False positives surface explicitly.
# m is sized for the sf0.1 build side (~8k keys): m=65536 keeps the
# fill ratio ~31% (FP rate ~3% at k=3) so the entry still exercises
# membership discrimination instead of saturating; the Spark operator
# and the SQL oracle share the constant.
_BLOOM_M = 65536
_BLOOM_BIT = (
    "CAST('0x' || substr(md5('{i}|' || CAST({key} AS VARCHAR)), 1, 5) AS BIGINT) "
    f"% {_BLOOM_M}"
)
_BLOOM_SQL = (
    "WITH bits AS (SELECT DISTINCT bit FROM ("
    + " UNION ALL ".join(
        f"SELECT {_BLOOM_BIT.format(i=i, key='c_custkey')} AS bit "
        "FROM customer WHERE c_acctbal > 5000"
        for i in range(3)
    )
    + ")), probes AS ("
    + " UNION ALL ".join(
        f"SELECT c_custkey AS key, {_BLOOM_BIT.format(i=i, key='c_custkey')} AS bit "
        "FROM customer"
        for i in range(3)
    )
    + "), m AS (SELECT p.key, "
    "CAST(COUNT(b.bit) = 3 AS BIGINT) AS bloom_member "
    "FROM probes p LEFT JOIN bits b USING (bit) GROUP BY p.key), "
    "actual AS (SELECT DISTINCT c_custkey AS key, 1 AS ain FROM customer "
    "WHERE c_acctbal > 5000) "
    "SELECT m.key, m.bloom_member, "
    "CAST(CASE WHEN a.ain IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS actual_member, "
    "CAST(m.bloom_member = 1 AND a.ain IS NULL AS BIGINT) AS false_positive "
    "FROM m LEFT JOIN actual a USING (key)"
)


QUERIES: dict[str, QuerySpec] = {
    # r5: wired to the deterministic md5 twins (hash-oracle-checked);
    # the seeded DataSketches forms remain library API (test_sketch.py)
    "sketch_distinct_hll": QuerySpec(_hll_fn, _HLL_SQL),
    "sketch_hll_union": QuerySpec(_hll_union_fn, _HLL_UNION_SQL),
    "sketch_kll_quantiles": QuerySpec(_kll_fn, _KLL_SQL),
    "sketch_theta_overlap": QuerySpec(_theta_fn, _THETA_SQL),
    "sketch_count_min": QuerySpec(_cms_fn, _CMS_SQL),
    "sketch_bloom_filter": QuerySpec(_bloom_fn, _BLOOM_SQL),
    # r4: deterministic bottom-k distinct sketch — hash-oracle-checked
    "sketch_kmv_distinct": QuerySpec(_kmv_fn, _KMV_SQL),
    # r5: mergeable KMV rollup — Spark merges fine sketches, the oracle
    # builds the coarse sketch directly; equality = mergeability proof
    "sketch_kmv_union": QuerySpec(_kmv_union_fn, _KMV_UNION_SQL),
    # r5: skew-safe salted bottom-k, row-identical to the direct form —
    # shares its oracle SQL (the equivalence proof)
    "sketch_kmv_salted": QuerySpec(_kmv_salted_fn, _KMV_SQL),
    # r5: merge-equals-direct proofs completing the mergeability story
    # across every sketch type (HLL max-merge, KMV union, CMS addition,
    # Bloom bit union)
    "sketch_cms_merge": QuerySpec(_cms_merge_fn, _CMS_COUNTERS_SQL),
    "sketch_bloom_union": QuerySpec(_bloom_union_fn, _BLOOM_SQL),
}
