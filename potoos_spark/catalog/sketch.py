"""Catalog: sketch tier. The DataSketches-backed entries (HLL / KLL /
theta) are rows-only — approximate by design, so there is no
hash-matchable SQL oracle; tests/test_sketch.py pins the error
envelope against exact counts instead. The Count-Min and Bloom entries
use md5-derived hash families, so although the ANSWERS are
approximate, the sketches themselves are deterministic — DuckDB
reproduces them bit-for-bit and the oracle hash-matches."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.sketch import (
    bloom_probe,
    count_min_estimate,
    hll_distinct,
    hll_union_distinct,
    kll_quantiles,
    theta_overlap,
)
from .common import QuerySpec, events_frame, table


def _hll_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return hll_distinct(li, ["l_returnflag"], "l_partkey")


def _hll_union_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return hll_union_distinct(
        li, ["l_returnflag", "l_linestatus"], ["l_returnflag"], "l_partkey"
    )


def _kll_fn(spark, sf_dir):
    ev = events_frame(spark, sf_dir)
    return kll_quantiles(ev, ["series_key"], "value")


def _theta_fn(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        F.year("l_shipdate").alias("yr"), "l_partkey"
    )
    return theta_overlap(li, "yr", "l_partkey", 1996, 1997)


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
    "sketch_distinct_hll": QuerySpec(_hll_fn, None),
    "sketch_hll_union": QuerySpec(_hll_union_fn, None),
    "sketch_kll_quantiles": QuerySpec(_kll_fn, None),
    "sketch_theta_overlap": QuerySpec(_theta_fn, None),
    "sketch_count_min": QuerySpec(_cms_fn, _CMS_SQL),
    "sketch_bloom_filter": QuerySpec(_bloom_fn, _BLOOM_SQL),
    # r4: deterministic bottom-k distinct sketch — hash-oracle-checked
    "sketch_kmv_distinct": QuerySpec(_kmv_fn, _KMV_SQL),
}
