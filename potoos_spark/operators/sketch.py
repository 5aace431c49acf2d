"""Approximate mergeable sketches (extension tier; no reference
file:line — SURVEY.md §2.6 gap list).

At 100 TB an exact ``COUNT(DISTINCT)`` over a high-cardinality key
shuffles every distinct value at least once. A sketch is an *algebraic
partial*: each task folds its partition into a fixed-size summary
(~KBs), the shuffle moves sketches instead of rows, and the final
merge is associative — the same partial→final shape Spark's
HashAggregate already uses, but with O(1)-size state per group. The
sketches below are Apache DataSketches HLL via the built-in
``hll_sketch_agg`` / ``hll_union_agg`` functions (JVM-side, codegen
friendly; no Python in the hot path), so sketches built per
partition / per day / per table are re-mergeable later — the rollup
store (operators/rollup.py) pattern applied to distinct counts.

Error envelope: HLL with lgConfigK=12 ⇒ ~1.6% relative standard
error; tests/test_sketch.py pins |approx − exact| / exact against a
generous 3σ bound at sf0.01.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

DEFAULT_LGK = 12


def hll_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Approximate distinct ``value_col`` per group: one HLL sketch per
    group, estimated to a BIGINT ``approx_distinct`` column."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(value_col), F.lit(lgk))
        ).alias("approx_distinct")
    )


def hll_union_distinct(
    df: DataFrame,
    fine_cols: Sequence[str],
    coarse_cols: Sequence[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Two-level distinct count demonstrating mergeability: build one
    sketch per fine group (e.g. per (flag, status) — in production per
    partition/day), then union the *sketches* up to the coarse group
    and estimate. The fine sketches are reusable for any coarser
    grouping — distinct counts become a rollup, not a rescan."""
    fine = df.groupBy(*fine_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sk")
    )
    return fine.groupBy(*coarse_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_distinct")
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002,
    the bottom-k estimator Theta sketches generalize) — the
    DETERMINISTIC sibling of ``hll_distinct``: hashing is md5, so the
    sketch, the estimate, and a DuckDB oracle agree bit-for-bit, which
    the seeded DataSketches HLL aggregates cannot offer. Per group, the
    k smallest md5 hashes of the distinct values are a uniform sample
    of the hash space; with h_k the k-th smallest hash mapped to (0,1),
    est = (k-1) / h_k. Groups with ≤ k distinct values are EXACT (the
    sketch holds the whole set).

    Physical shape: one distinct hash agg (map-side combined — the
    shuffle carries one row per distinct (group, value)), then one
    bounded per-group ranked window over the DISTINCT relation (input
    is vocabulary-sized, never corpus-sized). For extreme per-group
    cardinality, two-level salted bottom-k (per (group, salt) first,
    k×n_salts rows to the final pass) keeps every sort input bounded —
    same merge-of-partials shape as the HLL path. The fraction uses the
    first 15 hex digits (60 bits) so it is exact in a double ULP-for-ULP
    across engines.

    Output: (group_cols..., exact_distinct, k_used, est_distinct,
    rel_err) — rel_err = est/exact - 1, the tuning diagnostic for k.
    """
    from pyspark.sql import Window as W

    gcols = list(group_cols)
    # cast('string') matches the salted/union twins (and the VARCHAR
    # the oracle hashes), so all three forms accept the same inputs
    d = df.select(
        *gcols, F.md5(F.col(value_col).cast("string")).alias("__h")
    ).distinct()
    w = W.partitionBy(*gcols).orderBy("__h")
    r = (
        d.withColumn("__rn", F.row_number().over(w))
        .withColumn("__nd", F.count("*").over(W.partitionBy(*gcols)))
        .filter(F.col("__rn") <= int(k))
    )
    frac = F.conv(F.substring("__h", 1, 15), 16, 10).cast("double") / F.lit(
        float(16**15)
    )
    est = F.when(
        F.col("__nd") <= int(k), F.col("__nd").cast("double")
    ).otherwise(F.lit(float(k - 1)) / frac)
    kth = r.filter(
        (F.col("__rn") == int(k)) | (F.col("__rn") == F.col("__nd"))
    ).filter(F.col("__rn") == F.least(F.lit(int(k)), F.col("__nd")))
    return kth.select(
        *gcols,
        F.col("__nd").alias("exact_distinct"),
        F.least(F.lit(int(k)), F.col("__nd")).cast("bigint").alias("k_used"),
        est.alias("est_distinct"),
        (est / F.col("__nd").cast("double") - F.lit(1.0)).alias("rel_err"),
    )


def kmv_distinct_salted(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
    n_salts: int = 8,
) -> DataFrame:
    """Two-level SALTED bottom-k — the extreme-cardinality form the
    ``kmv_distinct`` docstring documents, made concrete: phase 1 ranks
    within (group, salt) where the salt is the hash's LAST hex digit
    mod ``n_salts`` (hash-derived → deterministic; independent of the
    ordering prefix), so every ranked-window sort input is a
    ~1/n_salts slice of the group's distinct hashes — a group with a
    billion distinct values never funnels through one sort task.
    Phase 2 merges the ≤ k×n_salts survivors per group and re-takes
    the bottom k (a bounded window). Exact by pigeonhole: each of the
    group's k smallest hashes ranks ≤ k inside its own salt slice, so
    the merge reproduces the direct sketch — the output is
    BIT-IDENTICAL to ``kmv_distinct`` (same estimator, same exact
    branch off the true nd, which comes from a map-side-combinable
    count agg, not a window), asserted in tests and proven to the
    driver by sharing the direct form's oracle SQL.

    Output: identical schema and values to ``kmv_distinct``.
    """
    from pyspark.sql import Window as W

    gcols = list(group_cols)
    d = df.select(
        *gcols, F.md5(F.col(value_col).cast("string")).alias("__h")
    ).distinct()
    salt = (
        F.conv(F.substring("__h", 32, 1), 16, 10).cast("int") % int(n_salts)
    )
    w1 = W.partitionBy(*gcols, "__salt").orderBy("__h")
    phase1 = (
        d.withColumn("__salt", salt)
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= int(k))
        .drop("__rn", "__salt")
    )
    nd = d.groupBy(*gcols).agg(F.count("*").alias("__nd"))
    w2 = W.partitionBy(*gcols).orderBy("__h")
    r = (
        phase1.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= int(k))
        .join(nd, gcols)
    )
    frac = F.conv(F.substring("__h", 1, 15), 16, 10).cast("double") / F.lit(
        float(16**15)
    )
    est = F.when(
        F.col("__nd") <= int(k), F.col("__nd").cast("double")
    ).otherwise(F.lit(float(k - 1)) / frac)
    kth = r.filter(F.col("__rn") == F.least(F.lit(int(k)), F.col("__nd")))
    return kth.select(
        *gcols,
        F.col("__nd").alias("exact_distinct"),
        F.least(F.lit(int(k)), F.col("__nd")).cast("bigint").alias("k_used"),
        est.alias("est_distinct"),
        (est / F.col("__nd").cast("double") - F.lit(1.0)).alias("rel_err"),
    )


def kmv_union(
    df: DataFrame,
    fine_cols: Sequence[str],
    coarse_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Mergeable KMV rollup — bottom-k sketches built per FINE group
    (per partition/day in production), merged UP to the coarse group,
    then estimated. The merge is exact by pigeonhole: every one of the
    coarse group's k smallest hashes ranks ≤ k inside its own fine
    group, so the union of fine bottom-k sets CONTAINS the coarse
    bottom-k — re-taking the k smallest of the merged set reproduces
    the direct coarse sketch bit-for-bit. That is the correctness
    contract the driver hash-checks: the SQL oracle computes the
    DIRECT coarse sketch; this operator computes the two-level merge;
    equality is the mergeability proof.

    One estimator boundary differs from ``kmv_distinct`` by design:
    the merged set cannot distinguish nd == k from nd > k (both leave
    exactly k survivors), so the exact branch is ``merged < k``
    (strict) and nd == k uses the (k-1)/h_k estimator — the same rule
    on both engines. exact_distinct/rel_err remain free diagnostics
    off the distinct relation; a 100 TB run drops them and keeps only
    the fine sketches (k rows per fine group — reusable for ANY
    coarser rollup without rescanning).

    Output: (coarse_cols..., exact_distinct, k_used, est_distinct,
    rel_err) — the ``kmv_distinct`` schema.
    """
    from pyspark.sql import Window as W

    gfine = list(fine_cols)
    gcoarse = list(coarse_cols)
    d = df.select(
        *gfine, F.md5(F.col(value_col).cast("string")).alias("__h")
    ).distinct()
    w_f = W.partitionBy(*gfine).orderBy("__h")
    bk_fine = d.withColumn("__rn", F.row_number().over(w_f)).filter(
        F.col("__rn") <= int(k)
    )
    merged = bk_fine.select(*gcoarse, "__h").distinct()
    w_c = W.partitionBy(*gcoarse).orderBy("__h")
    r = merged.withColumn("__rn", F.row_number().over(w_c)).withColumn(
        "__nm", F.count("*").over(W.partitionBy(*gcoarse))
    )
    frac = F.conv(F.substring("__h", 1, 15), 16, 10).cast("double") / F.lit(
        float(16**15)
    )
    est = F.when(
        F.col("__nm") < int(k), F.col("__nm").cast("double")
    ).otherwise(F.lit(float(k - 1)) / frac)
    kth = r.filter(F.col("__rn") == F.least(F.lit(int(k)), F.col("__nm")))
    exact = (
        df.select(*gcoarse, F.col(value_col).cast("string").alias("__v"))
        .distinct()
        .groupBy(*gcoarse)
        .agg(F.count("*").alias("exact_distinct"))
    )
    return kth.join(exact, gcoarse).select(
        *gcoarse,
        "exact_distinct",
        F.least(F.lit(int(k)), F.col("__nm")).cast("bigint").alias("k_used"),
        est.alias("est_distinct"),
        (est / F.col("exact_distinct").cast("double") - F.lit(1.0)).alias(
            "rel_err"
        ),
    )


def _md5_rho(h_col: str, window_start: int, window_hex: int = 15):
    """rho = 1 + number of leading zero BITS of a hex window of the md5
    digest column named ``h_col`` — the HLL register observable —
    computed with string ops only (no log2, whose libm rounding differs
    across engines): count leading '0' hex chars, then the leading-zero
    bits of the first nonzero nibble by CASE. All-zero window →
    4*window_hex + 1."""
    trimmed = F.expr(
        f"trim(LEADING '0' FROM substring({h_col}, {window_start}, {window_hex}))"
    )
    z_chars = F.lit(window_hex) - F.length(trimmed)
    first = F.substring(trimmed, 1, 1)
    nibble_bits = (
        F.when(first.isin(*"89abcdef"), 4)
        .when(first.isin(*"4567"), 3)
        .when(first.isin("2", "3"), 2)
        .when(first == "1", 1)
        .otherwise(0)
    )
    return F.when(
        F.length(trimmed) == 0, F.lit(4 * window_hex + 1)
    ).otherwise(4 * z_chars + (4 - nibble_bits) + 1)


_HLL_P = 8  # 2^8 = 256 registers
_HLL_RHO_CAP = 30  # register cap keeps the scaled harmonic sum exact


def _check_hll_params(p: int, rho_cap: int) -> None:
    """Fail loudly on parameter shapes the md5-HLL math silently
    corrupts: the bucket is carved as whole hex digits (p // 4), so a
    p that is not a multiple of 4 would use fewer bucket bits than
    m = 2^p assumes, counting phantom empty registers and collapsing
    the estimate; the scaled harmonic sum needs 1 <= rho_cap and
    p + rho_cap < 62 to stay an exact bigint (sum <= m * 2^cap)."""
    if p % 4 != 0 or p <= 0:
        raise ValueError(f"hll p must be a positive multiple of 4, got {p}")
    if not (1 <= rho_cap and p + rho_cap < 62):
        raise ValueError(
            f"hll rho_cap out of range (need 1 <= rho_cap, p + rho_cap < 62):"
            f" p={p}, rho_cap={rho_cap}"
        )


def _hll_alpha_m2_scaled(m: int, cap: int) -> float:
    """alpha_m * m^2 * 2^cap as ONE Python double, inlined as a literal
    on both engines so the only runtime float op is a single division.
    (alpha_m = 0.7213/(1 + 1.079/m), the standard HLL constant for
    m >= 128; Flajolet et al. 2007.)"""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(2**cap)


def hll_distinct_md5(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    p: int = _HLL_P,
    rho_cap: int = _HLL_RHO_CAP,
) -> DataFrame:
    """Deterministic md5 HyperLogLog — the hash-oracle-checked twin of
    ``hll_distinct`` (the seeded DataSketches aggregate stays the
    library API; its registers aren't reproducible in set-oriented
    SQL). Registers: bucket = first ``p`` bits of md5, register value
    M_j = max rho (leading-zero run of the next 60-bit window, +1),
    capped at ``rho_cap``. Raw estimate alpha_m * m^2 / sum 2^-M_j —
    the harmonic sum is kept EXACT by scaling to integers
    (sum of 2^(cap - M_j), a bigint <= m * 2^cap < 2^38 for the
    defaults, hence exact in the final double division too). No
    small-range linear-counting branch: it needs ln(), whose libm
    rounding differs across engines — the raw estimator's bias below
    ~2.5m distincts is the documented trade for bit-exact portability.
    The rho cap only biases beyond ~2^cap distincts per register
    (~10^11 * m) — far past any fixture.

    Physical shape: one distinct hash agg (map-side combined), one
    (group, bucket) max agg, one per-group sum — shuffles carry the
    vocabulary then m rows per group, never the corpus. The
    ``exact_distinct``/``rel_err`` columns are free off the distinct
    relation and are the error diagnostic; a 100 TB run drops them.

    Output: (group_cols..., exact_distinct, est_distinct, rel_err).
    """
    _check_hll_params(p, rho_cap)
    gcols = list(group_cols)
    m = 1 << p
    d = df.select(
        *gcols, F.col(value_col).cast("string").alias("__v")
    ).distinct()
    hh = d.select(*gcols, F.md5("__v").alias("__h"))
    bucket_hex = p // 4
    bucket = F.conv(F.substring("__h", 1, bucket_hex), 16, 10).cast("int")
    rho = _md5_rho("__h", bucket_hex + 1)
    reg = (
        hh.select(*gcols, bucket.alias("__b"), F.least(rho, F.lit(rho_cap)).alias("__r"))
        .groupBy(*gcols, "__b")
        .agg(F.max("__r").alias("__m"))
    )
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {rho_cap} - __m)")
    per_g = reg.groupBy(*gcols).agg(
        F.sum(term).alias("__s_present"), F.count("*").alias("__nb")
    )
    s = F.col("__s_present") + (F.lit(m) - F.col("__nb")) * F.lit(
        1 << rho_cap
    ).cast("bigint")
    est = F.lit(_hll_alpha_m2_scaled(m, rho_cap)) / s.cast("double")
    exact = d.groupBy(*gcols).agg(F.count("*").alias("exact_distinct"))
    return (
        per_g.join(exact, gcols)
        .select(
            *gcols,
            "exact_distinct",
            est.alias("est_distinct"),
            (est / F.col("exact_distinct").cast("double") - F.lit(1.0)).alias(
                "rel_err"
            ),
        )
    )


def hll_union_md5(
    df: DataFrame,
    fine_cols: Sequence[str],
    coarse_cols: Sequence[str],
    value_col: str,
    p: int = _HLL_P,
    rho_cap: int = _HLL_RHO_CAP,
) -> DataFrame:
    """Mergeability demo on the deterministic HLL twin: registers are
    built per FINE group (per partition/day in production), then
    merged UP to the coarse group by register-wise max — the sketch
    union — and only then estimated. max is associative/idempotent, so
    the merge is exactly as cheap and exact as building coarse
    registers directly (asserted equal in tests); what the two-level
    form buys at 100 TB is reuse: the fine sketches (m rows per fine
    group) serve ANY coarser rollup without rescanning the corpus.

    Output: (coarse_cols..., exact_distinct, est_distinct, rel_err).
    """
    _check_hll_params(p, rho_cap)
    gfine = list(fine_cols)
    gcoarse = list(coarse_cols)
    m = 1 << p
    d = df.select(
        *gfine, F.col(value_col).cast("string").alias("__v")
    ).distinct()
    hh = d.select(*gfine, F.md5("__v").alias("__h"))
    bucket_hex = p // 4
    bucket = F.conv(F.substring("__h", 1, bucket_hex), 16, 10).cast("int")
    rho = _md5_rho("__h", bucket_hex + 1)
    reg_fine = (
        hh.select(
            *gfine, bucket.alias("__b"), F.least(rho, F.lit(rho_cap)).alias("__r")
        )
        .groupBy(*gfine, "__b")
        .agg(F.max("__r").alias("__m"))
    )
    reg_coarse = reg_fine.groupBy(*gcoarse, "__b").agg(
        F.max("__m").alias("__m")
    )
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {rho_cap} - __m)")
    per_g = reg_coarse.groupBy(*gcoarse).agg(
        F.sum(term).alias("__s_present"), F.count("*").alias("__nb")
    )
    s = F.col("__s_present") + (F.lit(m) - F.col("__nb")) * F.lit(
        1 << rho_cap
    ).cast("bigint")
    est = F.lit(_hll_alpha_m2_scaled(m, rho_cap)) / s.cast("double")
    exact = (
        d.select(*gcoarse, "__v")
        .distinct()
        .groupBy(*gcoarse)
        .agg(F.count("*").alias("exact_distinct"))
    )
    return per_g.join(exact, gcoarse).select(
        *gcoarse,
        "exact_distinct",
        est.alias("est_distinct"),
        (est / F.col("exact_distinct").cast("double") - F.lit(1.0)).alias(
            "rel_err"
        ),
    )


# quantile fractions as integer (numerator, denominator) pairs so the
# rank boundary ceil(n * num / den) never depends on a decimal literal
QUANTILE_FRACTIONS = ((50, 100), (95, 100), (99, 100))


def sampled_quantiles_md5(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    key_col: str,
    fractions: Sequence[tuple] = QUANTILE_FRACTIONS,
    mod: int = 8,
) -> DataFrame:
    """Deterministic sampled-quantile sketch — the hash-oracle-checked
    twin of ``kll_quantiles`` (the DataSketches KLL aggregate stays the
    library API; its compactor layout isn't SQL-reproducible). The
    'sketch' is a deterministic md5 row sample: keep rows whose
    md5(key) bucket ≡ 0 (mod ``mod``) — a uniform 1/mod sample that is
    partitioning- and engine-independent, unlike ``df.sample`` — then
    take EXACT lower quantiles of the sample: value at rank
    ceil(n * num / den) in the per-group value order. The sample is
    hashed on the row KEY (never the double value — float→string
    formatting differs across engines).

    The rank arithmetic is n*num (exact in a double far past 2^40
    rows) divided by den and ceil'd — correctly-rounded IEEE ops, so
    both engines select the same rank. Sample size is the error knob
    exactly like KLL's k (ε ~ 1/sqrt(n/mod) per the DKW bound).

    Output: (group_cols..., n_sampled, p50, p95, p99) — one column per
    fraction, named p<100*num/den>.
    """
    from pyspark.sql import Window as W

    gcols = list(group_cols)
    keep = (
        F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10
        ).cast("bigint")
        % mod
        == 0
    )
    s = df.filter(keep).select(*gcols, F.col(value_col).alias("__v"))
    w = W.partitionBy(*gcols).orderBy("__v")
    r = s.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count("*").over(W.partitionBy(*gcols))
    )
    aggs = [F.max("__n").alias("n_sampled")]
    for num, den in fractions:
        rank = F.ceil(
            (F.col("__n") * F.lit(int(num))).cast("double") / F.lit(float(den))
        ).cast("bigint")
        label = f"p{100 * num // den}"
        aggs.append(
            F.min(F.when(F.col("__rn") == rank, F.col("__v"))).alias(label)
        )
    return r.groupBy(*gcols).agg(*aggs)


def kmv_theta_overlap(
    df: DataFrame,
    part_col: str,
    key_col: str,
    part_a,
    part_b,
    k: int = 64,
) -> DataFrame:
    """Deterministic bottom-k set algebra — the hash-oracle-checked
    twin of ``theta_overlap`` (the DataSketches theta pipeline stays
    the library API). This IS the theta-sketch construction with the
    md5 hash family: per side, the k smallest md5 hashes of the
    distinct keys; θ_side = 1.0 when the side is exact (≤ k distinct)
    else the k-th hash mapped to (0,1); θ = min(θ_a, θ_b); both
    bottom-k sets are cut back to hashes < θ and intersected/differenced
    as plain sets, estimates = count/θ (Dasgupta et al. 2016, the KMV
    form of theta set operations). Every per-side estimate uses the
    same (k-1)/θ_side estimator as ``kmv_distinct``. floor() before the
    bigint cast on BOTH engines — DuckDB's double→bigint CAST rounds
    while Spark's truncates (the r3 dtype lesson).

    Physical shape: one distinct hash agg over the two partitions, one
    bounded per-side ranked window (input = the distinct key sets), then
    KB-scale bottom-k frames: the θ scalar broadcast and the set
    join/anti-join touch ≤ 2k rows regardless of corpus size.

    Output: one row (n_a, n_b, n_intersection, n_only_a) — estimates
    as bigints.
    """
    from pyspark.sql import Window as W

    d = (
        df.filter(F.col(part_col).isin(part_a, part_b))
        .select(
            F.col(part_col).alias("__p"),
            F.md5(F.col(key_col).cast("string")).alias("__h"),
        )
        .distinct()
    )
    w = W.partitionBy("__p").orderBy("__h")
    r = d.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__nd", F.count("*").over(W.partitionBy("__p"))
    )
    bk = r.filter(F.col("__rn") <= int(k))
    frac = F.conv(F.substring("__h", 1, 15), 16, 10).cast("double") / F.lit(
        float(16**15)
    )
    stats = (
        bk.filter(F.col("__rn") == F.least(F.lit(int(k)), F.col("__nd")))
        .select(
            "__p",
            "__nd",
            F.when(F.col("__nd") <= int(k), F.lit(1.0))
            .otherwise(frac)
            .alias("__theta_side"),
        )
    )
    sa = stats.filter(F.col("__p") == part_a).select(
        F.col("__nd").alias("__nd_a"), F.col("__theta_side").alias("__th_a")
    )
    sb = stats.filter(F.col("__p") == part_b).select(
        F.col("__nd").alias("__nd_b"), F.col("__theta_side").alias("__th_b")
    )
    theta = sa.crossJoin(sb).select(
        "__nd_a",
        "__nd_b",
        "__th_a",
        "__th_b",
        F.least("__th_a", "__th_b").alias("__theta"),
    )

    def side_est(nd, th):
        return F.when(nd <= int(k), nd.cast("double")).otherwise(
            F.floor(F.lit(float(k - 1)) / th)
        ).cast("bigint")

    ka = bk.filter(F.col("__p") == part_a).select(
        F.col("__h").alias("__ha"), frac.alias("__fa")
    )
    kb = bk.filter(F.col("__p") == part_b).select(
        F.col("__h").alias("__hb"), frac.alias("__fb")
    )
    # cut both retained sets back to hashes strictly below θ (θ ≤ each
    # side's own threshold, so this only ever shrinks the bottom-k set)
    ka_cut = ka.crossJoin(F.broadcast(theta.select("__theta"))).filter(
        F.col("__fa") < F.col("__theta")
    )
    kb_cut = kb.crossJoin(F.broadcast(theta.select("__theta"))).filter(
        F.col("__fb") < F.col("__theta")
    )
    inter = ka_cut.join(
        kb_cut.select("__hb"), F.col("__ha") == F.col("__hb")
    ).agg(F.count("*").alias("__n_inter"))
    only_a = ka_cut.join(
        kb_cut.select("__hb"),
        F.col("__ha") == F.col("__hb"),
        "left_anti",
    ).agg(F.count("*").alias("__n_only"))
    return (
        theta.crossJoin(inter)
        .crossJoin(only_a)
        .select(
            side_est(F.col("__nd_a"), F.col("__th_a")).alias("n_a"),
            side_est(F.col("__nd_b"), F.col("__th_b")).alias("n_b"),
            F.floor(F.col("__n_inter").cast("double") / F.col("__theta"))
            .cast("bigint")
            .alias("n_intersection"),
            F.floor(F.col("__n_only").cast("double") / F.col("__theta"))
            .cast("bigint")
            .alias("n_only_a"),
        )
    )


def kll_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probs: Sequence[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Approximate quantiles per group via a KLL sketch (DataSketches):
    fixed-size mergeable state per group, so percentiles over 100 TB
    are one partial→final pass — and per-partition/day sketches can be
    merged later (``kll_merge_agg_double``) like the HLL rollup."""
    sk = F.kll_sketch_agg_double(F.col(value_col).cast("double"))
    qs = F.kll_sketch_get_quantile_double(
        sk, F.array(*[F.lit(float(p)) for p in probs])
    )
    out = df.groupBy(*group_cols).agg(qs.alias("__qs"))
    cols = [F.col("__qs").getItem(i).alias(f"p{int(p * 100)}") for i, p in enumerate(probs)]
    return out.select(*group_cols, *cols)


def theta_overlap(
    df: DataFrame,
    part_col: str,
    key_col: str,
    part_a,
    part_b,
) -> DataFrame:
    """Set algebra on sketches: estimate |A|, |B|, |A∩B|, |A\\B| of the
    distinct ``key_col`` sets of two partitions without materializing
    either set — theta sketches support intersection/difference, which
    HLL cannot. The audience-overlap / leakage-check primitive: at
    100 TB each side reduces to a KB-scale sketch before they meet."""
    sk = df.groupBy(part_col).agg(F.theta_sketch_agg(key_col).alias("sk"))
    a = sk.filter(F.col(part_col) == part_a).select(F.col("sk").alias("sk_a"))
    b = sk.filter(F.col(part_col) == part_b).select(F.col("sk").alias("sk_b"))
    j = a.crossJoin(b)
    return j.select(
        F.theta_sketch_estimate("sk_a").cast("bigint").alias("n_a"),
        F.theta_sketch_estimate("sk_b").cast("bigint").alias("n_b"),
        F.theta_sketch_estimate(
            F.theta_intersection("sk_a", "sk_b")
        ).cast("bigint").alias("n_intersection"),
        F.theta_sketch_estimate(
            F.theta_difference("sk_a", "sk_b")
        ).cast("bigint").alias("n_only_a"),
    )


def approx_distinct(
    df: DataFrame, group_cols: Sequence[str], value_col: str, rsd: float = 0.05
) -> DataFrame:
    """HLL++ variant (``approx_count_distinct``) — the one-shot form
    when no sketch reuse is needed."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd).alias("approx_distinct")
    )


def count_min_counters(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Count-Min sketch counter table (Cormode & Muthukrishnan 2005):
    ``depth`` hash rows × ``width`` counters, hashes derived from md5
    hex (h_j(key) = int(md5(j || '|' || key)[:4], 16) % width) —
    deterministic and engine-portable, no seed state.

    Physical shape: the key column explodes into ``depth`` (row, bucket)
    cells, then ONE hash aggregation — map-side combine collapses every
    partition to ≤ depth×width cells before the shuffle, so at 100 TB
    the shuffle moves O(depth·width·n_partitions) counters, never rows.
    The counter table IS the mergeable sketch: counters from two
    corpora add cell-wise.

    Output: (j, bucket, cnt), at most depth×width rows.
    """
    k = F.col(key_col).cast("string")
    cells = F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            (F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}|"), k)), 1, 4), 16, 10)
             .cast("bigint") % width).alias("bucket"),
        )
        for j in range(depth)
    ])
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 64
) -> DataFrame:
    """Point-query every distinct key against the Count-Min counters:
    estimate = min over the ``depth`` rows of the key's counter. The
    CMS guarantee (est ≥ exact, with bounded overestimate) is exposed
    by returning the exact count alongside.

    The counter table (≤ depth×width rows) broadcasts to the distinct-
    key probe join — the big side never shuffles.

    Output: (key, exact_cnt, cms_estimate, overestimate).
    """
    counters = count_min_counters(df, key_col, depth, width)
    exact = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("exact_cnt")
    )
    probes = exact.select(
        "key",
        "exact_cnt",
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("j"),
                (F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{j}|"), F.col("key").cast("string"))), 1, 4),
                    16, 10,
                ).cast("bigint") % width).alias("bucket"),
            )
            for j in range(depth)
        ])).alias("c"),
    ).select("key", "exact_cnt", F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("key", "exact_cnt")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            "key",
            "exact_cnt",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_cnt")).alias("overestimate"),
        )
    )


def bloom_bits(
    df: DataFrame, key_col: str, k: int = 3, m: int = 4096
) -> DataFrame:
    """The set-bit positions of a Bloom filter over ``key_col``
    (Bloom 1970): ``k`` md5-derived bit positions per key
    (bit_i(key) = int(md5(i || '|' || key)[:5], 16) % m), distinct —
    at most ``m`` rows regardless of input size. Mergeable: bit sets
    from two corpora union.

    Same explode → distinct shape as count_min_counters: map-side
    distinct collapses each partition to ≤ m positions pre-shuffle.
    """
    key = F.col(key_col).cast("string")
    bits = F.array(*[
        (F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}|"), key)), 1, 5), 16, 10)
         .cast("bigint") % m).alias(f"b{i}")
        for i in range(k)
    ])
    return df.select(F.explode(bits).alias("bit")).distinct()


def bloom_probe(
    build_df: DataFrame,
    probe_df: DataFrame,
    build_key: str,
    probe_key: str,
    k: int = 3,
    m: int = 4096,
) -> DataFrame:
    """Probe every key of ``probe_df`` against the Bloom filter built
    from ``build_df``: member ⇔ all ``k`` bit positions are set. No
    false negatives; false positives at the classic
    (1 − e^{−kn/m})^k rate — returned explicitly alongside exact
    membership so the caller sees them.

    The bit set (≤ m rows ≈ KBs) broadcasts; the probe side computes
    its k positions in-row and left-joins — at 100 TB this is the
    join-pruning pattern: discard probe rows that cannot match before
    the expensive join.

    Output: (key, bloom_member, actual_member, false_positive) —
    flags as bigint 0/1.
    """
    bits = bloom_bits(build_df, build_key, k, m)
    probes = probe_df.select(F.col(probe_key).alias("key")).distinct().select(
        "key",
        F.explode(F.array(*[
            (F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}|"), F.col("key").cast("string"))), 1, 5), 16, 10)
             .cast("bigint") % m)
            for i in range(k)
        ])).alias("bit"),
    )
    matched = (
        probes.join(F.broadcast(bits.withColumn("__set", F.lit(1))), "bit", "left")
        .groupBy("key")
        .agg((F.count("__set") == k).cast("bigint").alias("bloom_member"))
    )
    actual = build_df.select(
        F.col(build_key).alias("key"), F.lit(1).alias("__in")
    ).distinct()
    return (
        matched.join(actual, "key", "left")
        .select(
            "key",
            "bloom_member",
            F.when(F.col("__in").isNotNull(), 1).otherwise(0).cast("bigint").alias("actual_member"),
        )
        .withColumn(
            "false_positive",
            ((F.col("bloom_member") == 1) & (F.col("actual_member") == 0)).cast("bigint"),
        )
    )


def count_min_merge(
    df: DataFrame,
    key_col: str,
    split_col: str,
    depth: int = 4,
    width: int = 64,
) -> DataFrame:
    """Count-Min mergeability, made a checkable equality: build one
    counter table per ``split_col`` partition (per day/source/shard in
    production), then MERGE by cell-wise addition — counters are
    linear, so the merged table equals the direct whole-corpus table
    bit-for-bit (the catalog entry shares the direct form's oracle as
    the equivalence proof, like ``sketch_kmv_salted``). This is the
    sketch-rollup pattern for frequency: per-partition CMS tables are
    KB-scale artifacts that answer heavy-hitter queries over ANY union
    of partitions without rescanning.

    Output: (j, bucket, cnt) — identical to ``count_min_counters`` on
    the whole frame.
    """
    # per-partition counters: the same cell explosion keyed by part,
    # then the merge is one more hash agg summing cells across parts
    k = F.col(key_col).cast("string")
    cells = F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            (F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}|"), k)), 1, 4), 16, 10)
             .cast("bigint") % width).alias("bucket"),
        )
        for j in range(depth)
    ])
    fine = (
        df.select(F.col(split_col).alias("__p"), F.explode(cells).alias("c"))
        .groupBy("__p", F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    return fine.groupBy("j", "bucket").agg(F.sum("cnt").cast("bigint").alias("cnt"))


def bloom_union(
    build_df: DataFrame,
    probe_df: DataFrame,
    build_key: str,
    probe_key: str,
    split_col: str,
    k: int = 3,
    m: int = 4096,
) -> DataFrame:
    """Bloom mergeability: build one bit set per ``split_col``
    partition of the build side, union the BIT SETS (set union — the
    Bloom merge), then probe. Union of per-partition filters equals the
    filter of the union by construction, so the probe output is
    bit-identical to ``bloom_probe`` on the whole build side (shared
    oracle = the proof). The production shape: per-shard filters are
    tiny reusable artifacts; any subset of shards probes without a
    rebuild.

    Output: identical schema to ``bloom_probe``.
    """
    key = F.col(build_key).cast("string")
    bits = F.array(*[
        (F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}|"), key)), 1, 5), 16, 10)
         .cast("bigint") % m)
        for i in range(k)
    ])
    fine = (
        build_df.select(F.col(split_col).alias("__p"), F.explode(bits).alias("bit"))
        .distinct()
    )
    merged_bits = fine.select("bit").distinct()
    probes = probe_df.select(F.col(probe_key).alias("key")).distinct().select(
        "key",
        F.explode(F.array(*[
            (F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}|"), F.col("key").cast("string"))), 1, 5), 16, 10)
             .cast("bigint") % m)
            for i in range(k)
        ])).alias("bit"),
    )
    matched = (
        probes.join(F.broadcast(merged_bits.withColumn("__set", F.lit(1))), "bit", "left")
        .groupBy("key")
        .agg((F.count("__set") == k).cast("bigint").alias("bloom_member"))
    )
    actual = build_df.select(
        F.col(build_key).alias("key"), F.lit(1).alias("__in")
    ).distinct()
    return (
        matched.join(actual, "key", "left")
        .select(
            "key",
            "bloom_member",
            F.when(F.col("__in").isNotNull(), 1).otherwise(0).cast("bigint").alias("actual_member"),
        )
        .withColumn(
            "false_positive",
            ((F.col("bloom_member") == 1) & (F.col("actual_member") == 0)).cast("bigint"),
        )
    )
