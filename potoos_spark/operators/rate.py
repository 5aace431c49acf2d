"""Counter/rate and time-weighted bucket operators (extension tier —
no reference file:line; the TimescaleDB ``time_weight`` / PromQL
``increase``/``rate`` family, rebuilt set-oriented for many series).

Physical shape for 100 TB: both operators are ONE window sort per
series (the lag/lead over (series_key, ts)) followed by a hash
aggregation whose partial combines map-side — the shuffle carries one
row per (series, bucket), never the raw points. No Python in the path.

Exactness: every accumulation happens in DECIMAL (the synthetic data
carries two fractional digits, so decimal casts are lossless); doubles
appear only in the final division, which is correctly rounded and
hence bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .retrieval import bucket_start

DEC = "decimal(18,2)"


def _dec(col) -> F.Column:
    return (F.col(col) if isinstance(col, str) else col).cast(DEC)


def time_weighted_avg(
    df: DataFrame, bucket_ms: int, offset_ms: int = 0
) -> DataFrame:
    """Per-bucket time-weighted average under LOCF (last-observation-
    carried-forward) weighting: each point's value holds until the next
    point *in the same bucket*, and

        twa = sum(v_i * (t_{i+1} - t_i)) / (t_last - t_first)

    over the bucket's points. Buckets whose points span zero time (a
    single point, or all points at one timestamp) yield their earliest
    point's value. Segments do not cross bucket boundaries, so every
    bucket is computable from its own partition slice — the operator
    scales embarrassingly.

    Output: (series_key, ts_ms, value) — drop-in for the A1-A12 bucket
    aggregator family.
    """
    b = bucket_start(F.col("ts_ms"), int(bucket_ms), int(offset_ms))
    tie = F.col("seq") if "seq" in df.columns else F.col("value")
    staged = df.select(
        "series_key", "ts_ms", "value", tie.alias("__tie"), b.alias("__bucket")
    )
    w = W.partitionBy("series_key", "__bucket").orderBy("ts_ms", "__tie")
    nxt = F.lead("ts_ms").over(w)
    seg = staged.withColumn(
        "__w", _dec("value") * (nxt - F.col("ts_ms")).cast("bigint")
    )
    g = seg.groupBy("series_key", F.col("__bucket").alias("ts_ms")).agg(
        F.sum("__w").alias("s"),
        F.min("ts_ms").alias("t0"),
        F.max("ts_ms").alias("t1"),
        F.min_by("value", F.struct("ts_ms", "__tie")).alias("v0"),
    )
    value = F.when(
        F.col("t1") > F.col("t0"),
        F.col("s").cast("double") / (F.col("t1") - F.col("t0")).cast("double"),
    ).otherwise(F.col("v0"))
    return g.select("series_key", "ts_ms", value.cast("double").alias("value"))


def heartbeat_sla(df: DataFrame, heartbeat_ms: int) -> DataFrame:
    """Per-series availability summary from heartbeat gaps: a series is
    'down' whenever the spacing between consecutive points exceeds
    ``heartbeat_ms``, and the downtime charged for such a gap is the
    excess beyond the interval (the allowance covers normal spacing).
    ``uptime_ratio = 1 - downtime/span`` — the availability number an
    on-call dashboard shows next to the value-based detectors.

    Physical shape: the same single lag-window sort per series as the
    gap watchdog (`catalog/timeseries.ts_gap_detect`), then ONE
    map-side-combinable hash agg — the shuffle carries one row per
    series. Integer ms arithmetic end to end; the uptime ratio is the
    only float op (a single division), so the result is bit-stable
    across engines and partitionings. Single-point series have no gaps:
    0 violations, 0 downtime, NULL ratio (zero span).

    Output: (series_key, span_ms, n_points, n_violations, downtime_ms,
    uptime_ratio).
    """
    if "seq" in df.columns:
        tie = F.col("seq")
    elif "value" in df.columns:
        tie = F.col("value")
    else:
        raise ValueError(
            "heartbeat_sla needs a deterministic tie-break column for "
            "equal timestamps: expected 'seq' (preferred) or 'value' in "
            f"the input, got {df.columns}"
        )
    staged = df.select("series_key", "ts_ms", tie.alias("__tie"))
    w = W.partitionBy("series_key").orderBy("ts_ms", "__tie")
    gap = F.lead("ts_ms").over(w) - F.col("ts_ms")
    g = staged.select("series_key", "ts_ms", gap.alias("__gap"))
    agg = g.groupBy("series_key").agg(
        (F.max("ts_ms") - F.min("ts_ms")).alias("span_ms"),
        F.count("*").alias("n_points"),
        F.sum(
            (F.col("__gap") > heartbeat_ms).cast("bigint")
        ).alias("n_violations"),
        F.sum(
            F.greatest(F.col("__gap") - heartbeat_ms, F.lit(0))
        ).alias("downtime_ms"),
    )
    ratio = F.when(
        F.col("span_ms") > 0,
        F.lit(1.0)
        - F.col("downtime_ms").cast("double") / F.col("span_ms").cast("double"),
    )
    return agg.select(
        "series_key",
        "span_ms",
        "n_points",
        F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        F.coalesce("downtime_ms", F.lit(0)).alias("downtime_ms"),
        ratio.alias("uptime_ratio"),
    )


def counter_rate(df: DataFrame, bucket_ms: int, offset_ms: int = 0) -> DataFrame:
    """Reset-aware counter increase and rate per bucket (PromQL
    ``increase``/``rate`` semantics): per series, each point contributes

        inc_i = v_i - v_{i-1}   if v_i >= v_{i-1}   (monotone step)
                v_i             otherwise           (counter reset to 0)

    into the bucket of the *later* point; the series' first point
    contributes nothing. increase = sum(inc), rate = increase /
    bucket_seconds. Deltas are computed in DECIMAL (exact — no float
    accumulation anywhere).

    Output: (series_key, ts_ms, increase, rate_per_sec).
    """
    tie = F.col("seq") if "seq" in df.columns else F.col("value")
    staged = df.select("series_key", "ts_ms", "value", tie.alias("__tie"))
    w = W.partitionBy("series_key").orderBy("ts_ms", "__tie")
    prev = F.lag(_dec("value")).over(w)
    inc = F.when(prev.isNull(), F.lit(None).cast(DEC)).otherwise(
        F.when(_dec("value") >= prev, _dec("value") - prev).otherwise(_dec("value"))
    )
    b = bucket_start(F.col("ts_ms"), int(bucket_ms), int(offset_ms))
    g = (
        staged.withColumn("__inc", inc)
        .filter(F.col("__inc").isNotNull())
        .groupBy("series_key", b.alias("ts_ms"))
        .agg(F.sum("__inc").alias("s"))
    )
    return g.select(
        "series_key",
        "ts_ms",
        F.col("s").cast("double").alias("increase"),
        (F.col("s").cast("double") / F.lit(int(bucket_ms) / 1000.0)).alias(
            "rate_per_sec"
        ),
    )


def counter_resets(df: DataFrame, bucket_ms: int, offset_ms: int = 0) -> DataFrame:
    """Counter resets per bucket (PromQL ``resets``): per series, count
    the steps where the value DROPS (v_i < v_{i-1} in DECIMAL — exact
    comparison, no float), attributed to the bucket of the later point.
    Buckets whose points contain no drop report 0; the series' first
    point starts no step. The monitoring complement of ``counter_rate``:
    a restart storm shows up here even when the reset-corrected rate
    stays flat.

    One window pass + one hash aggregation, the same physical shape as
    ``counter_rate`` (sort within series reused by AQE when both run).

    Output: (series_key, ts_ms, n_steps, n_resets).
    """
    tie = F.col("seq") if "seq" in df.columns else F.col("value")
    staged = df.select("series_key", "ts_ms", "value", tie.alias("__tie"))
    w = W.partitionBy("series_key").orderBy("ts_ms", "__tie")
    prev = F.lag(_dec("value")).over(w)
    b = bucket_start(F.col("ts_ms"), int(bucket_ms), int(offset_ms))
    return (
        staged.withColumn("__drop", F.when(prev.isNull(), F.lit(None).cast("int"))
               .otherwise((_dec("value") < prev).cast("int")))
        .filter(F.col("__drop").isNotNull())
        .groupBy("series_key", b.alias("ts_ms"))
        .agg(
            F.count("*").alias("n_steps"),
            F.sum("__drop").cast("bigint").alias("n_resets"),
        )
    )


def irate(df: DataFrame, bucket_ms: int, offset_ms: int = 0) -> DataFrame:
    """Instantaneous rate per bucket (PromQL ``irate``): the rate of the
    LAST sample step ending in each bucket — reset-aware like
    ``counter_rate`` but using only the final delta, so spiky counters
    report their most recent behavior rather than the bucket average.

        irate = inc_last / ((t_last - t_prev) / 1000)

    where inc is v-v_prev (or v on reset) and prev is the previous
    sample of the series regardless of bucket. Zero-duration steps
    (duplicate timestamps) fall back to a 1s step like the derivative
    detector. One window sort + one ranked reduction per series.

    Output: (series_key, ts_ms = bucket start, irate_per_sec).
    """
    tie = F.col("seq") if "seq" in df.columns else F.col("value")
    staged = df.select("series_key", "ts_ms", "value", tie.alias("__tie"))
    w = W.partitionBy("series_key").orderBy("ts_ms", "__tie")
    pv = F.lag("value").over(w)
    pt = F.lag("ts_ms").over(w)
    b = bucket_start(F.col("ts_ms"), int(bucket_ms), int(offset_ms))
    d = staged.select(
        "series_key",
        "ts_ms",
        "value",
        "__tie",
        b.alias("__b"),
        pv.alias("__pv"),
        pt.alias("__pt"),
    )
    rank_w = W.partitionBy("series_key", "__b").orderBy(
        F.col("ts_ms").desc(), F.col("__tie").desc()
    )
    last = (
        d.withColumn("__rn", F.row_number().over(rank_w))
        .filter((F.col("__rn") == 1) & F.col("__pv").isNotNull())
    )
    # NB: __pv/__pt come from the point-level lag BEFORE the per-bucket
    # reduction, so the step may start in the previous bucket
    inc = F.when(
        F.col("value") >= F.col("__pv"), F.col("value") - F.col("__pv")
    ).otherwise(F.col("value"))
    dt_ms = F.col("ts_ms") - F.col("__pt")
    dt_sec = (
        F.when(dt_ms == 0, F.lit(1000)).otherwise(dt_ms).cast("double") / 1000.0
    )
    return last.select(
        "series_key",
        F.col("__b").alias("ts_ms"),
        (inc / dt_sec).alias("irate_per_sec"),
    )


def deriv_slope(df: DataFrame, bucket_ms: int, offset_ms: int = 0) -> DataFrame:
    """Per-bucket least-squares trend slope (PromQL ``deriv``): the
    simple-linear-regression slope of value over time within each
    (series, bucket),

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)    per second

    computed from DECIMAL sums of integer-offset timestamps (seconds
    relative to the bucket start — keeps magnitudes small and exact)
    and 2-decimal values, so both co-moments are exact and the single
    final division is the only float op. One map-side-combinable hash
    aggregation; buckets with < 2 distinct timestamps yield NULL.

    Output: (series_key, ts_ms, slope_per_sec).
    """
    b = bucket_start(F.col("ts_ms"), int(bucket_ms), int(offset_ms))
    staged = (
        df.select("series_key", "ts_ms", "value", b.alias("__b"))
        # integer ms offset within the bucket: small magnitudes, exact
        # bigint co-moments; the per-second unit change happens once at
        # the end (slope_per_ms * 1000)
        .withColumn("__t", (F.col("ts_ms") - F.col("__b")).cast("bigint"))
        .withColumn("__v", F.col("value").cast("decimal(18,2)"))
    )
    g = staged.groupBy("series_key", F.col("__b").alias("ts_ms")).agg(
        F.count("*").alias("n"),
        F.sum("__t").alias("sx"),
        F.sum("__v").alias("sy"),
        F.sum(F.col("__v") * F.col("__t")).alias("sxy"),
        F.sum(F.col("__t") * F.col("__t")).alias("sxx"),
        F.countDistinct("ts_ms").alias("nt"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return g.select(
        "series_key",
        "ts_ms",
        F.when(F.col("nt") >= 2, num / den * 1000.0).alias("slope_per_sec"),
    )


def rolling_quantiles(
    df: DataFrame,
    window_rows: int = 24,
    ps: tuple = (0.5, 0.95),
    round_digits: int = 9,
) -> DataFrame:
    """Per-series trailing exact quantiles — the rolling p50/p95
    baseline a monitoring system compares each new point against
    (the set-oriented form of a per-series percentile ring buffer).

    Exact linear-interpolation percentile over the trailing
    ``window_rows`` points (inclusive), one window sort per series —
    the sort is shared by all requested quantiles, so adding a p99
    costs no extra shuffle. Results round to ``round_digits`` so the
    interpolation arithmetic (lower + frac*(upper-lower)) is stable
    across engines regardless of their association order.

    At 100 TB the state per task is the trailing window only; the
    single (series_key, ts) sort is the same shuffle every other
    per-series window op here reuses.

    Output: (series_key, ts_ms, value, q50, q95, ...) — one qNN column
    per entry of ``ps``.
    """
    w = (
        W.partitionBy("series_key")
        .orderBy("ts_ms")
        .rowsBetween(-(int(window_rows) - 1), 0)
    )
    out = df.select("series_key", "ts_ms", "value")
    for p in ps:
        # full-precision name: q{p*100 with decimals when needed} — two
        # requested quantiles must never silently collapse into one
        # column (q95 vs q95_4 for p=0.95 vs 0.954)
        pct = p * 100
        name = f"q{pct:g}".replace(".", "_")
        out = out.withColumn(
            name,
            F.round(F.expr(f"percentile(value, CAST({p} AS DOUBLE))").over(w), round_digits),
        )
    return out


def winsorize(
    df: DataFrame, lo_pct: int = 5, hi_pct: int = 95
) -> DataFrame:
    """Per-series winsorization: clamp every value into the series'
    [p_lo, p_hi] LOW-percentile band — the robust preprocessing step
    that tames fat tails before a mean/variance-based detector without
    deleting points (cf. dropping outliers, which breaks rate math).

    Exactness discipline: percentile ranks are pure integer arithmetic
    (k = ceil(n*pct/100) as (n*pct+99)//100, floored at 1) over the
    total order (value, ts_ms, seq) — no interpolation, no float
    boundary, so the clamp bounds are actual series values and the
    result is engine-exact. Physical shape: ONE shuffle on series_key;
    the rank window and the two bound windows reuse the same partition
    sort.

    Output: (series_key, ts_ms, value, value_w).
    """
    lo_pct, hi_pct = int(lo_pct), int(hi_pct)
    tie = F.col("seq") if "seq" in df.columns else F.col("value")
    staged = df.select("series_key", "ts_ms", "value", tie.alias("__tie"))
    wo = W.partitionBy("series_key").orderBy("value", "ts_ms", "__tie")
    wp = W.partitionBy("series_key")
    rn = F.row_number().over(wo)
    n = F.count("*").over(wp)
    st = staged.select(
        "series_key", "ts_ms", "value", rn.alias("__rn"), n.alias("__n")
    )
    klo = F.greatest(F.lit(1), F.floor((F.col("__n") * lo_pct + 99) / 100).cast("bigint"))
    khi = F.floor((F.col("__n") * hi_pct + 99) / 100).cast("bigint")
    lo = F.min(F.when(F.col("__rn") == klo, F.col("value"))).over(wp)
    hi = F.min(F.when(F.col("__rn") == khi, F.col("value"))).over(wp)
    return st.select(
        "series_key",
        "ts_ms",
        "value",
        F.least(F.greatest(F.col("value"), lo), hi).alias("value_w"),
    )


def stl_decompose(
    df: DataFrame,
    bucket_ms: int = 3_600_000,
    period: int = 24,
    half_window: int = 12,
) -> DataFrame:
    """Additive seasonal decomposition (STL-lite) per series over
    ``bucket_ms`` buckets: value = trend + seasonal + residual, with

    * trend    — centered moving average over ``2*half_window + 1``
      buckets, computed from windowed DECIMAL sums and counts (one
      division at the end — no float accumulation, engine-exact);
    * seasonal — per-(series, phase) mean of the detrended values,
      phase = bucket index mod ``period`` (24 hourly buckets = the
      daily cycle); detrended values are integer-scaled
      (round(x*1e9)) before the mean so group totals are order-free;
    * residual — what the detectors should score: a level shift moves
      the trend, a recurring daily pattern lands in seasonal, and only
      genuine surprises remain in the residual.

    Physical shape: one bucket hash agg, one 25-row window per series
    (sort reused from the bucket shuffle when co-partitioned), one
    (series, phase) window — period is tiny so the phase partition
    never skews. Output: (series_key, ts_ms, value, trend, seasonal,
    residual).
    """
    b = int(bucket_ms)
    bucket = F.col("ts_ms") - F.pmod(F.col("ts_ms"), F.lit(b))
    g = (
        df.groupBy("series_key", bucket.alias("ts_ms"))
        .agg(F.sum(_dec("value")).alias("__s"), F.count("value").alias("__c"))
    )
    w25 = (
        W.partitionBy("series_key")
        .orderBy("ts_ms")
        .rowsBetween(-int(half_window), int(half_window))
    )
    value = F.col("__s").cast("double") / F.col("__c")
    trend = F.sum("__s").over(w25).cast("double") / F.sum("__c").over(w25)
    staged = g.select(
        "series_key",
        "ts_ms",
        value.alias("value"),
        trend.alias("trend"),
    ).withColumn("detrended", F.col("value") - F.col("trend"))
    phase = F.pmod((F.col("ts_ms") / F.lit(b)).cast("bigint"), F.lit(int(period)))
    se9 = F.round(F.col("detrended") * F.lit(1e9)).cast("bigint")
    wp = W.partitionBy("series_key", "__phase")
    out = (
        staged.withColumn("__phase", phase)
        .withColumn("__se9", se9)
        .withColumn(
            "seasonal",
            (F.sum("__se9").over(wp).cast("double") / F.count("*").over(wp))
            / F.lit(1e9),
        )
    )
    return out.select(
        "series_key",
        "ts_ms",
        "value",
        "trend",
        "seasonal",
        (F.col("detrended") - F.col("seasonal")).alias("residual"),
    )


def psi_drift(
    df: DataFrame, n_buckets: int = 10, round_digits: int = 9
) -> DataFrame:
    """Population Stability Index per series — the standard
    distribution-drift monitor (credit-scoring lineage; the go/no-go
    check before trusting a model or a data feed whose inputs may have
    shifted): split each series' points into two halves at its time
    midpoint, bucket values into ``n_buckets`` equal-width bins over
    the series' own [min, max], and score
    PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) with Laplace-smoothed shares
    p = (c_a+1)/(n_a+B), q = (c_b+1)/(n_b+B) (smoothing makes empty
    buckets well-defined AND deterministic — no epsilon tuning).
    Rule-of-thumb reading: < 0.1 stable, 0.1–0.25 moderate shift,
    > 0.25 action.

    Exactness discipline: every per-bucket term is rounded to
    ``round_digits`` decimals and scaled to an INTEGER before the
    per-series summation (the ``unigram_logprob`` idiom), so the total
    is an order-free bigint sum — a 1-ulp libm ln() difference cannot
    leak through partitioning or engine.

    Physical shape: one per-series stats agg broadcast back, in-row
    half/bucket assignment, one (series, bucket) count agg, a
    B-row-per-series spine join (B·|series| rows — tiny), one final
    per-series sum. No windows, no self-joins; shuffles carry series
    and (series, bucket) grains only.

    Output: (series_key, n_a, n_b, psi_e9, psi) — psi_e9 the exact
    scaled-integer total, psi the double view.
    """
    B = int(n_buckets)
    spark = df.sparkSession
    stats = df.groupBy("series_key").agg(
        F.min("ts_ms").alias("__mnt"),
        F.max("ts_ms").alias("__mxt"),
        F.min("value").alias("__mnv"),
        F.max("value").alias("__mxv"),
    )
    pts = df.join(F.broadcast(stats), "series_key")
    mid = F.expr("(__mnt + __mxt) div 2")
    half = F.when(F.col("ts_ms") <= mid, 0).otherwise(1)
    bucket = F.when(
        F.col("__mxv") > F.col("__mnv"),
        F.least(
            F.floor(
                ((F.col("value") - F.col("__mnv")) * F.lit(float(B)))
                / (F.col("__mxv") - F.col("__mnv"))
            ),
            F.lit(B - 1).cast("bigint"),
        ),
    ).otherwise(F.lit(0).cast("bigint"))
    c = (
        pts.select("series_key", half.alias("__h"), bucket.alias("__b"))
        .groupBy("series_key", "__b")
        .agg(
            F.sum(F.when(F.col("__h") == 0, 1).otherwise(0)).alias("__ca"),
            F.sum(F.when(F.col("__h") == 1, 1).otherwise(0)).alias("__cb"),
        )
    )
    tot = c.groupBy("series_key").agg(
        F.sum("__ca").alias("__na"), F.sum("__cb").alias("__nb")
    )
    spine = stats.select("series_key").crossJoin(
        F.broadcast(spark.range(B).select(F.col("id").alias("__b")))
    )
    f = (
        spine.join(c, ["series_key", "__b"], "left")
        .join(tot, "series_key")
        .select(
            "series_key",
            (F.coalesce("__ca", F.lit(0)) + 1).alias("__ca1"),
            (F.coalesce("__cb", F.lit(0)) + 1).alias("__cb1"),
            "__na",
            "__nb",
        )
    )
    p = F.col("__ca1").cast("double") / (F.col("__na") + B).cast("double")
    q = F.col("__cb1").cast("double") / (F.col("__nb") + B).cast("double")
    term_e9 = F.round((p - q) * F.log(p / q) * F.lit(10.0 ** round_digits)).cast(
        "bigint"
    )
    return (
        f.select("series_key", "__na", "__nb", term_e9.alias("__e9"))
        .groupBy("series_key")
        .agg(
            F.max("__na").cast("bigint").alias("n_a"),
            F.max("__nb").cast("bigint").alias("n_b"),
            F.sum("__e9").cast("bigint").alias("psi_e9"),
        )
        .withColumn(
            "psi", F.col("psi_e9").cast("double") / F.lit(10.0 ** round_digits)
        )
    )


def value_entropy(
    df: DataFrame, n_buckets: int = 10, round_digits: int = 9
) -> DataFrame:
    """Shannon entropy of each series' value distribution over
    ``n_buckets`` equal-width bins (the ``psi_drift`` binning) — the
    regime-complexity companion to PSI: a stuck sensor collapses to
    ~0 nats, a healthy noisy metric sits near ln(B), and a sudden
    entropy drop flags saturation/clipping before any threshold
    detector fires. H = −Σ_b p_b ln p_b over NON-EMPTY bins
    (0·ln 0 = 0 — no smoothing needed because empty bins contribute
    exactly zero), p_b = c_b / n.

    Same exactness discipline as ``psi_drift``: per-bin terms rounded
    to ``round_digits`` and integer-scaled BEFORE the per-series sum.
    Shape: stats-broadcast + in-row binning + two hash aggs,
    windowless.

    Output: (series_key, n_points, entropy_e9, entropy).
    """
    B = int(n_buckets)
    stats = df.groupBy("series_key").agg(
        F.min("value").alias("__mnv"), F.max("value").alias("__mxv")
    )
    bucket = F.when(
        F.col("__mxv") > F.col("__mnv"),
        F.least(
            F.floor(
                ((F.col("value") - F.col("__mnv")) * F.lit(float(B)))
                / (F.col("__mxv") - F.col("__mnv"))
            ),
            F.lit(B - 1).cast("bigint"),
        ),
    ).otherwise(F.lit(0).cast("bigint"))
    c = (
        df.join(F.broadcast(stats), "series_key")
        .select("series_key", bucket.alias("__b"))
        .groupBy("series_key", "__b")
        .agg(F.count("*").alias("__c"))
    )
    tot = c.groupBy("series_key").agg(F.sum("__c").alias("__n"))
    p = F.col("__c").cast("double") / F.col("__n").cast("double")
    term_e9 = F.round(p * F.log(p) * F.lit(10.0 ** round_digits)).cast("bigint")
    return (
        c.join(F.broadcast(tot), "series_key")
        .select("series_key", "__n", term_e9.alias("__e9"))
        .groupBy("series_key")
        .agg(
            F.max("__n").cast("bigint").alias("n_points"),
            (-F.sum("__e9")).cast("bigint").alias("entropy_e9"),
        )
        .withColumn(
            "entropy",
            F.col("entropy_e9").cast("double") / F.lit(10.0 ** round_digits),
        )
    )
