"""End-to-end corpus curation: the composed training-data pipeline
(extension tier; no reference file:line — SURVEY.md §2.6 north star).

    quality gate → exact dedup → near-dup dedup → deterministic split

Every stage is deterministic (min-id keeper rules, md5-derived split),
so the pipeline is reproducible run-to-run and cluster-size-independent
— and holds to the same DuckDB hash-match standard as a single operator
(catalog ``corpus_curate_e2e``).

Physical shape (the 100 TB story): ONE scan computes tokens, quality
features, the content hash, and a SimHash fingerprint via array
higher-order functions (no explode, no self-join — the fingerprint is
32 in-row array folds); the two keeper stages are ranked windows over
the content-hash and fingerprint partitions. Total: one scan + two
window shuffles, versus the naive five-shuffle aggregate-and-join-back
chain. Quality thresholds mirror ``text.quality_filter`` defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .cache import eager_fill

from .dedup import simhash_fingerprint
from .text import STOPWORDS, normalize, tokens


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_frac_hex: str = "e6",  # 230/256 ≈ 90% train
) -> DataFrame:
    """Returns (id_col, split) for the surviving corpus: documents that
    pass the quality gate, are the min-id keeper of their exact-content
    group, and the min-id keeper of their SimHash near-dup group."""
    train_frac_hex = train_frac_hex.lower()
    if len(train_frac_hex) != 2 or any(
        c not in "0123456789abcdef" for c in train_frac_hex
    ):
        raise ValueError(
            f"train_frac_hex must be two lowercase hex digits, got {train_frac_hex!r}"
        )
    raw = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        F.col(text_col),
        tokens(text_col).alias("__toks"),
    )
    n_tok = F.size("__toks").cast("bigint")
    n_chars = F.length(raw)
    punct_ratio = (
        (n_chars - F.length(F.regexp_replace(raw, r"[^a-zA-Z0-9\s]", ""))).cast(
            "double"
        )
        / F.greatest(n_chars, F.lit(1)).cast("double")
    )
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = (
        F.size(F.filter("__toks", lambda x: F.array_contains(sw, x))).cast("double")
        / F.greatest(n_tok, F.lit(1)).cast("double")
    )
    uniq_ratio = (
        F.size(F.array_distinct("__toks")).cast("double")
        / F.greatest(n_tok, F.lit(1)).cast("double")
    )
    passed = staged.filter(
        (n_tok >= 5)
        & (punct_ratio <= 0.3)
        & (stop_ratio >= 0.01)
        & (uniq_ratio >= 0.3)
    )

    hashed = passed.select(
        F.col(id_col),
        F.md5(normalize(text_col)).alias("__h"),
        F.transform(F.array_distinct("__toks"), F.md5).alias("__hs"),
    ).select(
        F.col(id_col),
        "__h",
        simhash_fingerprint(F.col("__hs")).alias("__fp"),
    )

    exact_keep = hashed.withColumn(
        "__keep", F.min(id_col).over(W.partitionBy("__h"))
    ).filter(F.col("__keep") == F.col(id_col))
    near_keep = exact_keep.withColumn(
        "__keep2", F.min(id_col).over(W.partitionBy("__fp"))
    ).filter(F.col("__keep2") == F.col(id_col))

    h2 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
    return near_keep.select(
        F.col(id_col),
        F.when(h2 < train_frac_hex, "train").otherwise("val").alias("split"),
    )


def token_budget_sample(
    df: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    by: str = "source",
) -> DataFrame:
    """Deterministic token-budget sampling per group (the data-mixing
    step of a training pipeline: cap each source's contribution at a
    token budget). Documents are ordered by md5(id) — a stable
    pseudo-random shuffle, reproducible across runs and cluster sizes —
    and kept while the running token total (inclusive) stays within
    ``budget_tokens``.

    One scan + one window sort per group; the running sum is exact
    integer arithmetic. Output: (by, id_col, n_tokens) for the kept
    documents."""
    t = df.select(
        F.col(by),
        F.col(id_col),
        F.size(tokens(text_col)).cast("bigint").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("__h"),
    )
    w = (
        W.partitionBy(by)
        .orderBy("__h", id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = t.withColumn("__cum", F.sum("n_tokens").over(w))
    return c.filter(F.col("__cum") <= int(budget_tokens)).select(
        by, id_col, "n_tokens"
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: count, per training document, the
    distinct word-``n``-gram shingles it shares with the held-out eval
    corpus (the n-gram-overlap test used to scrub eval leakage from
    pre-training data; extension tier — no reference file:line,
    SURVEY.md §2.6 north star).

    Physical shape (the 100 TB story): eval benchmarks are megabytes
    while the training corpus is the 100 TB side, so the eval shingle
    set is collected DISTINCT and **broadcast** — the big side's
    exploded shingles stream through a broadcast hash join with no
    shuffle of the corpus, and the per-doc hit count combines map-side.
    Docs too short to shingle (< n tokens) are contamination-free by
    definition and kept via the left join from the corpus spine.

    Output: (id_col, n_hit_shingles, contaminated) for every doc in
    ``df``.
    """
    from .dedup import shingle_frame

    eval_sh = shingle_frame(eval_df, text_col, id_col, n).select("s").distinct()
    # spread the corpus before the interpreted shingle projection so it
    # runs at full width even on a single-file input layout
    n_part = df.sparkSession.sparkContext.defaultParallelism
    train_sh = shingle_frame(df.repartition(n_part, id_col), text_col, id_col, n)
    hits = (
        train_sh.join(F.broadcast(eval_sh), "s")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_shingles"))
    )
    spine = df.select(id_col)
    return (
        spine.join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_hit_shingles", F.lit(0)).cast("bigint").alias(
                "n_hit_shingles"
            ),
        )
        .withColumn("contaminated", (F.col("n_hit_shingles") > 0).cast("boolean"))
    )


def source_cap(
    df: DataFrame,
    cap: int,
    id_col: str = "doc_id",
    by: str = "source",
) -> DataFrame:
    """Per-source document cap (the domain-cap rule of web-corpus
    curation: no single site/source may dominate the mix). Keeps at
    most ``cap`` docs per group, chosen by the deterministic
    md5(id)-ordered pseudo-random shuffle — reproducible across runs
    and cluster sizes, and unbiased w.r.t. any natural id ordering.

    One ranked window per group. At 100 TB a pathologically hot source
    makes that partition skewed; the fix is a two-phase rank (cap
    per-partition first — no partition can contribute more than
    ``cap`` survivors — then re-rank the ≤ cap×n_partitions finalists),
    same shape as ``skew.salted_agg``. Output: (by, id_col, rk).
    """
    h = F.md5(F.col(id_col).cast("string"))
    w = W.partitionBy(by).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.select(F.col(by), F.col(id_col), h.alias("__h"))
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= int(cap))
        .select(by, id_col, "rk")
    )


def temperature_mix(
    df: DataFrame,
    n_keep: int,
    id_col: str = "doc_id",
    by: str = "source",
) -> DataFrame:
    """Temperature-based source mixing (alpha = 0.5): per-source quotas
    proportional to sqrt(n_docs) — the standard multinomial-temperature
    upsampling of small sources (mT5-style alpha sampling) — filled by
    the deterministic md5(id)-ordered shuffle.

    Exactness across engines: sqrt is IEEE-correctly-rounded, and the
    weight is floored to an integer (w = floor(sqrt(cnt * 1e6))) BEFORE
    the sum, so the quota arithmetic
    ``quota = ceil(n_keep * w / W) = (n_keep*w + W - 1) div W`` is pure
    integer — no float accumulation order can flip a boundary.

    One count aggregation (broadcastable: one row per source), one
    ranked window per source. Output: (by, id_col, rk, quota).
    """
    cnt = df.groupBy(by).agg(F.count("*").alias("__cnt"))
    w_int = F.floor(F.sqrt(F.col("__cnt").cast("double") * F.lit(1_000_000.0))).cast(
        "bigint"
    )
    weights = cnt.select(F.col(by), w_int.alias("__w"))
    # total weight via an unpartitioned window over the one-row-per-
    # source frame (sources are few; no self-join lineage). ceil(a/W) as
    # floor((a + W - 1)/W): the double division is exact-enough below
    # 2^53 and BOTH engines apply IEEE division + floor (explicit floor
    # — a bare double→int cast truncates on Spark but ROUNDS on DuckDB)
    total_w = F.sum("__w").over(W.partitionBy())
    quota = weights.select(
        F.col(by),
        F.floor(
            (F.lit(int(n_keep)) * F.col("__w") + total_w - 1) / total_w
        )
        .cast("bigint")
        .alias("quota"),
    )
    h = F.md5(F.col(id_col).cast("string"))
    w = W.partitionBy(by).orderBy(h.asc(), F.col(id_col).asc())
    ranked = df.select(F.col(by), F.col(id_col)).withColumn(
        "rk", F.row_number().over(w).cast("bigint")
    )
    return (
        ranked.join(F.broadcast(quota), by)
        .filter(F.col("rk") <= F.col("quota"))
        .select(by, id_col, "rk", "quota")
    )


def containment_decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Containment-based decontamination: flag a training document when
    the FRACTION of its n-gram shingles found in the eval corpus
    reaches ``threshold`` — |sh(d) ∩ sh(eval)| / |sh(d)|. Normalizing
    by the document's own shingle count (containment, not Jaccard)
    catches a short eval item embedded verbatim in a long document,
    which absolute-count rules under-flag on short docs and over-flag
    on long ones.

    Same broadcast shape as ``decontaminate``: eval shingles collect
    distinct and broadcast; the corpus side streams through with no
    corpus shuffle; hit and total counts combine map-side. The division
    is one double op on two exact bigints — engine-portable. Docs with
    no shingles (< n tokens) have containment 0.0.

    Output: (id_col, n_shingles, n_hit, containment, contaminated).
    """
    from .dedup import shingle_frame

    n_part = df.sparkSession.sparkContext.defaultParallelism
    sh = shingle_frame(df.repartition(n_part, id_col), text_col, id_col, n)
    ev = shingle_frame(eval_df, text_col, id_col, n).select("s").distinct()
    totals = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    hits = (
        sh.join(F.broadcast(ev), "s")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit"))
    )
    spine = df.select(F.col(id_col))
    out = (
        spine.join(totals, id_col, "left")
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias("n_shingles"),
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
        )
    )
    containment = F.when(
        F.col("n_shingles") > 0,
        F.col("n_hit").cast("double") / F.col("n_shingles").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col,
        "n_shingles",
        "n_hit",
        containment.alias("containment"),
        (containment >= F.lit(float(threshold))).cast("bigint").alias("contaminated"),
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Marginal-novelty scoring for data selection: per document, the
    fraction of its distinct n-gram shingles that appear for the FIRST
    time in the corpus at that document (ordered by ``id_col``, the
    ingest order). High-novelty documents extend corpus coverage;
    near-zero novelty marks late arrivals assembled from already-seen
    text — the greedy facility-location intuition behind
    coverage-driven selection (Sorscher et al. 2022, "Beyond neural
    scaling laws", applied at n-gram rather than embedding granularity)
    without any model in the loop.

    Physical shape — NO join on the shingle key at all: a shingle's
    owner is a MEMBER of the owning document by definition, so the
    per-doc novel count is just the first-owner table re-grouped by
    owner — (1) per-doc totals: one map-side-combinable hash agg over
    the explosion; (2) ``groupBy(shingle).agg(min(id))`` →
    ``groupBy(owner).count()`` — two stacked combinable aggs whose
    second input is one row per DISTINCT shingle; (3) one thin
    doc-keyed join of two one-row-per-doc relations. The first version
    of this operator joined the first-owner table back to the full
    (doc, shingle) list — a corpus-sized shuffle on long string keys
    that measured 24s at sf0.1 vs ~1s for this shape, and strictly
    worse at scale. No window over the corpus, no self-join; a viral
    shingle collapses to one first-owner row per map task before any
    shuffle. The novelty ratio is a single double division of two
    exact counts. Documents with no shingles (< n tokens) are absent
    from the output (no denominator).

    Output: (id_col, n_shingles, n_novel, novelty).
    """
    from .dedup import shingle_frame

    # The shingle projection is the dominant per-row cost (interpreted
    # HOF lambdas); repartition the SMALL raw documents first so it
    # runs at full width even when the input layout is a single file
    # (same pre-explosion move as minhash_dedup_pairs — measured 12s →
    # ~1s at sf0.1, whose fixture is one parquet file / one scan task).
    # Persisted: the explosion feeds BOTH the per-doc totals and the
    # first-owner chain; without the cache Catalyst replays the HOF
    # explode per consumer (measured 2.3x slower at sf0.1). Spills to
    # disk at corpus scale; the caller owns the cache lifetime
    # (clearCache after materializing) — same contract as
    # minhash_estimate_pairs.
    n_part = df.sparkSession.sparkContext.defaultParallelism
    # persisted; filled by its first consumer (r11: the dedicated
    # eager-fill job re-measured as pure overhead — wall 1.48 s without
    # vs 1.59 s with, executor CPU 25.7 vs 26.6)
    sh = shingle_frame(
        df.repartition(n_part, id_col), text_col, id_col, n
    ).persist()
    totals = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    owned = (
        sh.groupBy("s")
        .agg(F.min(id_col).alias(id_col))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_novel"))
    )
    j = totals.join(owned, id_col, "left")
    n_novel = F.coalesce("n_novel", F.lit(0)).cast("bigint")
    return j.select(
        id_col,
        "n_shingles",
        n_novel.alias("n_novel"),
        (n_novel.cast("double") / F.col("n_shingles").cast("double")).alias(
            "novelty"
        ),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling (the language/source
    rebalance step of a data-mix recipe): a document survives iff
    uniform_hash(id) < rate(stratum), where the hash is the first 4 hex
    digits of md5(id) scaled to [0, 1) — seedless, reproducible across
    runs and engines, and independent of partitioning (unlike
    ``df.sample``, whose outcome depends on the split layout).

    Physical shape: a pure in-row filter — no shuffle, no state; at
    100 TB this is a map-only pass that composes with partition pruning
    (rate 0 strata could additionally prune whole hive partitions when
    the table is partitioned by the stratum).

    Output: (id, stratum) for surviving rows.
    """
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
        .cast("double")
        / F.lit(65536.0)
    )
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(rate)
    return df.filter(u < rate).select(F.col(id_col), F.col(strata_col))


def pack_bins(
    df: DataFrame,
    size_col: str = "n_chars",
    id_col: str = "doc_id",
    capacity: int = 4096,
    n_parts: int = 32,
) -> DataFrame:
    """Sequence packing for training-context assembly: documents are
    laid end-to-end in deterministic ``id_col`` order and assigned to
    fixed-capacity bins by their cumulative-size offset —
    bin = floor(cum_before / capacity). (This is offset-partitioned
    packing: a document whose span crosses a boundary belongs to the
    bin its START falls in; greedy reset-on-overflow packing is
    inherently sequential and gains <1 bin in 10^4 over this at
    realistic doc/context ratios.)

    The global running sum is the scale-critical part. A bare
    ``Window.orderBy(id)`` puts the whole corpus in ONE task — the
    classic driver-shaped mistake. Instead this is the textbook
    distributed prefix sum, invariant to where the range splits fall:

    1. ``repartitionByRange(id)`` — order-respecting split;
    2. per-partition running sum (window partitioned by
       ``spark_partition_id``);
    3. partition totals (≤ n_parts rows) prefix-summed on the driver
       scale (single tiny task) and broadcast-joined back as offsets.

    Output: (id, size, bin_id, offset_in_bin) — offset_in_bin is the
    document's start position within its bin.
    """
    from pyspark.sql import Window as W

    # persisted: both the local prefix sums and the partition totals
    # read `sized`, and correctness requires ONE range-sampling run —
    # recomputation after a task retry could pick different split
    # points, assigning a boundary row to partition p in one branch
    # while its size counts toward p+1's offset in the other.
    # eager fill: see dedup.eager_fill — also closes the concurrent
    # double-range-sampling hazard the comment above describes
    sized = eager_fill((
        df.select(F.col(id_col), F.col(size_col).cast("bigint").alias("sz"))
        .repartitionByRange(n_parts, F.col(id_col))
        .withColumn("__pid", F.spark_partition_id())
    ).persist())
    w_local = (
        W.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = sized.withColumn(
        "__cum_local", F.coalesce(F.sum("sz").over(w_local), F.lit(0))
    )
    totals = sized.groupBy("__pid").agg(F.sum("sz").alias("__tot"))
    w_off = (
        W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    )  # ≤ n_parts rows: the single-task window is over the TINY totals table
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    cum = F.col("__cum_local") + F.col("__off")
    return (
        local.join(F.broadcast(offsets), "__pid")
        .select(
            F.col(id_col),
            F.col("sz").alias("size"),
            F.floor(cum / capacity).cast("bigint").alias("bin_id"),
            (cum % capacity).alias("offset_in_bin"),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis, IPL 2006): each row draws a uniform u from md5(id) and
    enters the race with key ln(u)/w — the k largest keys are exactly
    a weight-proportional sample without replacement (the classic
    exponential-race argument: -ln(u)/w ~ Exp(w), and the k smallest
    exponentials select items with probability proportional to their
    weights at every step). The data-mix use: "sample 100k documents
    for annotation, long documents proportionally more often" —
    reproducibly, so two runs (or two engines) pick the same docs.

    Determinism discipline: u = (first 8 hex digits of md5(id) + 0.5)
    / 2^32 — seedless and partitioning-independent, the same hash
    family as ``stratified_sample``; the key is rounded and scaled to
    an INTEGER (round(ln(u)/w · 1e9), the LM-scorer convention) before
    ranking, so a 1-ulp libm ln() difference can't flip a rank
    boundary between engines. Ties (same scaled key) break on id.

    Physical shape: one in-row map computes the keys (no shuffle),
    then a top-k — Catalyst's TakeOrderedAndProject: per-partition
    heaps of k rows, one k-row merge at the driver, no global sort.
    Rows with weight ≤ 0 or NULL never race (documented exclusion).

    Output: (id_col, weight_col, key_e9), the k winners.
    """
    h32 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    u = (h32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.round(
        F.log(u) / F.col(weight_col).cast("double") * F.lit(1e9)
    ).cast("bigint")
    return (
        df.filter(F.col(weight_col) > 0)
        .select(F.col(id_col), F.col(weight_col), key.alias("key_e9"))
        .orderBy(F.col("key_e9").desc(), F.col(id_col))
        .limit(int(k))
    )


def weighted_sample_grouped(
    df: DataFrame,
    k_per_group: int,
    weight_col: str,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group Efraimidis–Spirakis draws: ``k_per_group`` weighted
    winners WITHOUT replacement from every group — the quota form of
    ``weighted_sample`` ("200 docs from each source for review, long
    docs proportionally more often"). Same deterministic key (md5
    uniform, ln(u)/w rounded+integer-scaled), ranked by a window
    PARTITIONED on the group key — per-group sorts, bounded by group
    size, no global order anywhere. A pathologically hot group can
    ride ``skew.two_phase_cap``'s salted shape; at k ≪ group size the
    one-window form is the right default.

    Output: (group_col, id_col, weight_col, key_e9, rk), rk 1-based
    within the group.
    """
    from pyspark.sql import Window as W

    h32 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    u = (h32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    key = F.round(
        F.log(u) / F.col(weight_col).cast("double") * F.lit(1e9)
    ).cast("bigint")
    w = W.partitionBy(group_col).orderBy(
        F.col("key_e9").desc(), F.col(id_col)
    )
    return (
        df.filter(F.col(weight_col) > 0)
        .select(
            F.col(group_col),
            F.col(id_col),
            F.col(weight_col),
            key.alias("key_e9"),
        )
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= int(k_per_group))
    )


def chunk_overlap(
    df: DataFrame,
    chunk_words: int = 64,
    stride_words: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunking for retrieval-context prep: overlapping
    ``chunk_words``-word windows every ``stride_words`` words (stride <
    size ⇒ adjacent chunks share size−stride words, the standard RAG
    trade between context continuity and index size). The last window
    starts at the final stride position that still introduces new
    words, so every word lands in ≥ 1 chunk and no empty trailing
    windows emit.

    Pure in-row higher-order functions (sequence/slice/posexplode) —
    map-only, whole-stage codegen, no shuffle, no state; the same
    projection works on an unbounded stream. The passage-dedup chunker
    (``dedup.chunk_passages``) is the non-overlapping special case
    (stride = size).

    Output: (id, ci, start_word, chunk) — ci is the 0-based window
    index, start_word its word offset.
    """
    size, stride = int(chunk_words), int(stride_words)
    if stride <= 0 or size <= 0:
        raise ValueError("chunk_words and stride_words must be positive")
    if stride > size:
        raise ValueError("stride_words must be <= chunk_words (gaps drop words)")
    w = F.split(F.trim(F.col(text_col)), " ")
    n = F.size(w)
    # number of windows: 1 + ceil(max(n - size, 0) / stride)
    n_win = (
        F.lit(1)
        + F.ceil(F.greatest(n - size, F.lit(0)) / F.lit(stride)).cast("int")
    )
    return df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_win - 1),
                lambda i: F.struct(
                    (i * stride).alias("start_word"),
                    F.array_join(
                        F.slice(w, i * stride + 1, size), " "
                    ).alias("chunk"),
                ),
            )
        ).alias("ci", "__s"),
    ).select(
        id_col,
        F.col("ci").cast("bigint").alias("ci"),
        F.col("__s.start_word").cast("bigint").alias("start_word"),
        F.col("__s.chunk").alias("chunk"),
    )


def _hashed_feature_counts(
    df: DataFrame,
    n_buckets: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(id, bucket, c): occurrence counts of hashed unigram+bigram
    features per document — the DSIR feature extractor. Bigrams are
    built IN-ROW (zip_with the token array against its own 1-shifted
    slice), so feature construction is a pure map; the only shuffle is
    the (doc, bucket) hash agg, which map-side combines to ≤ n_buckets
    rows per doc. Bucket = first 8 md5 hex digits mod n_buckets —
    seedless, engine-portable (the ``hashing_trick_embed`` family)."""
    tok = tokens(text_col)
    bg = F.filter(
        F.zip_with(
            tok,
            F.slice(tok, 2, F.greatest(F.size(tok) - 1, F.lit(0))),
            lambda a, b: F.when(b.isNotNull(), F.concat_ws("_", a, b)),
        ),
        lambda x: x.isNotNull(),
    )
    feats = F.explode(F.concat(tok, bg)).alias("f")
    bucket = (
        F.conv(F.substring(F.md5(F.col("f")), 1, 8), 16, 10).cast("bigint")
        % int(n_buckets)
    )
    return (
        df.select(F.col(id_col), feats)
        .select(F.col(id_col), bucket.alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("c"))
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 256,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_digits: int = 9,
) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every raw document by how target-like its hashed n-gram profile is,
    log w(x) = Σ_b c_b(x) · [ln p_target(b) − ln p_raw(b)], where b
    ranges over ``n_buckets`` hashed unigram+bigram buckets and both
    bucket distributions are add-``alpha`` smoothed. High-weight raw
    documents look like the target domain; resampling by these weights
    (``dsir_select``) tilts a web-scale corpus toward the domain
    without training a classifier.

    Exactness discipline: each bucket's two ln terms are rounded to
    ``round_digits`` and integer-scaled SEPARATELY, so the per-bucket
    log-ratio is an exact bigint and document totals are order-free
    bigint sums (the ``unigram_logprob`` idiom).

    100 TB shape: the target corpus is the small side by construction
    (a domain sample) — its bucket table is ≤ n_buckets rows,
    broadcast; the raw corpus is scanned ONCE into (doc, bucket, c)
    (map-side-combinable hash agg), the raw bucket marginal derives
    from that same relation co-keyed on bucket (exchange reuse, no
    second scan), and the scoring join broadcasts the ≤ n_buckets-row
    log-ratio table. No shuffle wider than the (doc, bucket) agg.

    Documents with zero features (empty token list) never score —
    documented exclusion, same rule as ``hashing_trick_embed``.

    Output: (id_col, n_feats, logw_e9, avg_logw) — logw_e9 the exact
    integer-scaled total, avg_logw the per-feature rounded mean.
    """
    B = int(n_buckets)
    a = float(alpha)
    scale = 10.0 ** round_digits
    rb = _hashed_feature_counts(raw, B, text_col, id_col)
    tb = (
        _hashed_feature_counts(target, B, text_col, id_col)
        .groupBy("bucket")
        .agg(F.sum("c").alias("tc"))
    )
    rcb = rb.groupBy("bucket").agg(F.sum("c").alias("rc"))
    ttot = tb.agg(F.sum("tc").alias("T"))
    rtot = rcb.agg(F.sum("rc").alias("R"))
    lt_e9 = F.round(
        F.log(
            (F.coalesce(F.col("tc"), F.lit(0)).cast("double") + F.lit(a))
            / (F.col("T").cast("double") + F.lit(a * B))
        )
        * F.lit(scale)
    ).cast("bigint")
    lr_e9 = F.round(
        F.log(
            (F.col("rc").cast("double") + F.lit(a))
            / (F.col("R").cast("double") + F.lit(a * B))
        )
        * F.lit(scale)
    ).cast("bigint")
    ratio = (
        rcb.join(F.broadcast(tb), "bucket", "left")
        .join(F.broadcast(ttot))
        .join(F.broadcast(rtot))
        .select("bucket", (lt_e9 - lr_e9).alias("lr_e9"))
    )
    return rb.join(F.broadcast(ratio), "bucket").groupBy(id_col).agg(
        F.sum("c").cast("bigint").alias("n_feats"),
        F.sum(F.col("c") * F.col("lr_e9")).cast("bigint").alias("logw_e9"),
        F.round(
            F.sum(F.col("c") * F.col("lr_e9")).cast("double")
            / F.sum("c")
            / F.lit(scale),
            round_digits,
        ).alias("avg_logw"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int = 100,
    n_buckets: int = 256,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR selection step: Gumbel-top-k resampling over the importance
    weights — draw ``k`` documents WITHOUT replacement with probability
    ∝ w(x) (the paper's resampling, not a hard top-k: sampling keeps
    diversity that deterministic truncation destroys). The Gumbel-max
    identity: argmax_i (ln w_i + G_i) with G_i ~ Gumbel(0,1) iid is a
    draw ∝ w_i, and the top-k of the perturbed keys is a without-
    replacement sample.

    Determinism discipline: the Gumbel draw derives from md5(id) — u =
    (first 8 hex digits + 0.5)/2^32, g = −ln(−ln u) — seedless,
    partitioning-independent, engine-portable; the perturbation is
    integer-scaled (e9) before adding to the exact ``logw_e9``, so ties
    are impossible to flip across engines and break on id.

    Physical shape: ``dsir_weights`` (one raw scan + broadcast joins)
    then TakeOrderedAndProject — per-partition k-row heaps, one k-row
    driver merge, no global sort.

    Output: (id_col, logw_e9, key_e9), the k winners.
    """
    w = dsir_weights(
        raw, target, n_buckets=n_buckets, alpha=alpha,
        text_col=text_col, id_col=id_col,
    )
    h32 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    u = (h32.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    g_e9 = F.round(-F.log(-F.log(u)) * F.lit(1e9)).cast("bigint")
    return (
        w.select(
            F.col(id_col),
            "logw_e9",
            (F.col("logw_e9") + g_e9).alias("key_e9"),
        )
        .orderBy(F.col("key_e9").desc(), F.col(id_col))
        .limit(int(k))
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int = 16,
    seed: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-shard layout manifest — the LAST
    materialization step of a curated corpus (after packing): every
    document is routed to one of ``n_shards`` output shards by a
    SEEDED md5 split (shard = first-4-hex-digits of
    md5("s{seed}_" || id) mod n_shards) and ordered within its shard
    by the full hash — the same reproducible pseudo-random shuffle the
    curation tier uses everywhere, here serving training-order
    randomization: adjacent source documents land in different shards
    at uncorrelated positions, and the layout is identical across
    runs, cluster sizes, and input partitionings (no ``rand()``, no
    ``zipWithIndex``). The seed prefix makes epochs cheap: a new seed
    is a whole new global order for free.

    The manifest pins what a shard writer needs to validate balance
    BEFORE paying for the write: per-shard doc / token / char totals
    plus the shard's sort-key endpoints (``first_key``/``last_key`` —
    the range a range-partitioned writer splits files on). The sort
    key is the hash's first 15 hex digits as a 60-bit integer (the
    ``sketch.py`` hash-fraction recipe; ties at write time break on
    the unique id) — integer endpoints keep the aggregation buffer
    fixed-width, so Spark plans a HashAggregate; string MIN/MAX
    endpoints would demote the whole pass to a per-partition-sorting
    SortAggregate.

    100 TB shape: one map-side projection (hash, token count, length
    ride the scan), one ``n_shards``-row hash aggregation (map-side
    combined) — no window, no join, no sort. The shard WRITE this
    manifests is ``repartitionByRange(key) + sortWithinPartitions``,
    scaling with the partition count rather than the shard count. md5
    is uniform, so shard skew is Binomial(N, 1/n_shards) — ±0.01% at
    10^9 docs/shard — and hot-key skew is impossible by construction
    (the key hashes a unique id).

    Output: (shard_id, n_docs, n_tokens, n_chars, first_key,
    last_key).
    """
    h = F.md5(
        F.concat(F.lit(f"s{int(seed)}_"), F.col(id_col).cast("string"))
    )
    key = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    shard = (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint") % int(n_shards)
    )
    return (
        df.select(
            shard.alias("shard_id"),
            key.alias("__k"),
            F.size(tokens(text_col)).cast("bigint").alias("__nt"),
            F.length(text_col).cast("bigint").alias("__nc"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__nt").alias("n_tokens"),
            F.sum("__nc").alias("n_chars"),
            F.min("__k").alias("first_key"),
            F.max("__k").alias("last_key"),
        )
    )
