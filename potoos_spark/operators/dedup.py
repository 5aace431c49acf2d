"""Deduplication operators for training-data pipelines (SURVEY.md
extension tier): exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design: everything is expressed as hash-partitioned joins and
aggregations — no cross product anywhere.

* exact: one hash aggregation on md5(normalized text).
* MinHash+LSH: shingle explode → k min-aggregations (map-side combine)
  → band keys → self-join *per band bucket* (the only join touches
  documents sharing a band) → exact-Jaccard verification on candidates
  only. At 100 TB the band join is the classic LSH bucket join; band/row
  counts tune recall vs candidate volume.
* SimHash: bit-voting over token hashes → equality join on the 32-bit
  fingerprint (or the pigeonhole banded Hamming join,
  ``simhash_hamming_pairs``, for distance > 0).
* n-gram Jaccard: inverted-index join on shingles (pairs sharing at
  least one shingle), count-based exact Jaccard — prunes the quadratic
  pair space to co-occurring docs.
* embedding cosine: integer-scaled vectors (floor(x*1000+0.5)) make dot
  products exact and engine-portable; the pair space is pruned by the
  caller (LSH buckets / ANN) — the all-pairs form here is the
  correctness baseline.

MinHash hash family: h_j(s) = md5(j || '|' || s) compared as hex
strings — deterministic, engine-portable, no seed state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .cache import eager_fill
from .text import normalize, shingles, tokens


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup on normalized text: one row per distinct content hash
    with the keeper (min id) and the duplicate count."""
    h = F.md5(normalize(text_col))
    return (
        df.select(h.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_docs"))
    )


def exact_dedup_keep_longest(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup with a keep-longest canonicalization policy: groups
    are the same normalized-content hashes as ``exact_dedup``, but the
    keeper is the document with the LONGEST raw text (ties broken by
    min id). Normalization collapses case/punctuation/whitespace, so
    raw variants inside one group genuinely differ — pipelines usually
    canonicalize on the most complete raw form rather than the
    arbitrary min id.

    Same physical shape as ``exact_dedup``: ONE map-side-combinable
    hash aggregation (``min_by`` on a (-length, id) priority struct —
    struct ordering is field-by-field, so the tie-break works for ANY
    orderable id type, numeric or string; no ranked window, so a viral
    duplicate collapses per map task before the shuffle).

    Output: (content_hash, n_docs, keep_id, keep_chars).
    """
    h = F.md5(normalize(text_col))
    staged = df.select(
        h.alias("content_hash"),
        F.col(id_col),
        F.length(text_col).cast("bigint").alias("__len"),
    )
    pri = F.struct(
        (-F.col("__len")).alias("neglen"), F.col(id_col).alias("id")
    )
    return staged.groupBy("content_hash").agg(
        F.count("*").alias("n_docs"),
        F.min_by(id_col, pri).alias("keep_id"),
        F.max("__len").alias("keep_chars"),
    )


def streaming_exact_dedup(
    sdf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str = "ingest_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact dedup over an unbounded document stream: first-seen doc per
    content hash passes, later duplicates drop. State = one row per
    distinct hash, evicted once the watermark guarantees no duplicate
    can still arrive (dedup horizon = the watermark delay). This is the
    ingest-time guard in front of a training-data store; the batch
    ``exact_dedup`` is the retroactive sweep."""
    h = F.md5(normalize(text_col)).alias("content_hash")
    return (
        sdf.select(F.col(id_col), F.col(event_time_col), h)
        .withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def streaming_simhash_dedup(
    sdf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str = "ingest_time",
    watermark: str = "1 hour",
    n_bits: int = 32,
) -> DataFrame:
    """NEAR-dup suppression over an unbounded document stream: first
    arrival per identical ``n_bits``-bit SimHash fingerprint passes,
    later near-copies (vote-identical token distributions — boilerplate
    or OCR variants of the same page) drop. The fingerprint is the same
    fully in-row fold as batch ``simhash`` (no shuffle before the
    dedup), so the only stateful operator is the watermarked key-dedup:
    state = one row per distinct fingerprint inside the horizon,
    evicted once the watermark guarantees no near-copy can still
    arrive. The batch ``simhash_dup_groups`` is the retroactive sweep;
    token-less documents (empty/punctuation-only text) carry no
    fingerprint and are dropped, exactly as in batch (no spurious fp=0
    group)."""
    hs = F.transform(F.array_distinct(tokens(text_col)), F.md5)
    # Token-less docs are excluded BEFORE the projection with the cheap
    # equivalent predicate normalize(text) != '' (non-empty normalized
    # text ⟺ ≥1 token): a size(__hs) > 0 filter ABOVE the projection
    # gets pushed back down with the whole HOF hash expression inlined
    # into the predicate (CSE cannot reach through lambdas), evaluating
    # the md5 transform twice per row — the r9 streaming-minhash lesson.
    staged = sdf.filter(normalize(text_col) != "").select(
        F.col(id_col), F.col(event_time_col), hs.alias("__hs")
    )
    fp = staged.select(
        F.col(id_col),
        F.col(event_time_col),
        simhash_fingerprint(F.col("__hs"), n_bits).alias("simhash"),
    )
    return fp.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        ["simhash"]
    )


def _inrow_minhash_col(shingle_array_col: str, j: int):
    """One MinHash component computed fully IN-ROW from a document's
    shingle array: min over md5('j|' || shingle) — identical hash family
    (and therefore identical values) to the batch ``_minhash_aggs``
    groupBy form; min over the multiset equals min over the set, so the
    distinct-ness of the array is irrelevant."""
    return F.array_min(
        F.transform(
            F.col(shingle_array_col),
            lambda s: F.md5(F.concat(F.lit(f"{j}|"), s)),
        )
    )


def lsh_band_key_array(k: int = 12, rows_per_band: int = 2):
    """array<string> of LSH band keys over the ``mh0..mh{k-1}`` columns
    — md5 of the concatenated band rows, the exact key
    ``lsh_candidate_pairs`` buckets on (shared so the streaming guard
    and the batch index can never drift)."""
    n_bands = k // rows_per_band
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "",
                    *[
                        F.col(f"mh{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(n_bands)
        ]
    )


def lsh_band_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 12,
    rows_per_band: int = 2,
) -> DataFrame:
    """The PERSISTED batch LSH index a streaming near-dup guard probes:
    the DISTINCT (band_id, band_key) bucket keys of a batch corpus,
    from the same shingle → signature → banding chain as
    ``minhash_dedup_pairs``. At 100 TB this is the compact face of the
    corpus — 6 band keys per doc before the distinct, no doc ids, no
    payloads — the relation you'd write out once per index build and
    broadcast- or shuffle-join against every arriving micro-batch.
    Output: (band_id int, band_key string)."""
    sh = shingle_frame(df, text_col, id_col)
    sig = minhash_signatures(sh, id_col, k)
    return sig.select(
        F.posexplode(lsh_band_key_array(k, rows_per_band)).alias(
            "band_id", "band_key"
        )
    ).distinct()


def streaming_minhash_neardup_alerts(
    sdf: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str = "ingest_time",
    watermark: str = "1 hour",
    k: int = 12,
    rows_per_band: int = 2,
) -> DataFrame:
    """MinHash-LSH near-dup guard over an unbounded document stream
    (VERDICT r8 item 5): every arriving doc computes its k-column
    MinHash signature fully IN-ROW (no shuffle — a per-doc min over the
    shingle array replays the batch groupBy exactly), expands its
    band keys, and probes the PERSISTED batch index with a
    stream-static join; a doc colliding with ANY indexed bucket is a
    near-dup candidate of the batch corpus and emits ONE alert row.
    The collapse from per-band hits to one per-doc alert is the
    stateful operator — a watermarked ``dropDuplicatesWithinWatermark``
    on the doc id, which also absorbs re-deliveries of the same doc
    inside the horizon (at-least-once sources) and late out-of-order
    arrivals up to the watermark delay; state = one row per alerted
    doc inside the horizon, evicted at the watermark like the other
    streaming dedup twins.

    This is the ingest-time twin of the ``corpus_fuzzy_dedup_e2e``
    batch pipeline's candidate stage: the batch job periodically
    rebuilds the index; the stream keeps new arrivals from re-adding
    near-copies between rebuilds (the RefinedWeb/Lee et al. "dedup
    against the accumulated corpus" loop). Band collision = candidate,
    not verified duplicate — downstream either drops (recall-biased) or
    routes to an exact verify, exactly like the batch LSH stage.

    Output: (doc_id) — one row per flagged arriving doc; deterministic
    as a set (doc ids are unique), hence hash-checkable."""
    # NO size() filter on the shingle array: Catalyst pushes such a
    # predicate below the projection and re-expands the whole HOF
    # shingle expression inside it (CSE does not reach through lambda
    # functions — measured 7.7 s vs 1.0 s at sf0.1). Token-less docs
    # are harmless without it: their mh columns are NULL, concat_ws
    # skips nulls, and the resulting md5('') band keys cannot exist in
    # the index (batch signatures only come from docs WITH shingles),
    # so they drop at the semi join — same output, one evaluation.
    staged = sdf.select(
        F.col(id_col),
        F.col(event_time_col),
        shingles(tokens(text_col)).alias("__shs"),
    )
    sig = staged.select(
        F.col(id_col),
        F.col(event_time_col),
        *[_inrow_minhash_col("__shs", j).alias(f"mh{j}") for j in range(k)],
    )
    bands = sig.select(
        F.col(id_col),
        F.col(event_time_col),
        F.posexplode(lsh_band_key_array(k, rows_per_band)).alias(
            "band_id", "band_key"
        ),
    )
    hits = bands.join(index, ["band_id", "band_key"], "left_semi")
    return (
        hits.withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark([id_col])
        .select(id_col)
    )


def shingle_frame(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) exploded distinct word-n-gram shingles."""
    return df.select(
        F.col(id_col), F.explode(shingles(tokens(text_col), n)).alias("s")
    )


def _minhash_aggs(k: int) -> list:
    return [
        F.min(F.md5(F.concat(F.lit(f"{j}|"), F.col("s")))).alias(f"mh{j}")
        for j in range(k)
    ]


def minhash_signatures(sh: DataFrame, id_col: str = "doc_id", k: int = 12) -> DataFrame:
    """k-column MinHash signature per doc: one hash aggregation with k
    conditional mins (combines map-side; no shuffle amplification)."""
    return sh.groupBy(id_col).agg(*_minhash_aggs(k))


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    k: int = 12,
    rows_per_band: int = 2,
    bucket_cap: int = 256,
) -> DataFrame:
    """LSH banding: docs sharing any band key become a candidate pair.

    Pair generation is ONE hash aggregation, not a self-join: group by
    (band_id, band_key), collect the bucket's doc ids, and explode the
    i<j combinations with a codegen'd ``transform``/``slice`` lambda —
    one shuffle of (id, band) rows instead of a join's exchange + sort
    on both sides (measured ~2× faster cold; candidate set identical,
    asserted when the rewrite landed).

    ``bucket_cap`` bounds bucket MEMBERSHIP before pairing: a
    deterministic md5-ranked ``row_number() <= cap`` on the banded
    relation, the same generator-side guardrail as
    ``simhash_hamming_pairs``'s band_cap and ``semantic_dedup_cells``'s
    cell_cap. Without it, a boilerplate mega-bucket (identical
    signatures) would make ``collect_set`` + the in-row pair array
    O(|bucket|²) inside ONE row — unlike the old self-join, whose
    quadratic pairs at least spilled as rows, the agg form would hit
    executor memory or the 2^31 array-element limit. With the cap, the
    in-row pair array is ≤ C(cap, 2) structs (~32 K at 256) and the
    collected id array ≤ cap. The cap is the safety net; the production
    recall lever is band/row count (more, narrower bands → smaller
    buckets). Within-bucket ranking is md5(id) — unbiased w.r.t. id
    assignment order. The window rides the same (band_id, band_key)
    hash partitioning the groupBy needs, so it adds a sort but no
    second exchange."""
    from pyspark.sql import Window

    n_bands = k // rows_per_band
    bands = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
                )
            )
            for b in range(n_bands)
        ]
    )
    banded = sig.select(
        F.col(id_col), F.posexplode(bands).alias("band_id", "band_key")
    )
    w = Window.partitionBy("band_id", "band_key").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    capped = (
        banded.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(bucket_cap))
        .drop("__rn")
    )
    buckets = (
        capped.groupBy("band_id", "band_key")
        .agg(F.array_sort(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return (
        buckets.select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(ids, (x, i) -> transform("
                        "slice(ids, i + 2, size(ids)), "
                        "y -> struct(x AS id_a, y AS id_b)))"
                    )
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def _shared_counts(
    sh: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 1,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Shared-shingle counts per co-occurring doc pair (id_a < id_b) via
    the inverted-index join — the common core of ``jaccard_pairs`` and
    ``containment_pairs``. With ``candidates`` the join is pushed through
    the candidate set (cost ∝ candidate volume); without it all
    co-occurring pairs are counted (the exact-baseline path)."""
    if candidates is not None:
        a_sh = sh.withColumnsRenamed({id_col: "id_a"})
        b_sh = sh.withColumnsRenamed({id_col: "id_b"})
        shared = (
            candidates.join(a_sh, "id_a")
            .join(b_sh, ["id_b", "s"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("shared"))
            .filter(F.col("shared") >= min_shared)
        )
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        shared = (
            a.join(b, (F.col("a.s") == F.col("b.s"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
            )
            .agg(F.count("*").alias("shared"))
            .filter(F.col("shared") >= min_shared)
        )
    return shared


def jaccard_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 1,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard via inverted-index join: count shared shingles per
    doc pair, derive |A∪B| from per-doc set sizes. Returns
    (id_a, id_b, shared, union_size, jaccard).

    With ``candidates`` (an (id_a, id_b) frame, e.g. from LSH banding),
    only those pairs are verified: the shingle join is pushed through the
    candidate set, so cost scales with candidate volume — NOT with the
    full co-occurrence matrix. Without it, all co-occurring pairs are
    scored (the exact-baseline path; quadratic in bucket sizes)."""
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    shared = _shared_counts(sh, id_col, min_shared, candidates)
    out = (
        shared.join(sizes.withColumnsRenamed({id_col: "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "sz": "sz_b"}), "id_b")
        .withColumn("union_size", F.col("sz_a") + F.col("sz_b") - F.col("shared"))
        .withColumn(
            "jaccard", F.col("shared").cast("double") / F.col("union_size").cast("double")
        )
    )
    return out.select("id_a", "id_b", "shared", "union_size", "jaccard")


def containment_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 1,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Partial-duplicate detection via set containment: for each
    co-occurring doc pair, containment = |A∩B| / min(|A|, |B|) — the
    overlap normalized by the SMALLER shingle set. A short document
    embedded verbatim in a longer one (a quoted article, a template
    body, an excerpt) scores 1.0 here while Jaccard ≈ |A|/|B| shrinks
    toward 0 as the host grows — exactly the asymmetric near-dup case
    token-set Jaccard under-reports (same normalization as Broder's
    containment measure, "On the resemblance and containment of
    documents", SEQUENCES '97; the corpus-internal twin of
    ``curate.containment_decontaminate``'s doc-vs-benchmark direction).

    Physical shape: identical inverted-index funnel as
    ``jaccard_pairs`` — shared counts from the per-shingle join (cost ∝
    co-occurring pairs, or ∝ candidate volume when ``candidates`` from
    LSH banding is supplied), per-doc sizes joined back as two thin
    one-row-per-doc relations. The division is a single double op on
    exact integer counts — hash-stable across engines.

    Output: (id_a, id_b, shared, sz_a, sz_b, containment).
    """
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    shared = _shared_counts(sh, id_col, min_shared, candidates)
    out = (
        shared.join(sizes.withColumnsRenamed({id_col: "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({id_col: "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "containment",
            F.col("shared").cast("double")
            / F.least("sz_a", "sz_b").cast("double"),
        )
    )
    return out.select("id_a", "id_b", "shared", "sz_a", "sz_b", "containment")


def df_capped_shingles(
    sh: DataFrame, df_cap: int, id_col: str = "doc_id"
) -> DataFrame:
    """Drop shingles whose corpus document frequency exceeds ``df_cap``
    — the production pruning for inverted-index pair scoring. The
    co-occurrence join is quadratic in posting-list length, and ONLY
    boilerplate shingles (navigation chrome, disclaimers, template
    fills) have long lists; they carry no near-dup signal precisely
    because they appear everywhere. The sf0.1→sf1 probe measured the
    uncapped containment join at scaling exponent 1.21 (superlinear);
    capped at df ≤ 100 it returns to ~linear, because pair volume per
    shingle is bounded by df_cap² while discriminative shingles — the
    ones that actually witness a shared passage — are untouched.

    Shape: one df aggregation (map-side combined, one row per distinct
    shingle) + a co-partitioned semi-shaped join back on the shingle
    key. Downstream sizes/containment are then DEFINED over
    discriminative shingles only — document that in the consumer."""
    keep = (
        sh.groupBy("s")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") <= int(df_cap))
        .select("s")
    )
    return sh.join(keep, "s").select(id_col, "s")


def capped_posting_lists(
    sh: DataFrame, df_cap: int, id_col: str = "doc_id"
) -> DataFrame:
    """The df-capped inverted index as POSTING ARRAYS: one corpus pass
    (``groupBy(shingle).collect_list``), boilerplate shingles dropped by
    the same df ≤ cap rule as ``df_capped_shingles``. Because the cap
    bounds every surviving array at ``df_cap`` ids, the relation is safe
    to materialize and lets pair generation happen IN-ROW (double
    explode of a bounded array — no self-join, no second corpus pass).
    This is the production entry point for the capped containment /
    Jaccard scorers; r4 measured it 2.5× faster than the join-back
    shape at sf0.1 with bit-identical output.

    Output: (s, ids) — ids bounded by df_cap. Do NOT use uncapped:
    a viral shingle's unbounded array is exactly the OOM this cap
    exists to prevent."""
    return (
        sh.groupBy("s")
        .agg(F.collect_list(id_col).alias("ids"))
        .filter(F.size("ids") <= int(df_cap))
    )


def _posting_pairs_and_sizes(posts: DataFrame):
    """Shared core of the capped pair scorers: per-pair shared-shingle
    counts via in-row double explode of the bounded posting arrays
    (pair volume ≤ df_cap² per shingle, generated without any join),
    plus per-doc capped set sizes from the same relation. ``posts``
    feeds both branches — the caller passes a persisted frame (bounded
    arrays, far smaller than the pair volume) and owns the cache."""
    shared = (
        posts.select(F.explode("ids").alias("id_a"), "ids")
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    sizes = (
        posts.select(F.explode("ids").alias("__id"))
        .groupBy("__id")
        .agg(F.count("*").alias("sz"))
    )
    return shared, sizes


def capped_containment_pairs(
    sh: DataFrame,
    df_cap: int,
    id_col: str = "doc_id",
    min_shared: int = 1,
) -> DataFrame:
    """Production form of ``containment_pairs`` over the df-capped
    index: same output, same semantics (containment over discriminative
    shingles only), but built from ``capped_posting_lists`` — ONE
    corpus explode, in-row pair generation, no inverted self-join.
    Cache contract: the bounded postings relation is persisted here and
    owned by the caller (unpersist / clearCache after materializing).

    Output: (id_a, id_b, shared, sz_a, sz_b, containment)."""
    # persisted; filled by its first consumer (r11: the dedicated
    # eager-fill job was re-measured on a quiet host as pure overhead —
    # no concurrent duplicate evaluation; see OPTIMIZATION_r11.md)
    posts = capped_posting_lists(sh, df_cap, id_col).persist()
    shared, sizes = _posting_pairs_and_sizes(posts)
    if min_shared > 1:
        shared = shared.filter(F.col("shared") >= int(min_shared))
    out = (
        shared.join(sizes.withColumnsRenamed({"__id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"__id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "containment",
            F.col("shared").cast("double") / F.least("sz_a", "sz_b").cast("double"),
        )
    )
    return out.select("id_a", "id_b", "shared", "sz_a", "sz_b", "containment")


def topk_containment_pairs(
    sh: DataFrame,
    df_cap: int,
    k_per_doc: int = 3,
    id_col: str = "doc_id",
    min_shared: int = 1,
) -> DataFrame:
    """EMISSION-BOUNDED containment (VERDICT r8 item 3): per document,
    its ``k_per_doc`` highest-containment partners — output ≤ N·k rows
    BY CONTRACT, the same bounded-output design as
    ``bottomk_containment_pairs``. ``capped_containment_pairs`` bounds
    WORK (df-capped postings keep pair generation ≤ cap² per shingle)
    but emits every above-threshold pair, and the TRUE pair count can
    grow quadratically (the r8 scale probe measured exp 1.04 on the
    replicated fixture purely from answer volume); at 100 TB an
    answer-volume quadratic is still a quadratic. A dedup consumer
    only acts on the strongest partners per doc anyway, so the ranked
    cut loses nothing downstream.

    Physical shape (r11 optimization round — guide §2.4 remove
    shuffles, §5 caching only when reused): ONE LINEAR PIPELINE, no
    persist, no joins. The bounded posting arrays explode in-row into
    DIRECTIONAL pairs (d, o) for every ordered pair of distinct ids
    PLUS one SELF-PAIR marker (x, x) per posting element; one hash
    aggregation then counts every group, so a pair group's count is
    the shared-shingle count and a self-pair group's count is that
    doc's capped set size (exactly ``_posting_pairs_and_sizes``'s
    ``sizes``, which this replaces). Two windows attach the sizes
    in-row (``max`` of the self-pair count over each endpoint's
    partition — no size join, no second pass over the postings), and
    the ranked cut shares the doc_id window partitioning. The r10 form
    persisted + eager-filled the posting relation (a dedicated fill
    job) and evaluated the sizes aggregation twice (once per broadcast
    build); this form consumes the postings exactly once, so the cache
    and its fill job are gone (profiled on the r10 plan: 2 duplicate
    ~2-3 CPU-s sizes stages + one fill job + count stage removed).
    Ordering (containment DESC, partner id ASC) is exact-integer-ratio
    deterministic, hence hash-checkable.

    Output: (doc_id, other_id, shared, sz_doc, sz_other, containment,
    rnk) — directional: each pair appears under BOTH endpoints (when
    it survives both cuts), like the bottom-k twin."""
    from pyspark.sql import Window as W

    posts = capped_posting_lists(sh, df_cap, id_col)
    # canonical (least, greatest) pairs — each unordered pair ONCE —
    # plus one (x, x) self-pair marker per element, in ONE explode.
    # shingle frames are distinct (id, s), so ids holds no duplicate
    # values and d != o exactly separates pairs from markers. The
    # aggregation input is C(n,2)+n structs per posting row; the pair
    # relation is symmetrized AFTER the count (post-agg volume), not
    # before.
    ex = posts.select(
        F.explode(
            F.expr(
                "concat("
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), "
                "y -> struct(least(x, y) AS d, greatest(x, y) AS o)))), "
                "transform(ids, x -> struct(x AS d, x AS o)))"
            )
        ).alias("p")
    ).select("p.d", "p.o")
    cnt = ex.groupBy("d", "o").agg(F.count("*").alias("cnt"))
    is_marker = F.col("d") == F.col("o")
    # in-row symmetrization: pair groups emit both directions, marker
    # groups pass through once (they are their own mirror image)
    sym = cnt.select(
        F.explode(
            F.when(
                is_marker,
                F.array(F.struct("d", "o", "cnt")),
            ).otherwise(
                F.array(
                    F.struct("d", "o", "cnt"),
                    F.struct(
                        F.col("o").alias("d"), F.col("d").alias("o"), "cnt"
                    ),
                )
            )
        ).alias("p")
    ).select("p.d", "p.o", "p.cnt")
    w_o = W.partitionBy("o")
    w_d = W.partitionBy("d")
    sized = sym.withColumn(
        "sz_other", F.max(F.when(is_marker, F.col("cnt"))).over(w_o)
    ).withColumn("sz_doc", F.max(F.when(is_marker, F.col("cnt"))).over(w_d))
    pairs = sized.filter(~is_marker & (F.col("cnt") >= int(min_shared))).select(
        F.col("d").alias("doc_id"),
        F.col("o").alias("other_id"),
        F.col("cnt").alias("shared"),
        "sz_doc",
        "sz_other",
        (
            F.col("cnt").cast("double")
            / F.least("sz_doc", "sz_other").cast("double")
        ).alias("containment"),
    )
    w = W.partitionBy("doc_id").orderBy(
        F.col("containment").desc(), F.col("other_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= int(k_per_doc))
        .select(
            "doc_id", "other_id", "shared", "sz_doc", "sz_other",
            "containment", F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def capped_jaccard_pairs(
    sh: DataFrame,
    df_cap: int,
    id_col: str = "doc_id",
    min_shared: int = 1,
) -> DataFrame:
    """Production form of ``jaccard_pairs`` over the df-capped index —
    same posting-array shape as ``capped_containment_pairs`` (union
    size from the capped per-doc sizes). Cache contract as there.

    Output: (id_a, id_b, shared, union_size, jaccard)."""
    # persisted; filled by its first consumer (r11: dedicated fill
    # re-measured as pure overhead — see OPTIMIZATION_r11.md)
    posts = capped_posting_lists(sh, df_cap, id_col).persist()
    shared, sizes = _posting_pairs_and_sizes(posts)
    if min_shared > 1:
        shared = shared.filter(F.col("shared") >= int(min_shared))
    out = (
        shared.join(sizes.withColumnsRenamed({"__id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"__id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn("union_size", F.col("sz_a") + F.col("sz_b") - F.col("shared"))
        .withColumn(
            "jaccard",
            F.col("shared").cast("double") / F.col("union_size").cast("double"),
        )
    )
    return out.select("id_a", "id_b", "shared", "union_size", "jaccard")


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 12,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.2,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → sign → band join →
    exact-Jaccard verify on candidates only.

    Scale shape — the shingle explosion is computed ONCE and persisted
    (VERDICT r5 item 3: the old form recomputed it for the verify pass,
    doubling cold cost):

    1. One ``groupBy(doc_id)`` over the persisted shingle explosion
       computes the k MinHash columns AND the set size together. The
       pre-explosion repartition hash-partitions on ``id_col``, so the
       groupBy needs no exchange and the 100×-larger explosion is
       produced already spread out. (Folding ``collect_set`` into this
       same agg was tried and rejected: it forces ObjectHashAggregate
       on the hot signature pass and caches set-valued rows — measured
       2–3× slower than persisting the flat explosion.)
    2. Verification semi-joins the persisted shingles to the (few) docs
       that appear in an LSH candidate pair, gathers their shingle
       sets, and scores exact Jaccard with ``array_intersect`` — cost
       proportional to candidate volume, never the full co-occurrence
       matrix; the corpus-side input is the cached flat explosion, not
       a re-scan. Eviction at 100 TB → transparent partition recompute;
       the persist is a cost hint, not a correctness dependency.
    """
    from pyspark import StorageLevel

    n_part = df.sparkSession.sparkContext.defaultParallelism
    sh = shingle_frame(df.repartition(n_part, id_col), text_col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # The shingle explosion is the expensive subtree every branch below
    # hangs off; it is filled by the FIRST consumer (the signature pass
    # pipelines the explosion straight into its partial aggregation,
    # and the verify semi-join runs strictly after the candidates
    # exist, so it always reads a warm cache). r11: the r10 dedicated
    # eager-fill job here was re-measured on a quiet host as pure
    # overhead — executor CPU 34.9 s WITHOUT it vs 42.2 s with it on
    # the recall eval (no concurrent duplicate evaluation; the fill's
    # extra cache pass was the waste), wall lower without it on both
    # consumers.

    prof = sh.groupBy(id_col).agg(*_minhash_aggs(k), F.count("*").alias("sz"))
    # Candidate pairs and per-candidate shingle sets are tiny relative to
    # the corpus but feed multiple joins below; persist so each subtree
    # is evaluated once.
    cand = lsh_candidate_pairs(prof, id_col, k, rows_per_band).persist()

    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # cand_ids volume is tuning-dependent (loose band/row settings on a
    # dup-heavy corpus inflate it), so no forced broadcast hint: the
    # plain semi-shape join lets AQE broadcast only when actually small.
    doc_sets = (
        sh.join(cand_ids, id_col)
        .groupBy(id_col)
        .agg(F.collect_set("s").alias("ss"), F.count("*").alias("sz"))
    ).persist()
    a = doc_sets.withColumnsRenamed({id_col: "id_a", "ss": "ss_a", "sz": "sz_a"})
    b = doc_sets.withColumnsRenamed({id_col: "id_b", "ss": "ss_b", "sz": "sz_b"})
    scored = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("shared", F.size(F.array_intersect("ss_a", "ss_b")).cast("bigint"))
        .withColumn("union_size", F.col("sz_a") + F.col("sz_b") - F.col("shared"))
        .withColumn(
            "jaccard",
            F.col("shared").cast("double") / F.col("union_size").cast("double"),
        )
    )
    return scored.select("id_a", "id_b", "shared", "union_size", "jaccard").filter(
        F.col("jaccard") >= jaccard_threshold
    )


def bottomk_containment_pairs(
    sh: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    threshold: float = 0.0,
) -> DataFrame:
    """Scalable DIRECTIONAL containment estimation via bottom-k hash
    sampling (Broder/Cohen bottom-k sketches): for each document A,
    its k smallest md5 shingle hashes are a uniform sample of H(A);
    probing them against other documents' FULL hash sets estimates
    containment(A in B) = |H(A) ∩ H(B)| / |H(A)| as m / min(k, |H(A)|),
    where m counts A's sampled hashes found in B. Exact whenever
    |H(A)| ≤ k (the sample IS the set).

    Why this is the production form: the exact containment join
    generates candidates from EVERY posting (quadratic in posting-list
    length — probe-measured exp 1.26); here the candidate-generating
    side carries only k rows per document, cutting candidate volume by
    |H|/k while the directional semantics — the whole point of
    containment — are preserved (pairs appear as (contained, host),
    not unordered). Compose with ``df_capped_shingles`` first to keep
    host-side posting lists bounded too.

    Physical shape: one per-doc bottom-k ranked window (local per-doc
    sort, bounded output k), one inverted-index join keyed on the
    sampled hash, one pair hash agg, one thin doc-keyed size join.
    The estimate is a single double division of exact integers.

    Output: (id_a, id_b, m, k_used, est_containment) — id_a is the
    contained-candidate side; est ≥ ``threshold``.
    """
    from pyspark.sql import Window as W

    h = sh.select(F.col(id_col), F.md5("s").alias("h"))
    sizes = h.groupBy(id_col).agg(F.count("*").alias("sz"))
    w = W.partitionBy(id_col).orderBy("h")
    bk = (
        h.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= int(k))
        .drop("__rn")
    )
    m = (
        bk.withColumnsRenamed({id_col: "id_a"})
        .join(h.withColumnsRenamed({id_col: "id_b"}), "h")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("m"))
    )
    k_used = F.least(F.col("sz"), F.lit(int(k)))
    est = (
        m.join(sizes.withColumnsRenamed({id_col: "id_a"}), "id_a")
        .withColumn("k_used", k_used.cast("bigint"))
        .withColumn(
            "est_containment",
            F.col("m").cast("double") / F.col("k_used").cast("double"),
        )
    )
    return est.select("id_a", "id_b", "m", "k_used", "est_containment").filter(
        F.col("est_containment") >= float(threshold)
    )


def capped_bottomk_containment_pairs(
    sh: DataFrame,
    df_cap: int,
    k: int = 8,
    id_col: str = "doc_id",
    threshold: float = 0.0,
) -> DataFrame:
    """``bottomk_containment_pairs`` composed with the df cap, built
    from ONE corpus pass: ``capped_posting_lists`` materializes the
    bounded inverted index, its explode is the hashed (doc, h) relation
    (persisted — it feeds sizes, the bottom-k, and the probe side of
    the containment join; caller owns the cache), and the per-doc
    bottom-k comes from ``slice(array_sort(collect_list))`` — a hash
    aggregation instead of a row_number window, so no per-doc sort
    partition and full map-side combining. r4 measured 1.7× faster
    than the join-back + window shape at sf0.1, bit-identical output.

    Output: (id_a, id_b, m, k_used, est_containment) — identical to
    ``bottomk_containment_pairs`` over ``df_capped_shingles``.

    r11 optimization round (guide §2.3 shuffle fewer passes, §2.4):
    the per-doc size and the bottom-k sample come from ONE grouping
    pass (the r10 form ran two separate aggregations over the cached
    hash relation — a duplicate full cache scan), and ``sz`` rides the
    probe rows into the pair aggregation (``max`` of a per-group
    constant), so the final doc-keyed size join is gone entirely. The
    hash relation keeps its persist — it still feeds two plan branches
    (the bottom-k aggregation and the probe side) — but is filled by
    its first consumer: the dedicated eager-fill job was re-measured
    on a quiet host as pure overhead (wall 2.87 s without vs 3.51 s
    with; executor CPU 38.8 vs 39.8 — no duplicate evaluation)."""
    posts = capped_posting_lists(sh, df_cap, id_col)
    h = posts.select(
        F.explode("ids").alias(id_col), F.md5("s").alias("h")
    ).persist()
    bk = (
        h.groupBy(id_col)
        .agg(
            F.count("*").alias("sz"),
            F.slice(F.array_sort(F.collect_list("h")), 1, int(k)).alias("__bh"),
        )
        .select(id_col, "sz", F.explode("__bh").alias("h"))
    )
    m = (
        bk.withColumnsRenamed({id_col: "id_a"})
        .join(h.withColumnsRenamed({id_col: "id_b"}), "h")
        .filter(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        # sz is constant within each (id_a, id_b) group (it is a
        # function of id_a alone); max() recovers it exactly
        .agg(F.count("*").alias("m"), F.max("sz").alias("sz"))
    )
    k_used = F.least(F.col("sz"), F.lit(int(k)))
    est = m.withColumn("k_used", k_used.cast("bigint")).withColumn(
        "est_containment",
        F.col("m").cast("double") / F.col("k_used").cast("double"),
    )
    return est.select("id_a", "id_b", "m", "k_used", "est_containment").filter(
        F.col("est_containment") >= float(threshold)
    )


def minhash_estimate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 12,
    rows_per_band: int = 2,
) -> DataFrame:
    """MinHash estimator diagnostics: for every LSH candidate pair,
    the signature-based Jaccard ESTIMATE (fraction of the k MinHash
    components that agree — the unbiased estimator the sketch theory
    promises) next to the EXACT shingle Jaccard, plus the absolute
    error. This is how k (signature width) is tuned on a real corpus:
    the error column shows directly whether k buys enough resolution
    for the dedup threshold in use.

    A matching MinHash component pins the same argmin shingle on both
    sides (h_j is injective on shingle strings via md5), so every
    candidate pair shares ≥ 1 shingle and the inner join against the
    exact verifier loses no pairs.

    Physical shape: signatures and candidates come from the standard
    LSH funnel (one groupBy pass + band-bucket join); the estimate is
    an in-row comparison after two thin signature joins keyed on doc
    id; exact Jaccard runs candidate-only (cost ∝ candidate volume).
    Estimate and exact are each a single integer-ratio division —
    hash-stable; the error is one IEEE subtraction of the two.

    Output: (id_a, id_b, est_jaccard, jaccard, abs_err).

    Cache lifetime: the candidate-pair frame is persisted because both
    the estimate branch and the exact-Jaccard verifier consume it, and
    the result is LAZY — unpersisting here would force a recompute when
    the caller materializes. The caller owns the cache: call
    ``spark.catalog.clearCache()`` (or unpersist via
    ``result.sparkSession``) once the result is materialized in a
    long-lived session. ``bigram_logprob``/``unigram_logprob`` in
    text.py follow the same contract.
    """
    n_part = df.sparkSession.sparkContext.defaultParallelism
    sh = shingle_frame(df.repartition(n_part, id_col), text_col, id_col)
    # persisted: sig feeds the candidate generator AND both sides of
    # the signature-compare join; cand feeds the estimate and the
    # exact verifier. Both are filled by their first consumers (r11:
    # the dedicated eager-fill jobs re-measured on a quiet host as
    # overhead — wall 5.01 s without vs 5.25 s with, CPU equal)
    sig = minhash_signatures(sh, id_col, k).persist()
    cand = lsh_candidate_pairs(sig, id_col, k, rows_per_band).persist()
    a = sig.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh{j}").alias(f"__a{j}") for j in range(k)],
    )
    b = sig.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh{j}").alias(f"__b{j}") for j in range(k)],
    )
    matches = sum(
        F.when(F.col(f"__a{j}") == F.col(f"__b{j}"), 1).otherwise(0)
        for j in range(k)
    )
    est = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (matches.cast("double") / F.lit(float(k))).alias("est_jaccard"),
        )
    )
    exact = jaccard_pairs(sh, id_col, candidates=cand).select(
        "id_a", "id_b", "jaccard"
    )
    return est.join(exact, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        "est_jaccard",
        "jaccard",
        F.abs(F.col("est_jaccard") - F.col("jaccard")).alias("abs_err"),
    )


def simhash_fingerprint(hashes: Column, n_bits: int = 32) -> Column:
    """n_bits-bit SimHash (n_bits ≤ 32) from a pre-materialized
    md5-per-distinct-token array column, explode-free: bit j votes
    +1/-1 by the j-th hex digit of each hash (same fingerprint
    definition as ``dedup.simhash``). ONE fold computes all votes as an
    accumulator array — pass the hash array as a real column (not an
    inline expression) so it is computed once, not per vote. The 32-bit
    default (every md5 hex digit) is the scale-safe key: a 16-bit space
    is collision-dominated beyond ~10M docs (65,536 buckets), so
    narrower widths are only for explicitly local/toy use."""
    n = int(n_bits)
    n_chunks = (n + 7) // 8
    # one conv per 8 hex digits; bit j votes +1 iff hex digit j >= '8'
    # <=> bit 3 of that digit is set. HOF lambdas evaluate interpreted,
    # so the vote tally is packed: per token, (chunk >> 3) & 0x11111111
    # spreads the 8 per-digit indicator bits into nibble fields of ONE
    # bigint (2 ops/chunk instead of 8 per-bit extractions), and nibble
    # fields accumulate across tokens in blocks of 15 (the nibble
    # capacity) before one per-block unpack into the 32 running counts.
    # ~6x fewer interpreted ops per token than per-bit tallying; the
    # counts — and therefore the fingerprint — are bit-identical.
    chunks = F.transform(
        hashes,
        lambda x: F.array(*[
            F.conv(F.substring(x, 1 + 8 * c, 8), 16, 10).cast("bigint")
            for c in range(n_chunks)
        ]),
    )
    n_tok = F.size(hashes)
    zero_counts = F.array_repeat(F.lit(0).cast("bigint"), n)
    zero_packed = F.array_repeat(F.lit(0).cast("bigint"), n_chunks)
    spread_mask = F.lit(0x11111111).cast("bigint")

    def _spread(ch):
        return F.transform(ch, lambda v: F.shiftright(v, 3).bitwiseAND(spread_mask))

    def _unpack(packed):
        # count for global digit j lives in chunk j//8, nibble 7-(j%8)
        return F.array(*[
            F.shiftright(
                F.element_at(packed, (j // 8) + 1), 4 * (7 - (j % 8))
            ).bitwiseAND(15)
            for j in range(n)
        ])

    def _acc(c, p, t):
        return F.struct(c.alias("c"), p.alias("p"), t.alias("t"))

    # The flush branch reads ONLY accumulator fields (acc["p"], acc["t"])
    # — HOF lambdas inline expression trees at every reference, so any
    # freshly-computed array referenced 32 times by the unpack would be
    # recomputed 32 times; a field access is a plain read.
    def _merge(acc, ch):
        return F.when(
            acc["c"] == 15,
            _acc(
                F.lit(1),
                _spread(ch),
                F.zip_with(acc["t"], _unpack(acc["p"]), lambda a, x: a + x),
            ),
        ).otherwise(
            _acc(
                acc["c"] + 1,
                F.zip_with(acc["p"], _spread(ch), lambda a, s: a + s),
                acc["t"],
            )
        )

    # finish: fold the residual packed block into the counts, then the
    # majority vote: votes_j = 2*cnt_j - n_tok > 0  <=>  2*cnt_j > n_tok
    def _finish(acc):
        counts = F.zip_with(acc["t"], _unpack(acc["p"]), lambda a, x: a + x)
        return F.aggregate(
            F.zip_with(
                counts,
                F.sequence(F.lit(0), F.lit(n - 1)),
                lambda c, j: F.when(c * 2 > n_tok, F.pow(F.lit(2.0), j)).otherwise(
                    F.lit(0.0)
                ),
            ),
            F.lit(0.0),
            lambda acc2, x: acc2 + x,
        )

    fp = F.aggregate(
        chunks, _acc(F.lit(0), zero_packed, zero_counts), _merge, _finish
    )
    return fp.cast("bigint")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 32,
) -> DataFrame:
    """32-bit SimHash per document, computed fully in-row (one fold over
    the distinct-token md5 array — no explode, no shuffle): bit j votes
    +1/-1 by the j-th hex digit of each distinct token's md5 (MSB of the
    nibble); fingerprint is the weighted-majority bit vector as bigint.

    Token-less documents (empty/punctuation-only text) are dropped —
    they have no fingerprint, matching the per-token SQL oracle and
    preventing a spurious fp=0 near-dup group."""
    hs = F.transform(F.array_distinct(tokens(text_col)), F.md5)
    staged = df.select(F.col(id_col), hs.alias("__hs")).filter(
        F.size("__hs") > 0
    )
    return staged.select(
        F.col(id_col),
        simhash_fingerprint(F.col("__hs"), n_bits).alias("simhash"),
    )


def simhash_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup groups = docs sharing an identical 32-bit SimHash
    fingerprint (Hamming distance 0 buckets — 4.3B key space, so groups
    are vote-identical documents, not hash collisions, even at
    billions of docs; ``simhash_hamming_pairs`` generalizes to
    distance > 0 via banded keys)."""
    s = simhash(df, text_col, id_col)
    return (
        s.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") >= 2)
    )


def simhash_hamming_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 32,
    band_cap: int | None = None,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs within Hamming distance ``max_hamming`` on the
    n_bits-bit SimHash — the banded generalization of
    ``simhash_dup_groups`` that also catches near-dups whose
    fingerprints differ in up to ``max_hamming`` bits.

    Pigeonhole banding (Manku et al., WWW'07 "Detecting Near-Duplicates
    for Web Crawling"): split the fingerprint into ``max_hamming + 1``
    contiguous bit bands — two fingerprints within Hamming distance k
    MUST agree exactly on at least one band, so candidates are found by
    an equality self-join per (band_id, band_value) and recall is exact
    (no probabilistic misses, unlike MinHash banding). Verification is
    ``bit_count(xor)`` on candidates only.

    100 TB shape: the join touches only docs sharing an ~(n_bits/(k+1))-
    bit band key — never all-pairs; band values spread uniformly so the
    per-bucket fan-in is corpus_size / 2^band_width per band. The xor
    verify is a pure in-row integer op (whole-stage codegen).

    ``fingerprints`` accepts a precomputed ``simhash(df)`` frame
    (columns (id_col, simhash)) so a caller composing several
    fingerprint consumers (e.g. ``keep_central``) can tokenize +
    fingerprint the corpus ONCE, persist, and share it.

    Output: (id_a, id_b, hamming) with hamming ≤ max_hamming
    (0 = identical fingerprints).
    """
    k = int(max_hamming)
    n_bands = k + 1
    base = n_bits // n_bands
    extra = n_bits % n_bands
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    s = (
        fingerprints
        if fingerprints is not None
        else simhash(df, text_col, id_col, n_bits)
    )
    band_vals = F.array(
        *[
            F.shiftright(F.col("simhash"), offsets[i]).bitwiseAND(
                F.lit((1 << widths[i]) - 1)
            )
            for i in range(n_bands)
        ]
    )
    banded = s.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(band_vals).alias("band_id", "band_val"),
    )
    if band_cap is not None:
        # md5-ranked bucket cap (the pq_blocked_dup_pairs / semantic
        # cells guardrail): a boilerplate mega-bucket contributes at
        # most band_cap² /2 pairs instead of going quadratic in its
        # membership; total candidate volume is then bounded by
        # n_bands · 2^band_width · C(band_cap, 2) at ANY corpus size.
        from pyspark.sql import Window as W

        wb = W.partitionBy("band_id", "band_val").orderBy(
            F.md5(F.col(id_col).cast("string")), id_col
        )
        banded = (
            banded.withColumn("__bc", F.row_number().over(wb))
            .filter(F.col("__bc") <= int(band_cap))
            .drop("__bc")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("__fa"),
            F.col("b.simhash").alias("__fb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb"))).cast("bigint")
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= k)
        .select("id_a", "id_b", "hamming")
    )


def scaled_vec(col, scale: int = 1000):
    """float array → integer-scaled bigint array: floor(x*scale + 0.5).
    Integer dot products are exact under any summation order, making
    cosine computations bit-identical across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        c, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("bigint")
    )


def sqnorm_expr(v):
    """Exact-integer squared norm of a scaled vector."""
    return F.aggregate(
        F.transform(v, lambda x: x * x), F.lit(0).cast("bigint"), lambda a, x: a + x
    )


def cosine_from_norms(va, vb, na, nb):
    """Exact-integer cosine given each side's precomputed squared norm.

    Higher-order-function folds are interpreted (no codegen), so inside
    a pairwise join the norms must be computed once per VECTOR before
    the join, not once per PAIR — identical float64 result (the inputs
    are exact integers either way), ~3x less lambda work."""
    dot = F.aggregate(
        F.zip_with(va, vb, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    return dot.cast("double") / F.sqrt((na * nb).cast("double"))


def cosine_expr(va, vb):
    """Exact-integer cosine between two scaled vectors."""
    return cosine_from_norms(va, vb, sqnorm_expr(va), sqnorm_expr(vb))


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
) -> DataFrame:
    """All-pairs embedding near-dup (correctness baseline — the scale
    path prunes the pair space with LSH buckets first, see
    similarity.lsh_bucket_topk)."""
    v = df.select(F.col(id_col), scaled_vec(vec_col).alias("e")).withColumn(
        "n", sqnorm_expr(F.col("e"))
    )
    a = v.withColumnsRenamed({id_col: "id_a", "e": "ea", "n": "na"})
    b = v.withColumnsRenamed({id_col: "id_b", "e": "eb", "n": "nb"})
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine_from_norms(F.col("ea"), F.col("eb"), F.col("na"), F.col("nb"))
    return pairs.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def dup_components(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_iters: int = 20,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Transitive near-duplicate components: connected components over
    the union of the exact-content relation (shared md5 of normalized
    text) and the SimHash near-dup relation (shared 32-bit
    fingerprint). A doc that exact-matches B while B simhash-matches C
    lands all three in one component — the multi-hop closure that
    pairwise dedup misses.

    100 TB shape: label propagation through ATTRIBUTE nodes (hash /
    fingerprint values), never a doc×doc pairwise join — each iteration
    is two map-side-combinable min-aggregations over the (doc, attr)
    edge list (classic alternating bipartite min-label propagation; the
    same contraction idea as Kiveris et al.'s "Connected Components in
    MapReduce", SOCC 2014). Iterations ≤ component diameter (tiny for
    dup clusters); the fixpoint — component = min doc id, reached
    regardless of iteration order — is what makes the result
    deterministic and cluster-size-independent.

    ``fingerprints`` accepts a precomputed ``simhash(df)`` frame, same
    contract as ``simhash_hamming_pairs``.

    Output: (id_col, component) for every input document (singletons
    keep their own id).
    """
    h = F.md5(normalize(text_col))
    base = df.select(F.col(id_col), F.col(text_col))
    hashes = base.select(
        F.col(id_col), F.concat(F.lit("h:"), h).alias("attr")
    )
    s = fingerprints if fingerprints is not None else simhash(df, text_col, id_col)
    sims = s.select(
        F.col(id_col),
        F.concat(F.lit("s:"), F.col("simhash").cast("string")).alias("attr"),
    )
    return _attr_label_propagation(base, hashes.union(sims), id_col, max_iters)


def _attr_label_propagation(
    base: DataFrame, attrs_in: DataFrame, id_col: str, max_iters: int
) -> DataFrame:
    """The bipartite min-label-propagation core of ``dup_components``,
    factored out so components can run over ANY (id, attr) incidence
    relation — shared content hashes, fingerprints, or explicit pair
    ids (``edge_components``). Semantics and shuffle shape unchanged.
    Output: (id_col, component)."""
    attrs = attrs_in.persist()

    labels = base.select(F.col(id_col), F.col(id_col).alias("lbl")).persist()
    # Fixpoint test: labels are monotone non-increasing (every update is
    # a `least`), so Σ lbl strictly decreases iff ANY label changed —
    # one map-combinable agg on the already-persisted frame replaces
    # the old new-vs-old join + count (one fewer shuffle per round).
    prev_sum = None
    for it in range(int(max_iters)):
        if it == 0:
            # first round: lbl == id by construction, so the attr min
            # is just min(id) over the edge list — no join needed
            attr_min = attrs.groupBy("attr").agg(F.min(id_col).alias("al101"))
        else:
            attr_min = (
                attrs.join(labels, id_col)
                .groupBy("attr")
                .agg(F.min("lbl").alias("al101"))
            )
        prop = (
            attrs.join(attr_min, "attr")
            .groupBy(id_col)
            .agg(F.min("al101").alias("plbl"))
        )
        # localCheckpoint (not persist): persist caches the DATA but the
        # logical plan still nests every prior round, so Catalyst
        # re-analysis grows geometrically with iteration count (measured
        # 1.7s → 4.0s → 19s per round before this landed). Checkpointing
        # truncates lineage to a LogicalRDD — constant-size plans, flat
        # per-round cost — the standard iterative-graph discipline
        # (GraphFrames does the same). eager=False: the fixpoint agg
        # below is the materializing action.
        new_labels = (
            labels.join(prop, id_col, "left")
            .select(
                F.col(id_col),
                F.least(F.col("lbl"), F.coalesce("plbl", F.col("lbl"))).alias(
                    "lbl"
                ),
            )
            .localCheckpoint(eager=False)
        )
        cur_sum = new_labels.agg(F.sum("lbl")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        # SUM over an EMPTY label frame is NULL every round: without the
        # None-break, empty input (the pruned-everything 100 TB shape)
        # grinds all max_iters chained-join rounds before returning its
        # zero rows (r7 regression when the sum fixpoint replaced the
        # new-vs-old join; caught by test_empty_inputs stalling)
        if cur_sum is None or cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    attrs.unpersist()
    return labels.select(F.col(id_col), F.col("lbl").alias("component"))


def edge_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over an EXPLICIT undirected pair list
    (id_a, id_b) — the composition entry point for pipelines that
    already verified their near-dup pairs (MinHash-LSH, SemDeDup):
    each pair becomes one attribute node, then the same bipartite
    min-label propagation as ``dup_components`` (a doc→pair→doc hop is
    a graph hop, so convergence is the component-diameter bound).
    ``ids`` supplies the full node universe — singletons keep their
    own id.

    Scale shape: the iterative rounds run ONLY over pair MEMBERS — a
    node in no pair can never change label, and after LSH+verify the
    pair graph is a small fraction of the corpus (a few % of docs at
    real dup rates), so each round's joins are sized by 2·|pairs|,
    not N. Singletons rejoin once at the end via one anti-join.
    Output: (id_col, component)."""
    attr = F.concat(
        F.lit("p:"),
        F.col("id_a").cast("string"),
        F.lit("|"),
        F.col("id_b").cast("string"),
    )
    attrs = pairs.select(
        F.col("id_a").alias(id_col), attr.alias("attr")
    ).unionAll(pairs.select(F.col("id_b").alias(id_col), attr.alias("attr")))
    members = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionAll(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    labeled = _attr_label_propagation(members, attrs, id_col, max_iters)
    singletons = ids.select(F.col(id_col)).join(
        members, id_col, "left_anti"
    ).select(F.col(id_col), F.col(id_col).alias("component"))
    return labeled.unionByName(singletons)


def levenshtein_pairs(
    df: DataFrame,
    max_distance: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Edit-distance near-dup verification: each document is verified
    by exact Levenshtein distance against its block's CANONICAL (min-id)
    document — catching small in-place edits (typo fixes, template
    fills) that token-set methods score as identical but byte-exact
    dedup misses.

    Physical shape, in cost order: (1) blocking is a 32-bit SimHash
    (all 32 md5 digits — still typo-robust, but random collisions
    vanish; a 16-bit key over a 50k-doc corpus yields ~20k accidental
    pairs); (2) verification is doc-vs-canonical, LINEAR in cluster
    size — dup clusters are exactly where all-pairs blocking explodes
    quadratically (a 400-doc cluster is 400 DPs here, 80k as pairs);
    (3) the length-difference lower bound prunes before the O(len²) DP,
    which runs JVM-side on what remains.

    The canonicals join is a plain shuffle join on ``simhash`` — one
    row per duplicate-containing block INCLUDING canonical text is
    corpus-proportional on a dup-heavy corpus, so a forced broadcast
    would OOM the driver at scale; AQE still auto-broadcasts it when
    it measures small. Skew note: a pathological block (one template
    duplicated millions of times) concentrates on one ``simhash`` key —
    AQE skew-join splits the probe side, and the canonical side is one
    row per key so the join itself cannot amplify.

    Output: (keep_id, doc_id, distance) — doc verified as a near-dup of
    its block canonical, distance ≤ max_distance.
    """
    hs = F.transform(F.array_distinct(tokens(text_col)), F.md5)
    # pre-filter on the cheap equivalent predicate (⟺ ≥1 token) — a
    # size(__hs) filter above the projection would re-inline the md5
    # transform into the pushed-down predicate (r9 HOF-pushdown lesson)
    staged = df.filter(normalize(text_col) != "").select(
        F.col(id_col), F.col(text_col), hs.alias("__hs")
    )
    # eager-filled: s feeds the canonical-block agg AND the member join
    # (see eager_fill)
    s = eager_fill(staged.select(
        F.col(id_col),
        F.col(text_col),
        simhash_fingerprint(F.col("__hs"), 32).alias("simhash"),
    ).persist())
    canon = s.groupBy("simhash").agg(
        F.min(id_col).alias("keep_id"),
        F.min_by(text_col, F.col(id_col)).alias("__ktext"),
        F.count("*").alias("__n"),
    ).filter(F.col("__n") >= 2)
    pairs = s.join(canon, "simhash").filter(
        (F.col(id_col) != F.col("keep_id"))
        # length-difference lower bound: |len_a - len_b| <= d is implied
        # by distance <= d, so this prunes before the O(len^2) DP
        & (
            F.abs(F.length(text_col) - F.length("__ktext"))
            <= F.lit(int(max_distance))
        )
    )
    d = pairs.withColumn(
        "distance", F.levenshtein(text_col, "__ktext").cast("bigint")
    )
    return d.filter(F.col("distance") <= int(max_distance)).select(
        "keep_id", F.col(id_col), "distance"
    )


def chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 3,
) -> DataFrame:
    """Passage-level exact dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", at chunk rather than
    suffix-array granularity): split every document into non-overlapping
    ``chunk_words``-word passages, keep only the corpus-wide FIRST
    occurrence of each distinct passage (ordered by (doc_id, chunk
    index)), and reassemble each document from its surviving passages.
    Unlike document-level dedup this removes boilerplate repeated
    *inside* otherwise-distinct documents (headers, disclaimers,
    navigation chrome).

    Physical shape — skew-immune by construction, ONE corpus explode,
    NO window and NO occurrence-level join: the global first occurrence
    per passage hash is a map-side-combinable
    ``groupBy(hash).agg(min(struct(doc_id, ci)), any_value(chunk))`` —
    a viral boilerplate passage collapses to ONE row per map task
    before the shuffle (the passage text rides along because it is
    hash-determined), where a window ``row_number`` over the hash
    partition would funnel every occurrence through a single
    unsplittable sort task (AQE splits skewed joins, not Window
    partitions). The agg output IS the kept-passage set; reassembly is
    a hash aggregation on ``id_col``, and per-doc chunk totals come
    straight from the in-row chunk-count expression — the only join is
    doc-keyed totals ⋈ doc-keyed reassembly.

    Output: (doc_id, n_chunks, n_kept, text_dedup) — one row per input
    document WITH non-NULL text; NULL-text documents are excluded (no
    passages to chunk — the SQL oracle applies the same exclusion), so
    coalesce NULLs to '' upstream if a row per input id is required.
    ``text_dedup`` is the space-joined surviving passages (empty string
    when every passage was seen earlier).
    """
    k = int(chunk_words)
    w = F.split(F.trim(F.col(text_col)), " ")
    base = df.select(
        F.col(id_col),
        F.ceil(F.size(w) / F.lit(k)).cast("bigint").alias("n_chunks"),
    ).filter(F.col("n_chunks").isNotNull())
    chunked = chunk_passages(df, text_col, id_col, chunk_words)
    firsts = chunked.groupBy(F.md5(F.col("chunk")).alias("__h")).agg(
        F.min(F.struct(F.col(id_col), F.col("ci"))).alias("__first"),
        F.any_value("chunk").alias("chunk"),
    )
    kept = firsts.select(
        F.col(f"__first.{id_col}").alias(id_col),
        F.col("__first.ci").alias("ci"),
        "chunk",
    )
    kept_text = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("ci"), F.col("chunk")))),
            lambda s: s.chunk,
        ),
        " ",
    )
    re = kept.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_kept"),
        kept_text.alias("text_dedup"),
    )
    return base.join(re, id_col, "left").select(
        F.col(id_col),
        "n_chunks",
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
        F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
    )

def chunk_passages(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 3,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split documents into non-overlapping ``chunk_words``-word
    passages: (id, ci, chunk) with ci the 0-based passage index. Pure
    in-row higher-order functions (sequence/slice/posexplode) — map-
    only, whole-stage codegen, works identically on batch frames and
    unbounded streams (no window, no state)."""
    k = int(chunk_words)
    w = F.split(F.trim(F.col(text_col)), " ")
    n_chunks = F.ceil(F.size(w) / F.lit(k)).cast("int")
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(F.slice(w, i * k + 1, k), " "),
            )
        ).alias("ci", "chunk"),
    )


def streaming_chunk_dedup(
    sdf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 3,
    event_time_col: str = "ingest_time",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``chunk_dedup``: documents arrive unbounded,
    every passage's corpus-wide FIRST arrival passes and later
    occurrences drop (``dropDuplicatesWithinWatermark`` keyed on the
    passage hash). State = one row per distinct passage inside the
    watermark horizon — bounded, evicted once no duplicate can still
    arrive; this is the ingest-time boilerplate guard in front of a
    training-data store (the batch op re-deduplicates history, the
    stream keeps it clean incrementally).

    Output (append mode): (chunk_hash, id, ci, chunk) — exactly one row
    per distinct passage; which document carried it is arrival order,
    so exactly-once tests key on ``chunk_hash`` only.
    """
    chunked = chunk_passages(
        sdf, text_col, id_col, chunk_words, extra_cols=(event_time_col,)
    )
    return (
        chunked.withColumn("chunk_hash", F.md5(F.col("chunk")))
        .withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark(["chunk_hash"])
        .select("chunk_hash", F.col(id_col), "ci", "chunk")
    )


def simhash_keep_best(
    df: DataFrame,
    scores: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    score_col: str = "avg_nll",
) -> DataFrame:
    """Near-dup groups with a QUALITY-keeper policy: groups are the
    identical-32-bit-SimHash buckets of ``simhash_dup_groups``, but the
    keeper is the member with the LOWEST ``score_col`` (ties broken by
    min id) — "keep the most fluent duplicate", the canonicalization
    real pipelines use when near-copies differ in boilerplate or OCR
    noise (pass ``unigram_logprob``'s per-token NLL as the score:
    lower = more fluent under the corpus's own LM).

    Physical shape: the in-row fingerprint joins the (id, score) frame
    on the id key, then ONE map-side-combinable hash agg (``min_by``
    on a (score, id) struct — field-by-field struct ordering, so the
    tie-break works for any orderable id type); no ranked window, so a
    viral duplicate group collapses per map task before the shuffle.
    The score itself must be deterministic across engines — avg_nll is
    rounded to 9 decimals before it leaves ``unigram_logprob``.

    Output: (simhash, n_docs, keep_id, keep_score), groups of ≥ 2.
    """
    s = simhash(df, text_col, id_col).join(
        scores.select(F.col(id_col), F.col(score_col)), id_col
    )
    pri = F.struct(
        F.col(score_col).alias("s"), F.col(id_col).alias("id")
    )
    return (
        s.groupBy("simhash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min_by(id_col, pri).alias("keep_id"),
            F.min(score_col).alias("keep_score"),
        )
        .filter(F.col("n_docs") >= 2)
    )


def duplicated_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document duplicated n-gram span detection — the signal
    behind exact-substring training-data dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better": long
    verbatim spans repeated across documents drive memorization even
    when whole-document similarity is low). Every ROLLING length-``n``
    word window is hashed, so a copied span is caught at ANY offset —
    unlike ``chunk_dedup``'s fixed non-overlapping passages, which
    miss a span that straddles a chunk boundary (contrast pinned in
    tests). Windows present in at least ``min_docs`` distinct
    documents are reported with their document frequency and keeper.

    Shape: pre-explosion repartition spreads the window explosion; the
    per-doc window list is already distinct (``shingles``), so one
    vocabulary-grain hash agg (map-side combined) finishes the job —
    output is duplicated-vocabulary-grain (Heaps-bounded), never pair
    count, and there is no join anywhere.

    Output: (gram_hash, n_docs, keep_id), n_docs >= min_docs.
    """
    n_part = df.sparkSession.sparkContext.defaultParallelism
    d = df.repartition(n_part, id_col).select(
        F.col(id_col), F.explode(shingles(tokens(text_col), int(n))).alias("s")
    )
    return (
        d.select(id_col, F.md5("s").alias("gram_hash"))
        .groupBy("gram_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") >= int(min_docs))
    )


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """The REMOVAL step of exact-substring dedup (Lee et al. 2022):
    rewrite every document with cross-document duplicated length-``n``
    word spans cut out, keeping each duplicated span only in its keeper
    document (min id per gram — the same keeper rule
    ``duplicated_ngram_spans`` reports). A copied paragraph is excised
    from every re-poster at ANY offset while the original keeps it —
    the memorization-driving verbatim repetition is gone, the unique
    prose around it survives (whole-doc dedup would throw both away).

    Semantics: positions are over the NORMALIZED token stream (the
    repo-wide ``tokens()`` normalization), and the rewritten text is
    the space-join of surviving tokens — the token-level counterpart
    of the paper's byte-level suffix-array cut (document-level
    formatting is not reconstructed). A document may be keeper for one
    gram and loser for another; every occurrence of a duplicated gram
    in a non-keeper doc is covered, overlapping covered windows union.
    Docs shorter than ``n`` tokens (no windows) pass through verbatim;
    token-less docs emit with empty text (doc grain is preserved —
    this is a rewriter, not a filter).

    100 TB shape: one tokenization feeds everything; the rolling
    window explosion is spread by a pre-explode repartition on id;
    duplicate detection is the vocabulary-grain map-side-combinable
    agg (no join); coverage joins windows to the duplicated-gram
    relation on the gram key (duplicated-vocabulary-grain — small,
    AQE broadcasts it); the rebuild is one (doc, pos) anti join plus a
    per-doc in-row sort. Everything is linear in corpus size — the
    same Ω(corpus) floor as detection, with no pair join anywhere.

    Output: (id_col, n_tokens, n_removed, text_dedup).
    """
    nn = int(n)
    n_part = df.sparkSession.sparkContext.defaultParallelism
    staged = df.repartition(n_part, id_col).select(
        F.col(id_col), tokens(text_col).alias("_t")
    )
    win_arr = F.when(
        F.size("_t") >= nn,
        F.transform(
            F.sequence(F.lit(1), F.size("_t") - nn + 1),
            lambda i: F.struct(
                i.cast("bigint").alias("pos"),
                F.md5(F.concat_ws("_", F.slice("_t", i, nn))).alias("gh"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:bigint,gh:string>>"))
    w = staged.select(F.col(id_col), F.explode(win_arr).alias("__w")).select(
        id_col, F.col("__w.pos").alias("pos"), F.col("__w.gh").alias("gh")
    )
    dup = (
        w.select(id_col, "gh")
        .distinct()
        .groupBy("gh")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
        .filter(F.col("n_docs") >= int(min_docs))
        .select("gh", "keep_id")
    )
    cov = (
        w.join(dup, "gh")
        .filter(F.col(id_col) != F.col("keep_id"))
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(nn - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    tokpos = staged.select(
        F.col(id_col),
        F.size("_t").cast("bigint").alias("n_tokens"),
        F.posexplode_outer("_t").alias("__p0", "tok"),
    ).select(
        id_col, "n_tokens", (F.col("__p0") + 1).cast("bigint").alias("pos"), "tok"
    )
    # LEFT join + flag (not an anti join): a fully-covered document
    # must still emit a row (empty rewrite) — doc grain is preserved.
    joined = tokpos.join(
        cov.withColumn("__cov", F.lit(1)), [id_col, "pos"], "left"
    )
    keep_row = F.col("__cov").isNull() & F.col("tok").isNotNull()
    rebuilt = F.concat_ws(
        " ",
        F.transform(
            F.array_sort(
                F.collect_list(F.when(keep_row, F.struct("pos", "tok")))
            ),
            lambda s: s["tok"],
        ),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.count(F.when(keep_row, F.lit(1))).alias("__n_kept"),
            rebuilt.alias("text_dedup"),
        )
        .select(
            id_col,
            "n_tokens",
            (F.col("n_tokens") - F.col("__n_kept")).cast("bigint").alias("n_removed"),
            "text_dedup",
        )
    )


def near_dup_centrality(
    df: DataFrame,
    n_iters: int = 3,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 10**9,
    damping_pct: int = 85,
    max_degree: int = 16,
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """PageRank-style centrality over the near-dup graph — an
    alternative KEEPER rule for dedup canonicalization: instead of
    min-id or best-quality, keep the document most CENTRAL in its
    near-duplicate neighborhood (the version other copies derive from
    tends to sit at the hub; leaf copies are truncations/mutations).

    Integer-exact power iteration: ranks are e9-scaled bigints, every
    division is explicit bigint floor division (Spark ``DIV`` ==
    DuckDB ``//`` for positive operands), so ``n_iters`` rounds are
    bit-deterministic across engines and partitionings — no float
    accumulates anywhere. The simplification vs textbook PageRank:
    dangling mass is dropped, not redistributed (ranks are used for
    ORDERING within a neighborhood, where the constant base term
    cancels) — documented, standard for ranking-only use.

    Shape: edges come from ``simhash_hamming_pairs`` (banded — never
    all-pairs), DEGREE-CAPPED to each node's ``max_degree`` nearest
    neighbors (by hamming then id — the kNN-graph truncation every
    production similarity graph applies: an uncapped near-dup clique
    of size c contributes c² edges, and boilerplate-heavy corpora have
    huge cliques), and persisted so the fingerprint pipeline runs
    once, not once per iteration; each iteration is one edge⋈rank
    shuffle join + one map-side-combinable inflow agg — the canonical
    distributed-PR shape, ``n_iters`` rounds of it. Edge volume is
    ≤ N·max_degree by construction at ANY corpus size.

    Output: (id_col, deg, rank_e9) for EVERY document (isolated docs
    keep the base rank with deg 0). ``deg`` is the capped out-degree.
    """
    pairs = simhash_hamming_pairs(
        df, max_hamming, text_col, id_col, band_cap=64,
        fingerprints=fingerprints,
    ).select("id_a", "id_b", F.col("hamming").alias("__ord"))
    return capped_pagerank(
        df.select(F.col(id_col)), pairs, id_col,
        n_iters=n_iters, scale=scale, damping_pct=damping_pct,
        max_degree=max_degree,
    )


def capped_pagerank(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    n_iters: int = 3,
    scale: int = 10**9,
    damping_pct: int = 85,
    max_degree: int = 16,
) -> DataFrame:
    """The integer-exact degree-capped PageRank core of
    ``near_dup_centrality``, factored out to run over ANY verified
    similarity pair list — ``pairs`` is (id_a, id_b, __ord) where
    ``__ord`` ranks a node's edges most-similar-first for the
    ``max_degree`` cap (Hamming ascending for SimHash, negated Jaccard
    for MinHash). ``ids`` is the node universe; isolated nodes keep
    the base rank with deg 0. Semantics, bounds, and shuffle shape are
    exactly the pre-r8 ``near_dup_centrality`` body.
    Output: (id_col, deg, rank_e9)."""
    from pyspark.sql import Window as W

    we = W.partitionBy("src").orderBy("__ord", "dst")
    # EAGER localCheckpoint (r10 optimization round): ``e`` is
    # referenced by deg, every power-iteration round, and the final
    # join — five references whose logical lineage otherwise repeats
    # the full banded-pair subtree (the SimHash pipeline when called
    # from near_dup_centrality), so the driver re-analyzed it per
    # action and concurrent branches re-computed it before a lazy
    # persist filled (see eager_fill). The capped edge list is
    # ≤ N·max_degree by construction — metadata-scale next to the
    # corpus — so truncating it to a LogicalRDD is the label-prop
    # discipline, not a fault-tolerance trade.
    e = (
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "__ord"
        )
        .unionAll(
            pairs.select(
                F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "__ord"
            )
        )
        .withColumn("__rn", F.row_number().over(we))
        .filter(F.col("__rn") <= int(max_degree))
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = ids.select(F.col(id_col).alias("node"))
    tot = nodes.agg(F.count("*").alias("N"))
    s, d = int(scale), int(damping_pct)
    r = nodes.crossJoin(F.broadcast(tot)).select(
        "node", "N", F.expr(f"CAST({s} AS BIGINT) DIV N").alias("r")
    )
    base = F.expr(f"CAST({(100 - d) * s} AS BIGINT) DIV (100 * N)")
    step = F.expr(
        f"CAST({d} AS BIGINT) * COALESCE(inflow, CAST(0 AS BIGINT)) DIV 100"
    )
    for _ in range(int(n_iters)):
        contrib = (
            r.join(e, F.col("node") == F.col("src"))
            .join(deg, "src")
            .select("dst", F.expr("r DIV deg").alias("c"))
        )
        inflow = contrib.groupBy("dst").agg(F.sum("c").alias("inflow"))
        r = (
            nodes.crossJoin(F.broadcast(tot))
            .join(inflow, F.col("node") == F.col("dst"), "left")
            .select("node", "N", (base + step).alias("r"))
        )
    return (
        r.join(deg, F.col("node") == F.col("src"), "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("deg"), F.lit(0)).cast("bigint").alias("deg"),
            F.col("r").cast("bigint").alias("rank_e9"),
        )
    )


def keep_central(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_iters: int = 3,
    max_hamming: int = 3,
) -> DataFrame:
    """Centrality-based canonicalization — the keeper-rule family's
    fourth member (min-id / keep-longest / keep-best-quality /
    KEEP-CENTRAL): within each transitive near-dup component
    (``dup_components``), keep the document with the highest PageRank
    centrality in the near-dup graph (``near_dup_centrality``) — the
    hub a cluster's copies derive from, rather than an arbitrary id or
    a length heuristic. Ties break on id, so the choice is
    deterministic.

    Shape: the two inputs are themselves bounded (label propagation +
    capped-graph power iteration); the composition adds one join on
    the doc id and one per-component ranked window (bounded by
    component size). Singletons are their own keepers.

    The tokenize→fingerprint pass — the dominant per-document cost —
    runs ONCE: ``simhash(df)`` is computed here, persisted, and
    threaded into BOTH halves via their ``fingerprints`` parameter
    (VERDICT r6 item: the previous composition fingerprinted the
    corpus twice, doubling the cold constant). ``dup_components``
    materializes during its fixpoint loop, so the cache is hot by the
    time the centrality half reads it. Cache lifetime: caller-owned,
    same contract as ``minhash_estimate_pairs``.

    Output: (component, keep_id, keep_rank_e9, n_members).
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window as W

    fp = eager_fill(
        simhash(df, text_col, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    )
    comp = dup_components(df, text_col, id_col, fingerprints=fp)
    cent = near_dup_centrality(
        df, n_iters=n_iters, max_hamming=max_hamming,
        text_col=text_col, id_col=id_col, fingerprints=fp,
    )
    return _component_keeper(comp, cent, id_col)


def _component_keeper(comp: DataFrame, cent: DataFrame, id_col: str) -> DataFrame:
    """Per-component argmax keeper shared by ``keep_central`` and
    ``fuzzy_dedup_e2e``: within each component keep the doc with the
    highest centrality, ties on id. Output: (component, keep_id,
    keep_rank_e9, n_members)."""
    from pyspark.sql import Window as W

    j = comp.join(cent, id_col)
    w = W.partitionBy("component").orderBy(
        F.col("rank_e9").desc(), F.col(id_col)
    )
    n = W.partitionBy("component")
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(n).cast("bigint"))
        .filter(F.col("__rn") == 1)
        .select(
            "component",
            F.col(id_col).alias("keep_id"),
            F.col("rank_e9").alias("keep_rank_e9"),
            "n_members",
        )
    )


def fuzzy_dedup_e2e(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 12,
    rows_per_band: int = 2,
    jaccard_threshold: float = 0.2,
    n_iters: int = 3,
    max_degree: int = 16,
) -> DataFrame:
    """Document-level fuzzy dedup END TO END — the full Lee et al.
    2022 / RefinedWeb (Penedo et al. 2023) pipeline as one headline
    operator: shingle → MinHash sign → banded LSH candidates →
    exact-Jaccard verify (``minhash_dedup_pairs``) → connected
    components over the VERIFIED pair graph (``edge_components``) →
    centrality keeper per component (``capped_pagerank`` ordered
    most-similar-first by Jaccard, then the ``keep_central`` argmax).

    Every stage keeps its standalone scale contract: one persisted
    shingle explosion, banded candidate generation with the
    bucket_cap guardrail (never all-pairs), label propagation whose
    per-iteration driver traffic is one scalar, an edge list capped at
    N·max_degree, and integer-exact ranks. The verified pair relation
    is computed ONCE and persisted — both graph consumers read it
    (the keep_central single-fingerprint discipline, applied to the
    MinHash tier).

    Output: (component, keep_id, keep_rank_e9, n_members) — one row
    per surviving document; n_members > 1 rows are the clusters whose
    other members a curation pass drops.
    """
    # EAGER localCheckpoint (r10 optimization round): downstream,
    # ``pairs`` is referenced twice in every union (attrs, members, e)
    # — six plan references in all, and the label-prop loop runs one
    # ACTION per round. A lazy persist let the first action's
    # concurrent subtrees each evaluate the FULL MinHash+verify
    # pipeline before the cache existed (profiled: a 101 CPU-s
    # broadcast-thread stage re-running the whole verify join), and
    # even once cached, every action re-ANALYZED the full MinHash
    # logical lineage six times over (a 26k-line explain). The eager
    # checkpoint materializes the small verified-pair relation once and
    # truncates its lineage to a LogicalRDD — the same iterative-graph
    # discipline ``_attr_label_propagation`` documents (constant-size
    # plans; the relation is candidate-volume-sized, so re-deriving it
    # on partition loss is not the recovery path a 100 TB run cares
    # about — the e2e would re-run from the persisted corpus anyway).
    pairs = minhash_dedup_pairs(
        df, text_col, id_col, k=k, rows_per_band=rows_per_band,
        jaccard_threshold=jaccard_threshold,
    ).localCheckpoint(eager=True)
    ids = df.select(F.col(id_col))
    comp = edge_components(ids, pairs, id_col)
    cent = capped_pagerank(
        ids,
        pairs.select("id_a", "id_b", (-F.col("jaccard")).alias("__ord")),
        id_col,
        n_iters=n_iters,
        max_degree=max_degree,
    )
    return _component_keeper(comp, cent, id_col)
