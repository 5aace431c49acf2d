"""Unit tests for text-analysis repetition metrics (extension tier)."""

from __future__ import annotations

import pytest

from potoos_spark.operators.text import repetition_stats


def _rows(df):
    return {r.doc_id: r.asDict() for r in df.collect()}


def test_repetition_counts(spark):
    docs = spark.createDataFrame(
        [
            # tokens [a,b,a,b,a]: bigrams a_b,b_a,a_b,b_a → top 2/4;
            # trigrams a_b_a,b_a_b,a_b_a → dup 1/3
            (0, "a b a b a"),
            (1, "one"),          # <2 tokens → no row
            (2, "left right"),   # 1 bigram, no trigrams → dup 0.0
        ],
        "doc_id bigint, text string",
    )
    got = _rows(repetition_stats(docs))
    assert set(got) == {0, 2}
    assert got[0]["n_bigrams"] == 4
    assert got[0]["top_bigram_n"] == 2
    assert got[0]["top_bigram_frac"] == pytest.approx(0.5)
    assert got[0]["dup_trigram_frac"] == pytest.approx(1.0 / 3.0)
    assert got[2]["n_bigrams"] == 1
    assert got[2]["dup_trigram_frac"] == 0.0


def test_repetition_flags_boilerplate(spark):
    docs = spark.createDataFrame(
        [(0, "spam spam spam spam spam spam"), (1, "the quick brown fox jumps high")],
        "doc_id bigint, text string",
    )
    got = _rows(repetition_stats(docs))
    assert got[0]["top_bigram_frac"] == 1.0
    assert got[0]["dup_trigram_frac"] > 0.7
    assert got[1]["top_bigram_frac"] == pytest.approx(1.0 / 5.0)
    assert got[1]["dup_trigram_frac"] == 0.0


def test_readability_counts_and_grade_formula(spark):
    """Hand-computed Flesch–Kincaid on a two-sentence text: 6 words,
    2 sentence runs, 6 vowel-group syllables → grade 0.39·3 + 11.8·1
    − 15.59. A token-less doc keeps its row with a NULL grade and the
    sentence floor at 1."""
    from potoos_spark.operators.text import readability

    docs = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!"), (2, "...")],
        "doc_id bigint, text string",
    )
    got = _rows(readability(docs))
    r = got[1]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 6)
    assert r["fk_grade"] == pytest.approx(0.39 * 3 + 11.8 * 1 - 15.59)
    e = got[2]
    assert e["n_words"] == 0 and e["n_sentences"] == 1
    assert e["fk_grade"] is None


def test_zipf_slope_near_minus_one_on_zipfian_corpus(spark):
    """A corpus whose term counts follow cnt(rank) = 1200/rank must fit
    slope ≈ −1; the top-N selection must compile to
    TakeOrderedAndProject (partition-local top-N, no global sort)."""
    from potoos_spark.operators.text import zipf_slope
    from tests.test_plans import _plan

    words = []
    for i in range(1, 21):
        words += [f"w{i:02d}"] * (1200 // i)
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id bigint, text string"
    )
    q = zipf_slope(docs, top_n=20)
    assert "TakeOrderedAndProject" in _plan(q)
    r = q.collect()[0]
    assert r["n_terms"] == 20
    assert -1.1 < r["zipf_slope"] < -0.9


def test_clean_html_strips_tags_and_decodes_entities(spark):
    from potoos_spark.operators.text import clean_html

    rows = [
        (1, "<p>Hello <b>world</b></p>"),
        (2, "a &amp;lt; b &nbsp; c&#39;s &quot;q&quot;"),
        (3, "no markup   here"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r["text"] for r in clean_html(df).collect()}
    assert got[1] == "Hello world"
    # &amp; decodes LAST: "&amp;lt;" becomes the literal "&lt;", not "<"
    assert got[2] == "a &lt; b c's \"q\""
    assert got[3] == "no markup here"


def test_pii_mask_masks_and_counts(spark):
    from potoos_spark.operators.text import pii_mask

    rows = [
        (1, "mail a@b.co and c.d+e@f-g.org now"),
        (2, "card 4111111111111111 short 12345"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in pii_mask(df).collect()}
    assert got[1]["text"] == "mail <EMAIL> and <EMAIL> now"
    assert got[1]["n_emails"] == 2 and got[1]["n_longnums"] == 0
    assert got[2]["text"] == "card <NUM> short 12345"  # <7 digits kept
    assert got[2]["n_longnums"] == 1


def test_top_terms_ranks_rare_terms_first(spark):
    from potoos_spark.operators.text import top_terms

    rows = [
        (1, "zebra zebra common"),
        (2, "common plain"),
        (3, "common plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {}
    for r in top_terms(df, k=2).collect():
        got.setdefault(r["doc_id"], []).append((r["term"], r["tf"], r["df"]))
    # doc 1: zebra tf=2 df=1 → score 2.0 beats common (1/3)
    assert got[1][0] == ("zebra", 2, 1)
    assert got[1][1] == ("common", 1, 3)
    # docs 2/3: plain (1/2) beats common (1/3); ≤ k rows each
    assert got[2][0] == ("plain", 1, 2)
    assert all(len(v) <= 2 for v in got.values())


def test_hash_embed_array_is_shuffle_free_and_feeds_ann(spark):
    """The array-form hashing-trick embedding is a pure map stage (no
    Exchange in the plan) and composes directly with the ANN tier:
    exact duplicate texts land at cosine 1.0 as each other's top
    match."""
    from pyspark.sql import functions as F

    from potoos_spark.operators.similarity import cosine_topk
    from potoos_spark.operators.text import hashing_trick_embed
    from tests.test_plans import _plan

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
        (3, "totally different vocabulary here now there"),
        (4, "another unrelated set of strange tokens"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    emb = hashing_trick_embed(df, dim=16, as_array=True)
    assert "Exchange" not in _plan(emb)
    e = emb.select(F.col("doc_id").alias("vec_id"), "embedding")
    top = cosine_topk(e.filter(F.col("vec_id") == 1), e, k=1).collect()
    assert len(top) == 1 and top[0]["match_id"] == 2
    assert top[0]["cosine"] == 1.0


def test_hash_embed_long_form_sums_signs(spark):
    """Long form carries all dims with exact integer cancellation: a
    one-token doc has exactly one ±1 entry and fifteen zeros."""
    from potoos_spark.operators.text import hashing_trick_embed

    df = spark.createDataFrame([(7, "solitary")], "doc_id bigint, text string")
    rows = hashing_trick_embed(df, dim=16).collect()
    assert len(rows) == 16
    nz = [r for r in rows if r["weight"] != 0]
    assert len(nz) == 1 and abs(nz[0]["weight"]) == 1


def test_unigram_lm_flags_rare_vocabulary(spark):
    from potoos_spark.operators.text import unigram_logprob

    common = "the cat sat on the mat and the dog sat too"
    rows = [(i, common) for i in range(20)] + [(99, "zyxw qqvv kjhg zyxw")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in unigram_logprob(df).collect()}
    typical = max(got[i].avg_nll for i in range(20))
    assert got[99].avg_nll > typical  # rare-vocab outlier scores highest
    assert got[0].dl == 11
    # exact integer totals: all 20 identical docs get identical bigints
    assert len({got[i].nll_e9 for i in range(20)}) == 1


def test_unigram_jsd_identical_zero_disjoint_ln2(spark):
    """Identical token distributions in both md5 halves → JSD exactly 0
    (every log argument is 1); fully disjoint vocabularies → JSD = ln 2
    (at the 1e-6 integer-log resolution). ids 6/9 hash to half 'a',
    0/1 to half 'b'."""
    import math

    from potoos_spark.operators.text import unigram_jsd

    same = spark.createDataFrame(
        [(6, "alpha beta gamma"), (0, "alpha beta gamma")],
        "doc_id bigint, text string",
    )
    r = unigram_jsd(same).collect()[0]
    assert r["jsd"] == 0.0 and r["n_terms"] == 3

    disjoint = spark.createDataFrame(
        [(6, "alpha beta"), (9, "alpha beta"), (0, "gamma delta")],
        "doc_id bigint, text string",
    )
    d = unigram_jsd(disjoint).collect()[0]
    assert d["jsd"] == pytest.approx(math.log(2), abs=1e-5)
    assert (d["n_a"], d["n_b"]) == (4, 2)


def test_bpe_pair_stats_vocab_grain_counts(spark):
    """Hand-checked merge-step counts: 'hello'x3 + 'he'x2 + 'HE?!'
    (normalizes to 'he') give he=6, el=ll=lo=3; single-char words
    never pair. top_n cutoff breaks ties on the pair string."""
    from potoos_spark.operators.text import bpe_pair_stats

    df = spark.createDataFrame(
        [(1, "hello hello hello he he a"), (2, "HE?! a b")],
        "doc_id bigint, text string",
    )
    got = {r["pair"]: r["n_occ"] for r in bpe_pair_stats(df).collect()}
    assert got == {"he": 6, "el": 3, "ll": 3, "lo": 3}

    # cutoff determinism: top_n=2 keeps 'he' then the tie-break winner 'el'
    top2 = [r["pair"] for r in bpe_pair_stats(df, top_n=2).collect()]
    assert top2 == ["he", "el"]


def test_fertility_by_lang_counts_and_ratio(spark):
    """Punctuation and digits tokenize separately under the BPE-ish
    pre-tokenizer but fuse into words under whitespace normalization,
    so fertility > 1 for marked-up text and exactly 1 for clean text."""
    from potoos_spark.operators.text import fertility_by_lang

    df = spark.createDataFrame(
        [
            (1, "en", "hello world"),            # 2 words, 2 bpe tokens
            (2, "en", "it's 2024, ok?!"),        # 4 norm words, 6 bpe tokens
            (3, "de", "guten tag"),              # clean: fertility 1.0
        ],
        "doc_id bigint, lang string, text string",
    )
    got = {r["lang"]: r for r in fertility_by_lang(df).collect()}
    assert got["de"]["fertility"] == 1.0
    en = got["en"]
    assert en["n_docs"] == 2 and en["n_words"] == 6
    assert en["n_bpe_tokens"] > en["n_words"]
    assert en["fertility"] == en["n_bpe_tokens"] / en["n_words"]


def test_token_entropy_by_lang_orders_diversity(spark):
    """A one-token language has entropy exactly 0; a uniform two-token
    language has exactly ln 2 (to the rounding grain); the richer
    distribution scores strictly higher."""
    import math

    from potoos_spark.operators.text import token_entropy_by_lang

    rows = [
        (1, "spam spam spam spam", "mono"),
        (2, "ham eggs ham eggs", "duo"),
        (3, "one two three four five six", "rich"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    got = {r["lang"]: r for r in token_entropy_by_lang(df).collect()}
    assert got["mono"]["entropy"] == 0.0 and got["mono"]["vocab_size"] == 1
    assert abs(got["duo"]["entropy"] - math.log(2)) < 1e-8
    assert got["rich"]["entropy"] > got["duo"]["entropy"] > got["mono"]["entropy"]
    assert got["rich"]["n_tokens"] == 6 and got["rich"]["vocab_size"] == 6


def test_bpe_learn_merges_matches_reference_implementation(spark):
    """Six learned rules equal a from-scratch Python BPE (Sennrich
    greedy left-to-right apply, overlap-counting pair statistics) on a
    corpus with adjacent-overlap stress ('aaaa', 'ababab') and
    multi-char merge chains (t+he -> the); and the plan is collect-free:
    each round's argmax is a TakeOrderedAndProject broadcast back into
    the rewrite (3 rounds -> >= 3 top-1 operators for the default)."""
    import re
    from collections import Counter

    from potoos_spark.operators.text import bpe_learn_merges

    def ref_bpe(texts, n):
        words = []
        for t in texts:
            words += [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]
        vocab = {tuple(w): c for w, c in Counter(words).items()}
        rules = []
        for step in range(n):
            pc = Counter()
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += c
            if not pc:
                break
            (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            rules.append((step + 1, l, r, l + r, cnt))
            nv = {}
            for syms, c in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nv[tuple(out)] = nv.get(tuple(out), 0) + c
            vocab = nv
        return rules

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the the the banana bandana banana",
        "aaaa aaa aa a abab ababab",
        "lower lowest newer newest wider widest",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    out = bpe_learn_merges(df, n_merges=6)
    got = sorted(map(tuple, out.collect()))
    assert got == sorted(ref_bpe(texts, 6))

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") >= 3


def test_bpe_encode_stats_matches_reference_apply(spark):
    """Per-doc symbol counts after the 3 learned rules equal the
    Python reference's greedy apply; compression == chars/symbols and
    is >= 1; docs untouched by any rule keep n_syms == n_chars."""
    import re
    from collections import Counter

    from potoos_spark.operators.text import bpe_encode_stats

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the the the banana bandana banana",
        "aaaa aaa aa a abab ababab",
        "xyz qpv",  # no learned rule touches these
    ]

    def ref_rules_and_apply(texts, n):
        words_all = []
        for t in texts:
            words_all.append(
                [w for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if w]
            )
        flat = [w for ws in words_all for w in ws]
        vocab = {tuple(w): c for w, c in Counter(flat).items()}
        rules = []
        for _ in range(n):
            pc = Counter()
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += c
            (l, r), _cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            rules.append((l, r))

            def apply(syms, l=l, r=r):
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                return tuple(out)

            nv = {}
            for syms, c in vocab.items():
                k2 = apply(syms)
                nv[k2] = nv.get(k2, 0) + c
            vocab = nv

        def encode_len(word):
            syms = tuple(word)
            for l, r in rules:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = tuple(out)
            return len(syms)

        return [sum(encode_len(w) for w in ws) for ws in words_all]

    want_syms = ref_rules_and_apply(texts, 3)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r for r in bpe_encode_stats(df, n_merges=3).collect()}
    for i, t in enumerate(texts):
        n_chars = sum(len(w) for w in re.sub(r"[^a-z0-9]+", " ", t.lower()).split())
        assert got[i]["n_chars"] == n_chars
        assert got[i]["n_syms"] == want_syms[i], (i, got[i]["n_syms"], want_syms[i])
        assert got[i]["compression"] == n_chars / want_syms[i]
    assert got[3]["n_syms"] == got[3]["n_chars"]  # untouched doc


class TestGopherRules:
    """r6: the full Gopher Table-A1 rule set — each rule must actually
    trip on text engineered to violate it (the fixture can't: it has no
    symbols/bullets/ellipses), and the passing document must pass."""

    def _run(self, spark, text, **kw):
        from potoos_spark.operators.text import gopher_quality

        df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
        return gopher_quality(df, **kw).collect()[0]

    def test_good_document_passes(self, spark):
        good = "the quick brown fox jumps over that lazy dog and " * 10
        r = self._run(spark, good.strip(), min_words=50)
        assert r["gopher_pass"] is True
        assert r["stop_hits"] >= 2 and r["alpha_frac"] == 1.0

    def test_word_count_and_stopword_rules(self, spark):
        r = self._run(spark, "too short")
        assert r["gopher_pass"] is False  # < min_words, < 2 stopwords
        # 'too' != 'to': neither token is a gopher stopword
        assert r["stop_hits"] == 0

    def test_symbol_ratio_rule_trips(self, spark):
        spam = ("the of and word " * 20) + "#" * 40
        r = self._run(spark, spam, min_words=10)
        assert r["symbol_ratio"] > 0.1
        assert r["gopher_pass"] is False

    def test_bullet_and_ellipsis_line_rules(self, spark):
        bullets = "\n".join(f"- the item of {i} and that" for i in range(20))
        r = self._run(spark, bullets, min_words=10)
        assert r["bullet_frac"] == 1.0 and r["gopher_pass"] is False
        ell = "\n".join(
            ["the first of lines and that have with be to of..."] * 5
            + ["a plain line"] * 5
        )
        r2 = self._run(spark, ell, min_words=10)
        assert r2["ellipsis_frac"] == 0.5 and r2["gopher_pass"] is False

    def test_alpha_frac_rule_trips_on_numeric_spam(self, spark):
        nums = "the of " + " ".join(str(i) for i in range(100))
        r = self._run(spark, nums, min_words=10)
        assert r["alpha_frac"] < 0.8 and r["gopher_pass"] is False

    def test_mean_word_length_rule(self, spark):
        longw = "the of " + ("pneumonoultramicroscopic " * 60)
        r = self._run(spark, longw, min_words=10)
        assert r["mean_word_len"] > 10.0 and r["gopher_pass"] is False

    def test_empty_doc_emits_row(self, spark):
        r = self._run(spark, "")
        assert r["n_words"] == 0 and r["gopher_pass"] is False


def test_distinct_ngram_stats_detects_template_collapse(spark):
    """A slice of identical documents must show a far lower
    distinct-frac than a diverse slice, and bigram diversity must not
    exceed what its occurrence count allows."""
    from potoos_spark.operators.text import distinct_ngram_stats

    rows = [(i, "the same boilerplate line again", "spam") for i in range(20)]
    rows += [(100 + i, f"unique words alpha{i} beta{i} gamma{i}", "fresh") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    got = {(r["source"], r["n"]): r for r in distinct_ngram_stats(df).collect()}
    assert got[("spam", 1)]["distinct_ngrams"] == 5
    assert got[("spam", 1)]["total_ngrams"] == 100
    assert got[("spam", 2)]["distinct_ngrams"] == 4
    assert got[("fresh", 1)]["distinct_frac"] > 0.6
    assert got[("spam", 1)]["distinct_frac"] == 0.05


def test_collocations_planted_phrase_scores_highest(spark):
    """r7 word2vec phrase score: a planted always-adjacent pair must
    outscore an independent pair, with exact counts; pairs under
    min_count are dropped."""
    from potoos_spark.operators.text import collocations

    rows = [(i, "new york is big and new york is old") for i in range(4)]
    rows += [(10 + i, "old big is and the") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["term_a"], r["term_b"]): r
        for r in collocations(df, delta=3, min_count=3, threshold=0.0).collect()
    }
    ny = got[("new", "york")]
    assert ny["n_ab"] == 8 and ny["n_a"] == 8 and ny["n_b"] == 8
    # always-adjacent pair beats every co-incidental one
    assert all(
        ny["score"] >= v["score"] for v in got.values()
    ), sorted(((k, v["score"]) for k, v in got.items()), key=lambda x: -x[1])[:3]


def test_script_mix_known_composition(spark):
    """r7 character-class composition: crafted strings with hand-counted
    class totals; ratios sum to 1 and non-ASCII lands in other_ratio."""
    from potoos_spark.operators.text import script_mix

    rows = [
        (1, "Ab1 !"),          # 2 alpha, 1 digit, 1 space, 1 punct
        (2, "héllo"),          # 4 ascii alpha + 1 non-ascii
        (3, ""),               # dropped (n_chars = 0)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in script_mix(df).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert r1["n_chars"] == 5
    assert r1["alpha_ratio"] == 2 / 5 and r1["digit_ratio"] == 1 / 5
    assert r1["space_ratio"] == 1 / 5 and r1["punct_ratio"] == 1 / 5
    assert r1["other_ratio"] == 0.0
    r2 = got[2]
    assert r2["alpha_ratio"] == 4 / 5 and r2["other_ratio"] == 1 / 5
    for r in got.values():
        s = (
            r["alpha_ratio"] + r["digit_ratio"] + r["space_ratio"]
            + r["punct_ratio"] + r["other_ratio"]
        )
        assert abs(s - 1.0) < 1e-12


def test_backoff_trigram_tiers(spark):
    """All three stupid-backoff tiers on a crafted corpus: doc 0 (train)
    = 'a b c a b d'; doc 1 (scored) = 'a b c x b d y z w'. Trigram
    'a b c' hits tier 1; others back off to bigram or smoothed unigram
    floor, and no score is ever -inf."""
    import math

    from potoos_spark.operators.text import (
        BACKOFF_ALPHA, BACKOFF_ALPHA2, backoff_trigram_logprob,
    )

    df = spark.createDataFrame(
        [(0, "a b c a b d"), (1, "a b c x b d y z w")],
        "doc_id bigint, text string",
    )
    out = backoff_trigram_logprob(df).collect()
    assert len(out) == 1 and out[0].doc_id == 1
    r = out[0]
    assert r.n_trigrams == 7  # 9 tokens -> 7 trigrams
    # pure-python reference of the same recurrence
    train = "a b c a b d".split()
    tg = {}; bg = {}; un = {}
    for i in range(len(train) - 2):
        tg[tuple(train[i:i+3])] = tg.get(tuple(train[i:i+3]), 0) + 1
    for i in range(len(train) - 1):
        bg[tuple(train[i:i+2])] = bg.get(tuple(train[i:i+2]), 0) + 1
    for w in train:
        un[w] = un.get(w, 0) + 1
    T, V = len(train), len(un)
    sc = "a b c x b d y z w".split()
    nll = 0
    for i in range(len(sc) - 2):
        w1, w2, w3 = sc[i:i+3]
        if (w1, w2, w3) in tg:
            s = tg[(w1, w2, w3)] / bg[(w1, w2)]
        elif (w2, w3) in bg:
            s = BACKOFF_ALPHA * (bg[(w2, w3)] / un[w2])
        else:
            s = BACKOFF_ALPHA2 * ((un.get(w3, 0) + 1) / (T + V))
        nll -= round(math.log(s) * 1e9)
    assert r.nll_e9 == nll


def test_char_entropy_known_distributions(spark):
    """r8: exact entropies on hand distributions — uniform 2-symbol =
    1 bit, single symbol = 0, uniform 4-symbol = 2 bits; empty docs
    dropped."""
    from potoos_spark.operators.text import char_entropy

    rows = [
        (1, "abab"),          # H = 1.0
        (2, "aaaa"),          # H = 0.0
        (3, "abcd"),          # H = 2.0
        (4, ""),              # dropped
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["entropy"] == 1.0 and got[1]["n_distinct"] == 2
    assert got[2]["entropy"] == 0.0 and got[2]["n_chars"] == 4
    assert got[3]["entropy"] == 2.0 and got[3]["n_distinct"] == 4


def test_quality_perceptron_learns_separable_corpus(spark):
    """r9: the learned quality stage must actually LEARN — on a corpus
    where the label rule (word-count window) is linearly separable in
    the count feature, agreement must be near-perfect and far above the
    majority-class rate, with a real confusion matrix on the fixture
    rule (not an all-one-class predictor)."""
    from potoos_spark.operators.text import quality_perceptron

    rows = [
        (i, "lorem ipsum dolor sit amet consectetur " * 12)  # 84 words: pass
        for i in range(40)
    ] + [
        (100 + i, "short text only here")  # 4 words: fail
        for i in range(35)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = quality_perceptron(df).collect()
    assert len(out) == 75
    agree = sum(r["agree"] for r in out) / len(out)
    assert agree >= 0.95, agree
    preds = {r["doc_id"]: r["pred"] for r in out}
    assert all(preds[i] == 1 for i in range(40))
    assert all(preds[100 + i] == -1 for i in range(35))
    spark.catalog.clearCache()


def test_quality_perceptron_bit_invariant_across_partitionings(spark):
    """The full integer GD trajectory (labels, centered count, floor
    updates) must be partitioning-independent — margins bit-equal."""
    from potoos_spark.operators.text import quality_perceptron

    rows = [
        (i, ("alpha beta gamma delta epsilon zeta " * (3 + i % 20)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = sorted(map(tuple, quality_perceptron(df).collect()))
    spark.catalog.clearCache()
    b = sorted(
        map(tuple, quality_perceptron(df.repartition(11)).collect())
    )
    assert a == b and a
    spark.catalog.clearCache()


def test_quality_perceptron_eval_detects_all_plants(spark):
    """r10 planted-signal gate: the learned filter must score every
    gibberish and truncated plant BELOW its clean twin (detected = 1
    on all rows) — the model is judged on detection of degradation it
    was never explicitly told about, not on agreeing with its
    weak-label teacher."""
    from potoos_spark.catalog.pipeline import _quality_perceptron_eval_fn
    from tests.conftest import SF_DIR

    rows = _quality_perceptron_eval_fn(spark, SF_DIR).collect()
    assert len(rows) > 0 and len(rows) % 2 == 0
    assert {r["kind"] for r in rows} == {"gibberish", "truncated"}
    missed = [r for r in rows if r["detected"] != 1]
    assert not missed, f"undetected plants: {missed}"
