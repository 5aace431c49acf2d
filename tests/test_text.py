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
