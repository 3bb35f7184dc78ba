"""Quality rules — crafted texts hit exactly the intended rules."""

from __future__ import annotations

import pandas as pd

from ksana_corpus_builder_spark.functions import quality as Q


def hits(text):
    return Q.rules_hit_and_keep(pd.Series([text]))["rules_hit"][0]


def test_good_text_keeps():
    text = ("the quick brown fox jumps over a lazy dog and runs along the "
            "river while birds sing in tall trees near quiet farms where "
            "children play games during long summer days full of light")
    lab = Q.rules_hit_and_keep(pd.Series([text]))
    assert bool(lab["keep"][0]) and lab["rules_hit"][0] == []


def test_too_short():
    assert "too_short" in hits("the a of")


def test_low_ttr_repetition():
    text = " ".join(["the spam"] * 50)
    assert "low_ttr" in hits(text)


def test_long_word():
    text = " ".join(["the quick brown fox jumps over a lazy dog again and"] * 3
                    + ["x" * 80])
    assert "long_word" in hits(text)


def test_dup_lines():
    line = "the quick brown fox jumps over a lazy dog"
    text = "\n".join([line] * 8 + ["the only unique line here"])
    assert "dup_lines" in hits(text)


def test_digit_heavy():
    text = " ".join(["the 1234567890123456789"] * 20)
    assert "digit_heavy" in hits(text)


def test_mean_word_len():
    assert "mean_word_len" in hits(" ".join(["a b c d"] * 10))


def test_stats_integer_exactness():
    s = Q.word_stats(pd.Series(["the the fox", ""]))
    assert s.n_words.tolist() == [3, 0]
    assert s.sum_word_len.tolist() == [9, 0]
    assert s.n_distinct_words.tolist() == [2, 0]
    assert s.stopword_hits.tolist() == [2, 0]
