"""Metrics parity tests against hand-computed fixtures mirroring the
reference semantics (src/metrics.py, src/eval/eval_score.py)."""

import math

import pytest

from rag_docvqa_tpu.metrics import (
    Evaluator,
    anls,
    anls_compute,
    eval_acc_and_f1,
    eval_score,
    levenshtein,
    similarity_score,
)


# ---------------------------------------------------------------------- #
# levenshtein
# ---------------------------------------------------------------------- #
@pytest.mark.parametrize(
    "a,b,d",
    [
        ("", "", 0),
        ("abc", "", 3),
        ("", "abc", 3),
        ("kitten", "sitting", 3),
        ("flaw", "lawn", 2),
        ("abc", "abc", 0),
        ("saturday", "sunday", 3),
        ("a cat", "a act", 2),
    ],
)
def test_levenshtein(a, b, d):
    assert levenshtein(a, b) == d
    assert levenshtein(b, a) == d


def test_levenshtein_random_against_naive():
    import random

    def naive(s1, s2):
        m, n = len(s1), len(s2)
        dp = [[0] * (n + 1) for _ in range(m + 1)]
        for i in range(m + 1):
            dp[i][0] = i
        for j in range(n + 1):
            dp[0][j] = j
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                dp[i][j] = min(
                    dp[i - 1][j] + 1,
                    dp[i][j - 1] + 1,
                    dp[i - 1][j - 1] + (s1[i - 1] != s2[j - 1]),
                )
        return dp[m][n]

    rng = random.Random(0)
    alphabet = "abcde"
    for _ in range(50):
        s1 = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        s2 = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        assert levenshtein(s1, s2) == naive(s1, s2)


# ---------------------------------------------------------------------- #
# ANLS (main evaluator flavor: zero below threshold, keep at threshold)
# ---------------------------------------------------------------------- #
def test_anls_basic():
    assert anls("hello", "hello") == 1.0
    # distance 1 / len 5 -> 0.8 similarity
    assert math.isclose(anls("hello", "hallo"), 0.8)
    # below 0.5 threshold -> 0
    assert anls("hello", "xyzzy") == 0.0
    # exactly at threshold survives (reference: `>= threshold`)
    assert math.isclose(anls("ab", "ax"), 0.5)


def test_mmlongbench_anls_strict_at_threshold():
    # eval_score.py:27-28 zeroes `<= threshold`
    assert anls_compute("ab", "ax") == 0.0
    assert anls_compute("hello", "hello") == 1.0


# ---------------------------------------------------------------------- #
# Evaluator typed accuracy / anls
# ---------------------------------------------------------------------- #
def test_evaluator_string_and_anyconf():
    ev = Evaluator()
    m = ev.get_metrics([["Paris"], ["london"]], ["paris", "berlin"])
    assert m["accuracy"] == [1, 0]
    assert m["anls"] == [1.0, 0.0]
    # Anyconf: max over k answers (src/metrics.py:54-68)
    m = ev.get_metrics([["Paris"]], [["rome", "paris", "berlin"]])
    assert m["accuracy"] == [1]
    assert m["anls"] == [1.0]


def test_evaluator_typed():
    ev = Evaluator()
    # reference quirk: pure-digit gt triggers the special-case exact-match
    # path BEFORE the int branch (src/metrics.py:188-189), so "42.0" != "42"
    assert ev.get_metrics([["42"]], ["42.0"], ["int"])["accuracy"] == [0]
    assert ev.get_metrics([["42"]], ["42"], ["int"])["accuracy"] == [1]
    # non-special gt reaches the real int branch
    assert ev.get_metrics([["+42"]], ["42.0"], ["int"])["accuracy"] == [1]
    assert ev.get_metrics([["3.14"]], ["3.141"], ["float"])["accuracy"] == [1]  # |diff| < 0.01
    assert ev.get_metrics([["3.14"]], ["3.16"], ["float"])["accuracy"] == [0]
    assert ev.get_metrics([["3.14%"]], ["3.145"], ["float"])["accuracy"] == [1]
    assert ev.get_metrics([["[a,b]"]], ["[b,a]"], ["list"])["accuracy"] == [1]
    assert ev.get_metrics([[""]], [""], ["not-answerable"])["accuracy"] == [1]
    assert ev.get_metrics([["yes"]], ["none"], ["string"])["accuracy"] == [0]


def test_evaluator_special_cases_exact_match():
    ev = Evaluator()
    # url must match exactly, no fuzzy credit
    m = ev.get_metrics([["https://a.com/x"]], ["https://a.com/y"])
    assert m["accuracy"] == [0] and m["anls"] == [0.0]
    # page-prefixed strings likewise (src/metrics.py:162)
    m = ev.get_metrics([["page 3"]], ["page 3"])
    assert m["accuracy"] == [1]
    # phone-like digit strings
    m = ev.get_metrics([["1234-567"]], ["1234-567"])
    assert m["accuracy"] == [1]


def test_retrieval_metrics():
    ev = Evaluator()
    assert ev.get_retrieval_metric([1, 2], [1, 0]) == [1, 0]
    assert ev.get_retrieval_metric([1, 2], [[0, 1], [0, 1]]) == [1, 0]


def test_chunk_score_double_log():
    ev = Evaluator()
    # exact substring: inner similarity = log2(2) = 1 -> outer log2(1+1) = 1
    scores = ev.eval_retrieval([["paris"]], [["the capital is paris indeed"]])
    assert math.isclose(scores["chunk_score"][0], 1.0, abs_tol=1e-9)
    # no retrieval
    assert ev.eval_retrieval([["x"]], None)["chunk_score"] == [0]


def test_similarity_score_matches_reference_formula():
    # identical string: ratio 1 -> log2(2) = 1
    assert math.isclose(similarity_score("abc", "abc"), 1.0)
    # disjoint: ratio 0 -> log2(1) = 0
    assert similarity_score("abc", "xyz") == 0.0


# ---------------------------------------------------------------------- #
# MMLongBench scorer
# ---------------------------------------------------------------------- #
def test_eval_score_types():
    assert eval_score(5, "5.0", "Int") == 1.0
    assert eval_score(5, "6", "Int") == 0.0
    assert eval_score("50%", "0.5", "Float") == 1.0  # percentage scaling
    assert eval_score("hello", "hello", "Str") == 1.0
    assert eval_score("['a','b']", "['b','a']", "List") == 1.0
    assert eval_score("['a','b']", "['a']", "List") == 0.0


def test_eval_acc_and_f1():
    samples = [
        {"score": 1.0, "answer": "x", "pred": "x"},
        {"score": 0.0, "answer": "Not answerable", "pred": "y"},
    ]
    acc, f1 = eval_acc_and_f1(samples)
    assert acc == 0.5
    # recall = 1/1 (answerable), precision = 1/2 (both preds are answerable)
    assert abs(f1 - 2 * 1.0 * 0.5 / 1.5) < 1e-9
