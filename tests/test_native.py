"""Native C++ kernels: exact parity with difflib/python implementations."""

import difflib
import math
import random

import pytest

from rag_docvqa_tpu import native
from rag_docvqa_tpu.metrics.anls import levenshtein, similarity_score


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def python_levenshtein(s1, s2):
    m, n = len(s1), len(s2)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (s1[i - 1] != s2[j - 1]))
            prev = cur
    return dp[n]


def test_native_levenshtein_parity(lib):
    rng = random.Random(0)
    for _ in range(100):
        a = "".join(rng.choice("abcdé✓") for _ in range(rng.randint(0, 30)))
        b = "".join(rng.choice("abcdé✓") for _ in range(rng.randint(0, 30)))
        assert native.levenshtein(a, b) == python_levenshtein(a, b)
    # the public metric uses whichever backend is available and must agree
    assert levenshtein("kitten", "sitting") == 3


def test_native_ratio_matches_difflib(lib):
    rng = random.Random(1)
    for _ in range(100):
        a = "".join(rng.choice("abcd ") for _ in range(rng.randint(5, 60)))
        b = "".join(rng.choice("abcd ") for _ in range(rng.randint(1, 10)))
        want = 0.0
        for i in range(len(a) - len(b) + 1):
            want = max(want, difflib.SequenceMatcher(None, b, a[i : i + len(b)]).ratio())
            if want == 1.0:
                break
        got = native.best_substring_ratio(a, b)
        assert abs(got - want) < 1e-12, (a, b, got, want)


def test_similarity_score_uses_native_consistently(lib):
    # exact substring
    assert math.isclose(similarity_score("the total is 42 dollars", "42"), 1.0)
    # no overlap
    assert similarity_score("zzzz", "ab") == 0.0


def test_native_faster_than_python(lib):
    import time

    a = "lorem ipsum dolor sit amet consectetur " * 50  # ~2000 chars
    b = "consectetur adipiscing"

    t0 = time.perf_counter()
    for _ in range(5):
        native.best_substring_ratio(a.lower(), b.lower())
    native_t = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(5):
        best = 0.0
        for i in range(len(a) - len(b) + 1):
            best = max(best, difflib.SequenceMatcher(None, b, a[i : i + len(b)]).ratio())
    python_t = time.perf_counter() - t0
    assert native_t < python_t, f"native {native_t:.4f}s vs python {python_t:.4f}s"
