"""Pure-python unit tests for the verification kernels (no Spark):
E3 LCS numpy DP and E5 suffix-array longest common substring, checked
against naive reference implementations on random inputs."""

from __future__ import annotations

import random

from dedup.verify import _lcs_len_exact, longest_common_substring_len


def _lcs_naive(a: str, b: str) -> int:
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = (
                dp[i - 1][j - 1] + 1
                if a[i - 1] == b[j - 1]
                else max(dp[i - 1][j], dp[i][j - 1])
            )
    return dp[-1][-1]


def _lcsubstr_naive(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


def test_lcs_matches_naive_dp():
    rng = random.Random(1)
    for _ in range(40):
        a = "".join(rng.choice("abcdx ") for _ in range(rng.randint(0, 40)))
        b = "".join(rng.choice("abcdx ") for _ in range(rng.randint(0, 40)))
        assert _lcs_len_exact(a, b) == _lcs_naive(a, b), (a, b)


def test_lcs_identical_and_disjoint():
    assert _lcs_len_exact("hello world", "hello world") == 11
    assert _lcs_len_exact("aaaa", "bbbb") == 0
    assert _lcs_len_exact("", "abc") == 0


def test_lcsubstr_matches_naive():
    rng = random.Random(2)
    for _ in range(40):
        a = "".join(rng.choice("abz") for _ in range(rng.randint(0, 30)))
        b = "".join(rng.choice("abz") for _ in range(rng.randint(0, 30)))
        assert longest_common_substring_len(a, b) == _lcsubstr_naive(a, b), (a, b)


def test_lcsubstr_containment_case():
    base = "the quick brown fox jumps over the lazy dog " * 3
    frag = base[20:95]
    assert longest_common_substring_len(base, "XX" + frag + "YY") == len(frag)


def test_lcsubstr_unicode_safe():
    # common substrings are "héllo" (5) and "wörld" (5); non-ASCII chars
    # must round-trip through the utf-32 suffix-array encoding intact
    assert longest_common_substring_len("héllo wörld", "wörld héllo") == 5
    # the sentinel (codepoint shifted by +2) must not collide with real chars
    assert longest_common_substring_len("ab\x01cd", "x\x01y") == 1


def test_est_filter_floor_bounds():
    from dedup.config import DEFAULT_CONFIG, HIGH_RECALL_CONFIG
    from dedup.verify import est_filter_floor

    f = est_filter_floor(DEFAULT_CONFIG)
    assert 0.0 < f < DEFAULT_CONFIG.jaccard_thresh
    assert est_filter_floor(HIGH_RECALL_CONFIG) == f  # same num_perm/thresh
