"""Property tests (hypothesis) for round-3 wave arithmetic — pure
Python mirrors of formulas the oracle-paired queries rely on, checked
over randomized inputs the fixtures can't enumerate."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from atlassian_confluence_data_pipeline_spark.functions.text import ROLLING_MOD
from atlassian_confluence_data_pipeline_spark.operators.sketches import (
    HLL_M,
    HLL_PERM,
    HLL_W_BITS,
)
from atlassian_confluence_data_pipeline_spark.plans.curation4 import (
    CHUNK_S,
    CHUNK_W,
)


def _varint_case(v: int) -> int:
    """The CASE ladder from postings_compression_stats."""
    if v < 128:
        return 1
    if v < 16384:
        return 2
    if v < 2097152:
        return 3
    if v < 268435456:
        return 4
    return 5


def _varint_actual(v: int) -> int:
    """True LEB128 byte length."""
    n = 0
    while True:
        n += 1
        v >>= 7
        if v == 0:
            return n


@given(st.integers(min_value=1, max_value=(1 << 31) - 1))
def test_varint_ladder_matches_leb128(v):
    assert _varint_case(v) == _varint_actual(v)


@given(st.integers(min_value=1, max_value=500))
def test_chunk_geometry_covers_every_token(n):
    """chunk_documents' n_chunks/start/slice arithmetic: the union of
    [i*S, min(i*S+W, n)) covers [0, n) with no gaps, interior chunks
    are exactly W, and no chunk is empty."""
    n_chunks = 1 + (max(n - CHUNK_W, 0) + CHUNK_S - 1) // CHUNK_S
    covered = set()
    for i in range(n_chunks):
        start = i * CHUNK_S
        end = min(start + CHUNK_W, n)
        assert end > start, f"empty chunk {i} for n={n}"
        if i < n_chunks - 1:
            assert end - start == CHUNK_W
        covered.update(range(start, end))
    assert covered == set(range(n))
    # one more chunk would be fully redundant or empty
    extra_start = n_chunks * CHUNK_S
    assert extra_start >= n or set(range(extra_start, n)) <= covered


def _hll_estimate(keys) -> float:
    """Pure-Python mirror of the register build + estimator (including
    the multiply-xor-shift finalizer — without it, sequential keys bias
    the estimate by ~65%; this test is what caught that)."""
    from atlassian_confluence_data_pipeline_spark.operators.sketches import (
        HLL_ALPHA,
        HLL_MIX,
    )

    a, b = HLL_PERM
    regs: dict[int, int] = {}
    for k in set(keys):
        h = (a * (k % ROLLING_MOD) + b) % ROLLING_MOD
        h ^= h >> 15
        h = (HLL_MIX * h) % ROLLING_MOD
        h ^= h >> 13
        reg = h % HLL_M
        w = h // HLL_M
        rank = HLL_W_BITS + 1
        for p in range(1, HLL_W_BITS + 1):
            if (w >> (HLL_W_BITS - p)) & 1:
                rank = p
                break
        regs[reg] = max(regs.get(reg, 0), rank)
    zeros = HLL_M - len(regs)
    s = zeros * 1.0 + sum(2.0 ** -mx for mx in regs.values())
    raw = HLL_ALPHA * HLL_M * HLL_M / s
    if raw <= 2.5 * HLL_M and zeros > 0:
        import math

        return HLL_M * math.log(HLL_M / zeros)
    return raw


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=500, max_value=20000),
    st.integers(min_value=0, max_value=1 << 40),
)
def test_hll_estimate_within_sketch_error(n, offset):
    """For arbitrary key ranges (including ones past 2^31 — the
    overflow-discipline regime), the m=256 estimator lands within
    ~5 standard errors (1.04/sqrt(256) ~ 6.5%) of the truth."""
    est = _hll_estimate(range(offset, offset + n))
    assert abs(est - n) / n < 0.33
