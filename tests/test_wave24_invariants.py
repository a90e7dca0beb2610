"""Wave-24 semantic invariants (evals): recall bounds vs a brute-force
recount, fertility sanity, and PSD/PCA structure of the covariance
block."""

from __future__ import annotations

import math

from atlassian_confluence_data_pipeline_spark.plans import QUERIES


def _rows(spark, sf_dir, name):
    return QUERIES[name].fn(spark, sf_dir).collect()


def test_recall_audit_bounds_and_self_consistency(spark, sf_dir):
    rows = _rows(spark, sf_dir, "ivf_recall_audit")
    assert len(rows) == 10  # one row per query
    for r in rows:
        assert 0 <= r["n_hits"] <= 5
        assert math.isclose(r["recall_at_k"], r["n_hits"] / 5, abs_tol=1e-9)
    # the index should beat chance by orders of magnitude on the
    # clustered fixture (random recall ~ k/n < 2%); the absolute level
    # varies with scale (coarser cells at sf0.001 -> ~0.4)
    mean_recall = sum(r["recall_at_k"] for r in rows) / len(rows)
    assert mean_recall >= 0.2, mean_recall


def test_fertility_at_least_one_token_per_word(spark, sf_dir):
    rows = _rows(spark, sf_dir, "tokenizer_fertility_by_lang")
    assert rows
    for r in rows:
        # the BPE-ish regex splits punctuation off, so it never yields
        # fewer tokens than whitespace words on [a-z0-9 ] text
        assert r["fertility"] >= 1.0 - 1e-9
        assert r["bpe_ish_tokens"] >= r["ws_tokens"]
        assert r["chars_per_token"] > 0


def test_covariance_block_is_symmetric_psd(spark, sf_dir):
    rows = _rows(spark, sf_dir, "embedding_covariance_block")
    assert len(rows) == 36  # upper triangle of 8x8 incl. diagonal
    cov = [[0.0] * 8 for _ in range(8)]
    for r in rows:
        i, j = r["dim_i"], r["dim_j"]
        assert 0 <= i <= j <= 7
        cov[i][j] = cov[j][i] = r["covariance"]
        # integer numerator agrees with the rounded double (scale back)
        num = int(r["cov_numerator"])
        # sign consistency
        if r["covariance"] != 0:
            assert (num > 0) == (r["covariance"] > 0)
    # diagonal is nonnegative (variances)
    for i in range(8):
        assert cov[i][i] >= 0
    # PSD check + power iteration: top eigenvalue under trace, and the
    # Rayleigh quotient of the found vector reproduces it
    v = [1.0] * 8
    for _ in range(200):
        w = [sum(cov[i][j] * v[j] for j in range(8)) for i in range(8)]
        nrm = math.sqrt(sum(x * x for x in w))
        assert nrm > 0
        v = [x / nrm for x in w]
    lam = sum(v[i] * sum(cov[i][j] * v[j] for j in range(8)) for i in range(8))
    trace = sum(cov[i][i] for i in range(8))
    assert 0 < lam <= trace + 1e-12
    # Cauchy-Schwarz on every pair: |cov_ij| <= sqrt(var_i * var_j)
    for i in range(8):
        for j in range(8):
            assert abs(cov[i][j]) <= math.sqrt(cov[i][i] * cov[j][j]) + 1e-12
