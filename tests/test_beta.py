"""Numeric parity tests for all 20 beta-diversity metrics.

The reference feeds raw count vectors to skbio's ``beta_diversity``
(/root/reference/lib/mercat2_diversity.py:56-105), which forwards to
scipy's ``pdist``. No golden beta TSVs are committed upstream, so the
oracle here is an independent re-implementation of every metric from its
published formula (boolean metrics use the presence/absence contingency
table, matching skbio<=0.5/scipy<=1.16 semantics).
"""

from __future__ import annotations

import numpy as np
import pytest

from mercat2_tpu.metrics.beta import BETA_METRICS, beta_distance_matrix

# 4 samples x 6 features; includes zeros, ties, and shared absences so the
# boolean contingency cells (ctt, ctf, cft, cff) are all exercised.
MAT = np.array(
    [
        [10, 0, 3, 0, 7, 1],
        [2, 5, 0, 0, 7, 4],
        [0, 5, 3, 2, 0, 0],
        [1, 1, 2, 1, 1, 1],
    ],
    dtype=np.int64,
)


def _contingency(u, v):
    ub, vb = u != 0, v != 0
    ctt = int(np.sum(ub & vb))
    ctf = int(np.sum(ub & ~vb))
    cft = int(np.sum(~ub & vb))
    cff = int(np.sum(~ub & ~vb))
    return ctt, ctf, cft, cff


def _expected(metric: str, x: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    out = np.zeros((n, n))
    # column variances for seuclidean: pdist uses ddof=1 over the input rows
    var = np.var(x.astype(float), axis=0, ddof=1)

    def d(u, v):
        u = u.astype(float)
        v = v.astype(float)
        ctt, ctf, cft, cff = _contingency(u, v)
        r = ctf + cft
        nn = ctt + ctf + cft + cff
        if metric == "euclidean":
            return np.sqrt(np.sum((u - v) ** 2))
        if metric in ("cityblock", "manhattan"):
            return np.sum(np.abs(u - v))
        if metric == "braycurtis":
            return np.sum(np.abs(u - v)) / np.sum(np.abs(u + v))
        if metric == "canberra":
            den = np.abs(u) + np.abs(v)
            nz = den > 0
            return np.sum(np.abs(u - v)[nz] / den[nz])
        if metric == "chebyshev":
            return np.max(np.abs(u - v))
        if metric == "correlation":
            uc, vc = u - u.mean(), v - v.mean()
            return 1.0 - np.dot(uc, vc) / (
                np.linalg.norm(uc) * np.linalg.norm(vc)
            )
        if metric == "cosine":
            return 1.0 - np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v))
        if metric == "dice":
            return r / (2 * ctt + r)
        if metric == "hamming":
            return np.mean(u != v)
        if metric == "jaccard":
            return r / (ctt + r) if (ctt + r) else 0.0
        if metric == "matching":
            return r / nn
        if metric == "minkowski":  # default p=2
            return np.sqrt(np.sum((u - v) ** 2))
        if metric in ("rogerstanimoto", "sokalmichener"):
            # scipy's (removed) sokalmichener was numerically identical to
            # rogerstanimoto: 2R / (S + 2R)
            return 2.0 * r / (ctt + cff + 2.0 * r)
        if metric == "russellrao":
            return (nn - ctt) / nn
        if metric == "seuclidean":
            return np.sqrt(np.sum((u - v) ** 2 / var))
        if metric == "sokalsneath":
            return 2.0 * r / (ctt + 2.0 * r)
        if metric == "sqeuclidean":
            return np.sum((u - v) ** 2)
        if metric == "yule":
            half = ctf * cft
            return 2.0 * half / (ctt * cff + half) if half else 0.0
        raise AssertionError(f"no oracle for {metric}")

    for i in range(n):
        for j in range(i + 1, n):
            out[i, j] = out[j, i] = d(x[i], x[j])
    return out


@pytest.mark.parametrize("metric", [m for m in BETA_METRICS if m != "mahalanobis"])
def test_beta_metric_numeric_parity(metric):
    got = beta_distance_matrix(metric, MAT)
    want = _expected(metric, MAT)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12, err_msg=metric)


def test_sokalmichener_value_pinned():
    """Regression pin: sokalmichener == rogerstanimoto (2R/(S+2R)), NOT the
    simple matching distance R/n (they differ: 0.8 vs 2/3 on this pair)."""
    x = np.array([[1, 0, 3], [0, 2, 1]], dtype=np.int64)
    got = beta_distance_matrix("sokalmichener", x)[0, 1]
    assert got == pytest.approx(0.8)
    assert got != pytest.approx(2.0 / 3.0)


def test_mahalanobis_raises_with_few_samples():
    """5 samples x many features: singular covariance -> scipy raises; the
    reference logs and continues (lib/mercat2_diversity.py:79,101-103)."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, 10, size=(5, 50))
    with pytest.raises(Exception):
        beta_distance_matrix("mahalanobis", x)
