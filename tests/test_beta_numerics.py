"""Pin beta-diversity numerics against independent re-implementations.

The reference computes these through skbio -> scipy.spatial.distance.pdist
(/root/reference/lib/mercat2_diversity.py:56-105). The golden results tree
contains no committed beta distance matrices (only alpha diversity and
PCA), so there is nothing to byte-compare; instead every metric is pinned
against a from-the-definition formula written here without scipy — on the
golden combined nucleotide matrix and on random matrices. This also proves
the `sokalmichener` -> `rogerstanimoto` alias claim in metrics/beta.py:43-49:
scipy's (pre-1.17) sokalmichener 2R/(S+2R) is algebraically identical to
rogerstanimoto 2R/(n+R), verified numerically here from both written forms.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from mercat2_tpu.metrics.beta import BETA_METRICS, beta_distance_matrix

GOLDEN_COMBINED = Path(
    "/root/reference/results/2023-11-29/fna-5genomes-10/combined_Nucleotide.tsv"
)


def _counts(u, v):
    """Boolean contingency for binary vectors."""
    u, v = u != 0, v != 0
    ctt = int(np.sum(u & v))
    ctf = int(np.sum(u & ~v))
    cft = int(np.sum(~u & v))
    cff = int(np.sum(~u & ~v))
    return ctt, ctf, cft, cff


def _ref_metric(metric: str, u, v, var):
    d = u - v
    if metric in ("euclidean", "minkowski"):   # minkowski default p=2
        return float(np.sqrt(np.sum(d * d)))
    if metric in ("cityblock", "manhattan"):
        return float(np.sum(np.abs(d)))
    if metric == "sqeuclidean":
        return float(np.sum(d * d))
    if metric == "chebyshev":
        return float(np.max(np.abs(d)))
    if metric == "braycurtis":
        return float(np.sum(np.abs(d)) / np.sum(np.abs(u + v)))
    if metric == "canberra":
        den = np.abs(u) + np.abs(v)
        t = np.divide(np.abs(d), den, out=np.zeros_like(den, float),
                      where=den != 0)
        return float(np.sum(t))
    if metric == "cosine":
        return float(
            1.0 - np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v))
        )
    if metric == "correlation":
        uc, vc = u - u.mean(), v - v.mean()
        return float(
            1.0 - np.dot(uc, vc) / (np.linalg.norm(uc) * np.linalg.norm(vc))
        )
    if metric == "seuclidean":
        return float(np.sqrt(np.sum(d * d / var)))
    if metric == "hamming":
        return float(np.mean(u != v))
    n = u.shape[0]
    ctt, ctf, cft, cff = _counts(u, v)
    R = ctf + cft
    if metric == "dice":
        return R / (2.0 * ctt + R)
    if metric == "jaccard":
        return R / (ctt + R) if (ctt + R) else 0.0
    if metric == "matching":
        return R / n
    if metric == "rogerstanimoto":
        return 2.0 * R / (n + R)
    if metric == "sokalmichener":
        # scipy's (removed) definition, written as published: 2R/(S+2R)
        S = ctt + cff
        return 2.0 * R / (S + 2.0 * R)
    if metric == "russellrao":
        return (n - ctt) / n
    if metric == "sokalsneath":
        return 2.0 * R / (ctt + 2.0 * R)
    if metric == "yule":
        half = ctf * cft
        return 2.0 * half / (ctt * cff + half) if half else 0.0
    raise AssertionError(f"no oracle for {metric}")


def _ref_matrix(metric: str, x: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    var = np.var(x.astype(float), axis=0, ddof=1)
    out = np.zeros((n, n))
    for i in range(n):
        for j in range(i + 1, n):
            out[i, j] = out[j, i] = _ref_metric(
                metric, x[i].astype(float), x[j].astype(float), var
            )
    return out


def _matrices():
    rng = np.random.default_rng(0)
    mats = [
        rng.integers(0, 50, (5, 40)).astype(np.int64),
        (rng.random((6, 25)) < 0.4).astype(np.int64) * rng.integers(
            1, 90, (6, 25)),
    ]
    if GOLDEN_COMBINED.exists():
        rows = []
        with open(GOLDEN_COMBINED) as f:
            f.readline()
            for line in f:
                rows.append([int(c) for c in line.split("\t")[1:]])
        mats.append(np.asarray(rows, np.int64).T)  # samples x kmers
    return mats


@pytest.mark.parametrize(
    "metric", [m for m in BETA_METRICS if m != "mahalanobis"]
)
def test_beta_metric_matches_definition(metric):
    for x in _matrices():
        got = beta_distance_matrix(metric, x)
        want = _ref_matrix(metric, x)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12,
                                   err_msg=metric)


def test_sokalmichener_equals_rogerstanimoto_algebraically():
    """S + 2R = (n - R) + 2R = n + R, so the two published formulas agree
    exactly — the alias in metrics/beta.py is lossless."""
    for x in _matrices():
        a = _ref_matrix("sokalmichener", x)
        b = _ref_matrix("rogerstanimoto", x)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_allclose(
            beta_distance_matrix("sokalmichener", x), a, rtol=1e-12
        )
