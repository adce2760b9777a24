"""Device (jax) metric parity vs the float64 host implementations.

The ``-device-metrics`` flag routes protein pI/MW/hydropathy and alpha
diversity through mercat2_tpu.metrics.device (float32 on accelerators);
these tests bound its drift against the bit-parity host path on real
reference data (golden protein faa + golden count TSVs).
"""

from pathlib import Path

import numpy as np
import pytest

from mercat2_tpu.metrics.alpha import ALPHA_METRICS, alpha_metric
from mercat2_tpu.metrics.device import (
    alpha_metrics_device, protein_metrics_device,
)
from mercat2_tpu.metrics.protein import (
    _parse_protein_fasta, hydropathy_batch, isoelectric_point_batch,
    molecular_weight_batch,
)

GOLDEN = Path("/root/reference/results/2023-11-29")
FAA = Path("/root/reference/data/5-genomes-faa_gz/DJ_pro.faa.gz")


@pytest.mark.skipif(not FAA.exists(), reason="reference data absent")
def test_protein_metrics_device_parity():
    _, _, seqs = _parse_protein_fasta(FAA)
    seqs = seqs[:4096]
    flat = np.frombuffer("".join(seqs).encode("latin-1"), np.uint8)
    lens = np.asarray([len(s) for s in seqs], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)])

    pi_h = isoelectric_point_batch(flat, offsets)
    mw_h = molecular_weight_batch(flat, offsets)
    hy_h = hydropathy_batch(flat, offsets)
    pi_d, mw_d, hy_d = protein_metrics_device(flat, offsets)

    assert np.array_equal(np.isnan(pi_h), np.isnan(pi_d))
    ok = ~np.isnan(pi_h)
    # the bisection terminates within 0.01 of the root on both paths; the
    # two f32/f64 runs may settle on different sides of it
    assert np.max(np.abs(pi_h[ok] - pi_d[ok])) <= 0.02
    assert np.allclose(mw_h, mw_d, rtol=1e-5, atol=0.05)
    assert np.allclose(hy_h, hy_d, rtol=1e-4, atol=0.05)


def _golden_counts(tsv: Path) -> np.ndarray:
    counts = []
    with open(tsv) as f:
        f.readline()
        for line in f:
            counts.append(int(line.split()[1]))
    return np.asarray(counts, np.int64)


@pytest.mark.skipif(not GOLDEN.exists(), reason="golden tree absent")
@pytest.mark.parametrize("sample", ["DJ", "GIC31", "RW1"])
def test_alpha_metrics_device_parity(sample):
    counts = _golden_counts(
        GOLDEN / "fna-5genomes_gz-10" / "tsv_nucleotide"
        / f"{sample}_counts.tsv"
    )
    dev = alpha_metrics_device(counts)
    for name in ALPHA_METRICS:
        host = alpha_metric(name, counts)
        got = dev[name]
        if isinstance(host, str):
            assert got == host, name
            continue
        if name == "chao1_ci":
            for h, g in zip(host, got):
                assert abs(h - g) <= max(1e-2 * abs(h), 0.05), (name, host, got)
            continue
        assert abs(host - got) <= max(1e-3 * abs(host), 0.02), (
            name, host, got,
        )


def test_alpha_metrics_device_na_cases():
    # all singletons: fisher_alpha and ace undefined on both paths
    counts = np.ones(50, np.int64)
    dev = alpha_metrics_device(counts)
    assert alpha_metric("fisher_alpha", counts) == "NA"
    assert dev["fisher_alpha"] == "NA"
    assert alpha_metric("ace", counts) == "NA"
    assert dev["ace"] == "NA"
