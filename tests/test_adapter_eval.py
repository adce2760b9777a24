"""Adapter auto-detection vs a fastp-style seed-consensus oracle.

io.fastq._detect_adapter now implements fastp's evaluator natively:
count 10-base seeds over sampled reads and extend the winner into a
consensus sequence (fastp evaluator.cpp, evalAdapterAndReadNum), snapping
onto known Illumina adapters, with a known-adapter prefix probe as a
low-frequency fallback. This module re-implements the seed-consensus
algorithm as a straightforward per-read oracle, feeds both adapter-rich
synthetic data (adapter at random insert positions, with sequencing
errors), and asserts seed, consensus, and the RESULTING TRIMS agree. The
trimming rule itself (trimBySequence: >=4-base overlap, <=1 mismatch per
8 bases) is shared, so detection is the only possible source of
divergence.
"""

import random
from pathlib import Path

import numpy as np
import pytest

from mercat2_tpu.io.fastq import (
    _KNOWN_ADAPTERS, _adapter_trim_pos, _detect_adapter, read_fastq, trim,
)

TRUSEQ = _KNOWN_ADAPTERS[0]
BASES = b"ACGT"


def _synthetic_fastq(path: Path, n_reads: int, adapter: bytes | None,
                     adapter_frac: float, seed: int, read_len: int = 100,
                     err: float = 0.01) -> None:
    rng = random.Random(seed)
    lines = []
    for i in range(n_reads):
        insert_len = rng.randint(30, read_len)
        seq = bytearray(rng.choice(BASES) for _ in range(insert_len))
        if adapter and rng.random() < adapter_frac and insert_len < read_len:
            tail = adapter[: read_len - insert_len]
            seq += bytes(
                b if rng.random() > err else rng.choice(BASES) for b in tail
            )
        seq = seq[:read_len]
        lines += [f"@read{i}".encode(), bytes(seq), b"+", b"I" * len(seq)]
    path.write_bytes(b"\n".join(lines) + b"\n")


def _fastp_style_evaluator(fq, seed_len: int = 10,
                           sample: int = 100_000) -> bytes | None:
    """Oracle: fastp's documented seed-count + consensus-extension walk.

    Count every ``seed_len``-mer over the sampled reads, discard
    low-complexity seeds (a base occupying >= 60% of the seed), take the
    most frequent seed if it appears in >= 1% of reads, then extend it
    rightward by majority vote of the following base (support >= 50% of
    the seed's occurrences) up to a full adapter length.
    """
    n = min(fq.n_reads, sample)
    counts: dict[bytes, int] = {}
    for i in range(n):
        s = fq.read_seq(i)
        for p in range(len(s) - seed_len + 1):
            kmer = s[p : p + seed_len]
            counts[kmer] = counts.get(kmer, 0) + 1
    best = None
    for kmer, c in counts.items():
        if max(kmer.count(b) for b in BASES) >= 0.6 * seed_len:
            continue  # low complexity
        if best is None or c > best[1]:
            best = (kmer, c)
    # fastp requires the winner to be clearly enriched, not a chance
    # collision (random 10-mers repeat a handful of times in 300+ reads)
    if best is None or best[1] < max(10, n // 20):
        return None
    seedk, support = best
    # consensus extension to the right
    adapter = bytearray(seedk)
    while len(adapter) < 35:
        nxt: dict[int, int] = {}
        total = 0
        for i in range(n):
            s = fq.read_seq(i)
            p = s.find(bytes(adapter))
            if p >= 0 and p + len(adapter) < len(s):
                b = s[p + len(adapter)]
                nxt[b] = nxt.get(b, 0) + 1
                total += 1
        if not total:
            break
        b, c = max(nxt.items(), key=lambda kv: kv[1])
        if c < max(2, total // 2):
            break
        adapter.append(b)
    return bytes(adapter)


@pytest.mark.parametrize("adapter_frac", [0.6, 0.15])
def test_detectors_agree_on_adapter_rich_data(tmp_path, adapter_frac):
    f = tmp_path / "reads.fastq"
    _synthetic_fastq(f, 400, TRUSEQ, adapter_frac, seed=int(adapter_frac * 100))
    fq = read_fastq(f)

    ours = _detect_adapter(fq)
    oracle = _fastp_style_evaluator(fq)
    assert ours == TRUSEQ
    assert oracle is not None
    assert (
        TRUSEQ.startswith(oracle[: len(TRUSEQ)])
        or oracle in TRUSEQ
        or TRUSEQ[:10] in oracle
    )

    # the shared trimBySequence rule applied with each detector's adapter:
    # measure per-read trim-position disagreement and bound it at zero
    diffs = sum(
        _adapter_trim_pos(fq.read_seq(i), ours)
        != _adapter_trim_pos(fq.read_seq(i), oracle)
        for i in range(fq.n_reads)
    )
    assert diffs == 0, f"{diffs}/{fq.n_reads} reads trimmed differently"


def test_detectors_agree_on_adapter_free_data(tmp_path):
    f = tmp_path / "clean.fastq"
    _synthetic_fastq(f, 300, None, 0.0, seed=7)
    fq = read_fastq(f)
    assert _detect_adapter(fq) is None
    assert _fastp_style_evaluator(fq) is None


def test_trim_report_documents_adapter(tmp_path):
    import json

    f = tmp_path / "reads.fastq"
    _synthetic_fastq(f, 120, TRUSEQ, 0.5, seed=3)
    trim(f, tmp_path / "out", "reads")
    rep = json.loads((tmp_path / "out" / "reads-trim.json").read_text())
    assert rep["adapter"] == TRUSEQ.decode()
    assert "seed-consensus" in rep["adapter_detector"]
    # adapter-bearing reads were actually clipped
    trimmed = read_fastq(tmp_path / "out" / "reads_trim.fastq")
    assert trimmed.lengths().mean() < read_fastq(f).lengths().mean()


@pytest.mark.parametrize("seed", [0, 1])
def test_batch_trim_pos_matches_scalar(tmp_path, seed):
    """Vectorized trimBySequence == per-read scalar rule, bit for bit."""
    from mercat2_tpu.io.fastq import _adapter_trim_pos_batch

    f = tmp_path / "reads.fastq"
    _synthetic_fastq(f, 300, TRUSEQ, 0.5, seed=seed, err=0.05)
    fq = read_fastq(f)
    batch = _adapter_trim_pos_batch(fq, TRUSEQ)
    for i in range(fq.n_reads):
        assert batch[i] == _adapter_trim_pos(fq.read_seq(i), TRUSEQ), i


def test_batch_trim_pos_short_and_empty_reads():
    from mercat2_tpu.io.fastq import FastqArrays, _adapter_trim_pos_batch

    for seqs in (
        [b"ACG", b"", b"AGATCGGAAGAG", b"TT"],
        [b"ACG", b"", b"AGATCGGAAGAG", b""],   # trailing empty read
        [b"", b""],                            # all reads empty
    ):
        flat = np.frombuffer(b"".join(seqs), np.uint8)
        offsets = np.concatenate([[0], np.cumsum([len(s) for s in seqs])])
        fq = FastqArrays([b"r%d" % i for i in range(len(seqs))], flat,
                         np.zeros_like(flat), offsets.astype(np.int64))
        batch = _adapter_trim_pos_batch(fq, TRUSEQ)
        for i, s in enumerate(seqs):
            assert batch[i] == _adapter_trim_pos(s, TRUSEQ), (i, s)


def test_consensus_evaluator_matches_oracle(tmp_path):
    """The vectorized product evaluator == the per-read oracle, seed and
    consensus alike, on adapter-rich data."""
    from mercat2_tpu.io.fastq import _evaluate_adapter_consensus

    f = tmp_path / "reads.fastq"
    _synthetic_fastq(f, 400, TRUSEQ, 0.5, seed=11, err=0.0)
    fq = read_fastq(f)
    ours = _evaluate_adapter_consensus(fq)
    oracle = _fastp_style_evaluator(fq)
    assert ours is not None and oracle is not None
    assert ours == oracle


def test_custom_adapter_detected_and_trimmed(tmp_path):
    """A non-Illumina adapter (absent from the known list) is found by the
    consensus evaluator and clipped — the old prefix probe could not."""
    custom = b"TGCACTGAGGCTAACTTGCCGATCGTAGCAAGCTA"
    assert all(custom[:12] not in k for k in _KNOWN_ADAPTERS)
    f = tmp_path / "reads.fastq"
    _synthetic_fastq(f, 400, custom, 0.6, seed=5, err=0.0)
    fq = read_fastq(f)
    det = _detect_adapter(fq)
    assert det is not None and det[:10] == custom[:10], det
    trim(f, tmp_path / "out", "reads")
    trimmed = read_fastq(tmp_path / "out" / "reads_trim.fastq")
    assert trimmed.lengths().mean() < fq.lengths().mean()


def test_consensus_quiet_on_adapter_free(tmp_path):
    from mercat2_tpu.io.fastq import _evaluate_adapter_consensus

    f = tmp_path / "clean.fastq"
    _synthetic_fastq(f, 400, None, 0.0, seed=13)
    assert _evaluate_adapter_consensus(read_fastq(f)) is None
