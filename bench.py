"""Headline benchmark: cold-file -> count-table bases/s on one chip.

Primary metric (the ONE JSON line on stdout): k=21 nucleotide k-mers over
the 5-genome reference set (19,448,919 bp, gzipped FASTA), min-count 10,
timed END TO END per run — gzip decompress + parse + encode + pack + h2d +
device count + fetch of the filtered tables. Baseline: MerCat2 multiprocess
CPU, k=31, 8 threads = 5.372 s on the same data = 3.62 Mbases/s (reference
results/results_2023-11-08/results.csv:7; the reference's wall time equally
includes reading the gzip inputs). Secondary configs (stderr, `#` lines):
k=3 protein counting (BASELINE.json configs[0]) and k=5 nucleotide counting
(reference "Time to count 5-mers" = 1.63 s, results/2023-11-29.log).
"""

from __future__ import annotations

import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

DATA_NT = Path("/root/reference/data/5-genomes-fna_gz")
DATA_AA = Path("/root/reference/data/5-genomes-faa_gz")
MIN_COUNT = 10
BASELINE_K31_BASES_PER_S = 19_448_919 / 5.372  # ref k=31, 8 CPU threads
BASELINE_K5_S = 1.63  # ref "Time to count 5-mers", 6 threads, same data


def _count_cold(files: list[Path], k: int) -> tuple[int, int, float]:
    """One cold run: files on disk -> fetched tables. Returns
    (total_bases, n_filtered_kmers, seconds)."""
    from mercat2_tpu.engine.codec import codec_for_alphabet
    from mercat2_tpu.engine.counter import KmerCounter, fetch_tables
    from mercat2_tpu.io.native import open_fasta_native

    import numpy as np

    t0 = time.perf_counter()
    # gzip + parse in threads (the C++ parser releases the GIL); device
    # launch groups dispatch AS SOON AS their files are parsed, so the
    # tail files' host parse overlaps the head groups' h2d + compute.
    # Per-group codecs are sound: the min-count filter is per file
    # (ref lib/mercat2_kmers.py:73-76), so no cross-group key comparison
    # ever happens and tables decode to byte strings independently.
    pool = ThreadPoolExecutor(max_workers=len(files))
    futs = [pool.submit(open_fasta_native, f) for f in files]
    pendings = []
    sources = []
    group: list = []
    group_syms = 0
    probe = KmerCounter(k, codec_for_alphabet(
        np.frombuffer(b"ACGT", np.uint8)))

    def flush():
        nonlocal group, group_syms
        if not group:
            return
        alpha = np.zeros(0, np.uint8)
        for s in group:
            alpha = np.union1d(alpha, s.alphabet())
        counter = KmerCounter(k, codec_for_alphabet(alpha.astype(np.uint8)))
        if counter.packable():
            pendings.extend(counter.dispatch_packed_segments(group, MIN_COUNT))
        else:
            streams = [counter.build_stream_native(s) for s in group]
            pendings.extend(counter.dispatch_streams(
                [st for st in streams if st is not None], MIN_COUNT))
        group, group_syms = [], 0

    for fut in futs:
        s = fut.result()
        assert s is not None, "build native/ first"
        sources.append(s)
        n = s.packed_len(1)
        if group and group_syms + n > probe._SEG_TARGET:
            flush()
        group.append(s)
        group_syms += n
    flush()
    n_kmers = sum(len(t) for t in fetch_tables(pendings))
    dt = time.perf_counter() - t0
    total = sum(s.seq_len for s in sources)
    for s in sources:
        s.close()
    pool.shutdown(wait=False)
    return total, n_kmers, dt


def _best_of(files: list[Path], k: int, runs: int = 3):
    total = n = 0
    best = float("inf")
    for _ in range(runs):
        total, n, dt = _count_cold(files, k)
        best = min(best, dt)
    return total, n, best


def main() -> None:
    from mercat2_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    nt_files = sorted(DATA_NT.glob("*.fna.gz"))
    aa_files = sorted(DATA_AA.glob("*.faa.gz"))
    assert nt_files and aa_files, "reference data missing"

    # warm every compiled shape first (first jit on the tunneled backend
    # costs seconds of server-side compile; NOTES_r1.md)
    _count_cold(nt_files, 21)
    _count_cold(nt_files, 5)
    _count_cold(aa_files, 3)

    bases, n21, dt21 = _best_of(nt_files, 21)
    bases_per_s = bases / dt21
    _, n5, dt5 = _best_of(nt_files, 5)
    residues, n3, dt3 = _best_of(aa_files, 3)

    print(json.dumps({
        "metric": "kmer_count_bases_per_s_k21_1chip_cold",
        "value": round(bases_per_s, 1),
        "unit": "bases/s",
        "vs_baseline": round(bases_per_s / BASELINE_K31_BASES_PER_S, 2),
    }))
    print(f"# k=21 nt cold: {bases} bases, {n21} kmers, {dt21:.3f} s "
          f"({bases_per_s/1e6:.1f} Mbases/s, {bases_per_s/BASELINE_K31_BASES_PER_S:.1f}x ref k=31 8t)",
          file=sys.stderr)
    print(f"# k=5  nt cold: {n5} kmers, {dt5:.3f} s "
          f"(ref 6-thread count stage {BASELINE_K5_S:.2f} s -> {BASELINE_K5_S/dt5:.1f}x)",
          file=sys.stderr)
    print(f"# k=3  aa cold: {residues} residues, {n3} kmers, {dt3:.3f} s "
          f"({residues/dt3/1e6:.1f} Mres/s)", file=sys.stderr)


if __name__ == "__main__":
    main()
