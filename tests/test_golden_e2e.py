"""Golden end-to-end pipeline harness.

Runs ``run_pipeline`` over the reference's bundled 5-genome sets exactly as
its own test matrix does (/root/reference/results/run-tests.sh:14-28:
``mercat2.py -k 5 -f data/5-genomes-{fna,faa}_gz -pca -s 10``, default
``-c 10``) and byte-compares the output tree against the committed golden
results under /root/reference/results/2023-11-29/.

Coverage notes (verified against the golden artifacts):

- per-sample ``*_counts.tsv``: byte-identical (the core correctness oracle).
- ``combined_*.tsv``: body compared (the golden header says ``kmer``; the
  reference code producing it was later changed to take the header from the
  first per-sample column, ``k-mer`` — we match current code).
- PROTEIN combined: the reference's ``merge_tsv``
  (/root/reference/lib/mercat2_report.py:116-152) only refreshes its
  next-key candidate set from files consumed in the current round, so a
  not-yet-consumed smaller key can be folded into a later row (golden
  ``AAAHL 10...`` absorbed DJ's ``AAAHA 10``). Dense nucleotide tables never
  trigger the bug; sparse protein tables do. We implement the correct k-way
  merge, so the protein combined is compared against an independent pandas
  outer-join oracle of the GOLDEN per-sample TSVs instead of the buggy
  golden file.
- ``stats/*.txt``: compared against the NON-gz golden tree — the gz tree's
  stats files are empty (the reference's countAssembly.py did not read gzip).
- alpha diversity per-sample TSVs: byte-identical.
- ``clean/*.fna.gz``: decompressed bytes identical.

Runs on the 8-virtual-CPU-device mesh (tests/conftest.py), so this also
pins the sharded mesh engine end to end.
"""

import gzip
from pathlib import Path

import pytest

GOLD = Path("/root/reference/results/2023-11-29")
DATA = Path("/root/reference/data")

pytestmark = pytest.mark.skipif(
    not (GOLD.exists() and DATA.exists()), reason="reference tree missing"
)

SAMPLES_FNA = ["DJ", "GIC31", "RW1", "RW2", "Rleg"]
SAMPLES_FAA = [s + "_pro" for s in SAMPLES_FNA]


def _run(tmp_path, folder: str) -> Path:
    from mercat2_tpu.pipeline import PipelineConfig, run_pipeline

    out = tmp_path / "tree"
    run_pipeline(PipelineConfig(
        kmer=5, input_folder=str(DATA / folder), min_count=10,
        chunk_size_mb=10, pca=True, output=str(out),
    ))
    return out


def _body(path: Path) -> bytes:
    return path.read_bytes().split(b"\n", 1)[1]


def test_golden_tree_fna(tmp_path):
    out = _run(tmp_path, "5-genomes-fna_gz")
    gold = GOLD / "fna-5genomes_gz-10"
    for s in SAMPLES_FNA:
        f = f"tsv_nucleotide/{s}_counts.tsv"
        assert (out / f).read_bytes() == (gold / f).read_bytes(), f
        f = f"report/diversity/nucleotide-{s}.tsv"
        assert (out / f).read_bytes() == (gold / f).read_bytes(), f
        f = f"clean/{s}_clean.fna.gz"
        assert gzip.decompress((out / f).read_bytes()) == gzip.decompress(
            (gold / f).read_bytes()
        ), f
        # gz-tree stats are empty upstream; the non-gz tree has them
        f = f"stats/{s}.txt"
        assert (out / f).read_bytes() == (
            GOLD / "fna-5genomes-10" / f
        ).read_bytes(), f
    assert _body(out / "combined_Nucleotide.tsv") == _body(
        gold / "combined_Nucleotide.tsv"
    )
    assert (out / "report/report.html").exists()
    assert (out / "pca_Nucleotide/pca.tsv").exists()


def test_golden_tree_faa(tmp_path):
    import numpy as np
    import pandas as pd

    out = _run(tmp_path, "5-genomes-faa_gz")
    gold = GOLD / "faa-5genomes_gz-10"
    for s in SAMPLES_FAA:
        f = f"tsv_protein/{s}_counts.tsv"
        assert (out / f).read_bytes() == (gold / f).read_bytes(), f
        f = f"report/diversity/protein-{s}.tsv"
        assert (out / f).read_bytes() == (gold / f).read_bytes(), f
    # correct-merge oracle over the GOLDEN per-sample tables (see module
    # docstring for why the golden combined_protein.tsv itself is buggy)
    dfs = [
        pd.read_csv(gold / f"tsv_protein/{s}_counts.tsv", sep="\t",
                    index_col=0).rename(columns=lambda c, s=s: s)
        for s in SAMPLES_FAA
    ]
    oracle = pd.concat(dfs, axis=1).fillna(0).astype(int).sort_index()
    ours = pd.read_csv(out / "combined_protein.tsv", sep="\t", index_col=0)
    assert list(ours.index) == list(oracle.index)
    assert list(ours.columns) == SAMPLES_FAA
    assert np.array_equal(ours.values, oracle.values)


def test_golden_chunked_nucleotide_counts(tmp_path):
    """-s 1 forces real chunking (files > 1 MB split at record boundaries,
    original skipped, min-count applied PER CHUNK before the merge — the
    reference's documented undercount semantics, README.md:207 and
    bin/mercat2.py:101-137). Byte-compares the per-sample count TSVs
    against the golden fna-5genomes-1 tree."""
    from mercat2_tpu.pipeline import PipelineConfig, run_pipeline

    out = tmp_path / "tree1"
    run_pipeline(PipelineConfig(
        kmer=5, input_folder=str(DATA / "5-genomes-fna"), min_count=10,
        chunk_size_mb=1, output=str(out),
    ))
    # this checkout strips the two largest plain-text genomes (DJ, Rleg —
    # see /root/reference/.MISSING_LARGE_BLOBS); per-sample tables are
    # independent, so the remaining three still pin the chunked semantics
    samples = sorted(
        p.name.removesuffix(".fna")
        for p in (DATA / "5-genomes-fna").glob("*.fna")
    )
    assert samples, "no plain fna inputs present"
    for s in samples:
        got = (out / "tsv_nucleotide" / f"{s}_counts.tsv").read_bytes()
        want = (
            GOLD / "fna-5genomes-1" / "tsv_nucleotide" / f"{s}_counts.tsv"
        ).read_bytes()
        assert got == want, f"{s}: chunked counts differ from golden"


def test_golden_single_file_chunked(tmp_path):
    """Single-file `-i` runs with -s 1 (reference run-tests.sh:21-24).

    Golden tree names are misleading: `faa-DJ_gz-1` came from the PLAIN
    faa (chunked: 2.2 MB >= 1 MB), while the gz faa input (1,042,154
    bytes — just under the 1 MiB chunk gate, so NOT chunked) produced
    `DJ_gz-1`. Both semantics are pinned byte-identically, plus the
    chunked gz nucleotide run (DJ.fna.gz, 6 chunks)."""
    from mercat2_tpu.pipeline import PipelineConfig, run_pipeline

    out_nt = tmp_path / "nt"
    run_pipeline(PipelineConfig(
        kmer=5, input_files=[str(DATA / "5-genomes-fna_gz" / "DJ.fna.gz")],
        min_count=10, chunk_size_mb=1, output=str(out_nt),
    ))
    got = (out_nt / "tsv_nucleotide" / "DJ_counts.tsv").read_bytes()
    want = (GOLD / "fna-DJ_gz-1" / "tsv_nucleotide" / "DJ_counts.tsv"
            ).read_bytes()
    assert got == want

    out_aa = tmp_path / "aa"  # plain faa: chunked, per-chunk filter
    run_pipeline(PipelineConfig(
        kmer=5,
        input_files=[str(DATA / "5-genomes-faa" / "DJ_pro.faa")],
        min_count=10, chunk_size_mb=1, output=str(out_aa),
    ))
    got = (out_aa / "tsv_protein" / "DJ_pro_counts.tsv").read_bytes()
    want = (GOLD / "faa-DJ_gz-1" / "tsv_protein" / "DJ_pro_counts.tsv"
            ).read_bytes()
    assert got == want

    out_gz = tmp_path / "aagz"  # gz faa: below the chunk gate, unchunked
    run_pipeline(PipelineConfig(
        kmer=5,
        input_files=[str(DATA / "5-genomes-faa_gz" / "DJ_pro.faa.gz")],
        min_count=10, chunk_size_mb=1, output=str(out_gz),
    ))
    got = (out_gz / "tsv_protein" / "DJ_pro_counts.tsv").read_bytes()
    want = (GOLD / "DJ_gz-1" / "tsv_protein" / "DJ_pro_counts.tsv"
            ).read_bytes()
    assert got == want


def test_golden_chunked_protein_folder(tmp_path):
    """-s 1 over the protein folder (chunked faa, per-chunk filter):
    byte-identical per-sample tables vs the golden faa-5genomes-1 tree."""
    from mercat2_tpu.pipeline import PipelineConfig, run_pipeline

    out = tmp_path / "faa1"
    run_pipeline(PipelineConfig(
        kmer=5, input_folder=str(DATA / "5-genomes-faa"), min_count=10,
        chunk_size_mb=1, output=str(out),
    ))
    for s in SAMPLES_FAA:
        got = (out / "tsv_protein" / f"{s}_counts.tsv").read_bytes()
        want = (GOLD / "faa-5genomes-1" / "tsv_protein" / f"{s}_counts.tsv"
                ).read_bytes()
        assert got == want, s


def test_golden_fastq_tree_skipclean(tmp_path):
    """The golden test-qc tree was produced WITHOUT fastp installed (the
    reference warns and skips trimming when the tool is missing), i.e.
    the raw fastq->fasta conversion fed the counter. `-skipclean`
    reproduces that state byte-for-byte: the converted fasta and the k=5
    count TSV both match the goldens."""
    from mercat2_tpu.pipeline import PipelineConfig, run_pipeline

    out = tmp_path / "qc"
    run_pipeline(PipelineConfig(
        kmer=5, input_files=[str(DATA / "Test_R1.fastq")], min_count=10,
        chunk_size_mb=100, output=str(out), skipclean=True,
    ))
    gold = GOLD / "test-qc"
    got = gzip.decompress((out / "clean" / "Test_R1.fna.gz").read_bytes())
    want = gzip.decompress((gold / "clean" / "Test_R1.fna.gz").read_bytes())
    assert got == want
    f = "tsv_nucleotide/Test_R1_counts.tsv"
    assert (out / f).read_bytes() == (gold / f).read_bytes()
