"""FASTQ handling, ORF finder, assembly stats, beta diversity."""

import gzip

import numpy as np
import pytest

from mercat2_tpu.io import fastq as fq
from mercat2_tpu.metrics.assembly import assembly_stats
from mercat2_tpu.metrics.beta import beta_distance_matrix, compute_beta_diversity
from mercat2_tpu.orf.native import find_orfs, CODON_TABLE


# ---- FASTQ ----

def test_read_fastq(ref_data):
    arr = fq.read_fastq(ref_data / "Test_R1.fastq")
    assert arr.n_reads == 250
    gz = fq.read_fastq(ref_data / "Test_R1.fastq.gz")
    assert gz.n_reads == 250
    assert bytes(gz.seq) == bytes(arr.seq)


def test_fq2fa_matches_sed_semantics(tmp_path, ref_data):
    out = fq.fq2fa(ref_data / "Test_R1.fastq", tmp_path, "t")
    with gzip.open(out, "rt") as f:
        lines = f.read().rstrip("\n").split("\n")
    assert len(lines) == 500
    assert lines[0].startswith(">")
    assert set(lines[1]) <= set("ACGTN")


def test_trim_filters(tmp_path):
    src = tmp_path / "r.fastq"
    good = "@ok\n" + "A" * 50 + "\n+\n" + "I" * 50 + "\n"
    low_q = "@bad\n" + "A" * 50 + "\n+\n" + "#" * 50 + "\n"  # q=2 everywhere
    many_n = "@nnn\n" + "N" * 20 + "A" * 30 + "\n+\n" + "I" * 50 + "\n"
    short = "@short\nACGT\n+\nIIII\n"
    src.write_text(good + low_q + many_n + short)
    out = fq.trim(src, tmp_path / "o", "r")
    text = out.read_text()
    assert "@ok" in text
    assert "@bad" not in text and "@nnn" not in text and "@short" not in text


def test_trim_fastp_defaults_on_test_r1(tmp_path, ref_data):
    """fastp-default behavior on the bundled fastq (fastp itself is absent
    from this env AND was absent from the golden run — the 0.05 s load in
    results/2023-11-29.log means the reference skipped trimming, so
    clean/Test_R1.fna.gz is the raw conversion, not a fastp oracle).
    Per fastp's documented defaults: no adapter present -> no bases
    clipped; read index 4 carries 8 N bases -> dropped by n_base_limit=5;
    all other 249 reads pass untouched."""
    raw = fq.read_fastq(ref_data / "Test_R1.fastq")
    out = fq.trim(ref_data / "Test_R1.fastq", tmp_path, "Test_R1")
    trimmed = fq.read_fastq(out)
    assert trimmed.n_reads == 249
    kept = [i for i in range(raw.n_reads) if i != 4]
    for j, i in enumerate(kept):
        assert trimmed.read_seq(j) == raw.read_seq(i)
        assert trimmed.read_qual(j) == raw.read_qual(i)


def test_trim_adapter_clipping(tmp_path):
    """Explicit adapter: clipped at the match (fastp trimBySequence rule),
    partial adapter at the tail also clipped (>=4-base overlap)."""
    adapter = "CTGTCTCTTATACACATCT"
    insert = "ACGTACGTACGTACGTACGTACGTACGT"
    src = tmp_path / "a.fastq"
    full = insert + adapter + "TTTT"
    partial = insert + adapter[:6]
    clean = insert + "GGGGCCCCAAAA"
    reads = [("full", full), ("partial", partial), ("clean", clean)]
    src.write_text("".join(
        f"@{n}\n{s}\n+\n{'I' * len(s)}\n" for n, s in reads
    ))
    out = fq.trim(src, tmp_path / "o", "a", adapter=adapter)
    lines = out.read_text().strip().split("\n")
    seqs = {lines[i][1:]: lines[i + 1] for i in range(0, len(lines), 4)}
    assert seqs["full"] == insert
    assert seqs["partial"] == insert
    assert seqs["clean"] == clean


def test_qc_writes_report(tmp_path, ref_data):
    html = fq.qc(ref_data / "Test_R1.fastq", tmp_path, "t")
    assert html.exists()
    assert "Per-position quality" in html.read_text()


# ---- ORF finder ----

def test_codon_table_length():
    assert len(CODON_TABLE) == 64


def test_find_simple_orf():
    # ATG + 32 codons + stop = 102 nt >= 90
    gene = "ATG" + "GCT" * 32 + "TAA"
    seq = np.frombuffer(gene.encode(), np.uint8)
    orfs = find_orfs(seq, min_nt=90)
    fwd = [o for o in orfs if o["strand"] == 1]
    assert len(fwd) == 1
    o = fwd[0]
    assert o["start"] == 1 and o["end"] == len(gene)
    assert o["protein"] == b"M" + b"A" * 32


def test_reverse_strand_orf():
    gene = "ATG" + "GAA" * 40 + "TGA"
    import re

    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = "".join(comp[c] for c in reversed(gene))
    seq = np.frombuffer(rc.encode(), np.uint8)
    orfs = [o for o in find_orfs(seq, min_nt=90) if o["strand"] == -1]
    assert any(o["protein"] == b"M" + b"E" * 40 for o in orfs)


def test_short_orf_filtered():
    gene = "ATG" + "GCT" * 5 + "TAA"  # 21 nt
    seq = np.frombuffer(gene.encode(), np.uint8)
    assert find_orfs(seq, min_nt=90) == []


def test_orf_with_n_bases():
    gene = "ATG" + "GCT" * 20 + "NNN" + "GCT" * 20 + "TAA"
    seq = np.frombuffer(gene.encode(), np.uint8)
    orfs = [o for o in find_orfs(seq, min_nt=90) if o["strand"] == 1]
    assert orfs and b"X" in orfs[0]["protein"]


def test_orf_call_native(tmp_path, ref_data):
    from mercat2_tpu.orf import orf_call

    name, faa = orf_call("scaf", ref_data / "Scaffolds_with-NNN.fna",
                         tmp_path, engine="fgs")
    assert name == "scaf"
    with gzip.open(faa, "rt") as f:
        text = f.read()
    assert text.count(">") > 10  # 1 Mbp of contigs has many ORFs


# ---- assembly stats ----

def test_assembly_stats_basic(tmp_path):
    p = tmp_path / "x.fna"
    p.write_text(">a\n" + "ACGC" * 50 + "\n>b\n" + "AT" * 30 + "\n")
    text = assembly_stats(p)
    assert "Total length of sequence:\t260 bp" in text
    assert "Total number of contigs:\t2" in text
    assert "N50 stats:" in text
    assert "GC %:" in text
    # GC: 150 G/C in record a (3 of every 4 bases), 0 in b -> 150/260
    assert f"{100 * 150 / 260:.2f} %" in text


# ---- beta diversity ----

def test_beta_euclidean_golden(tmp_path, golden_results):
    base = golden_results / "fna-5genomes-10"
    golden = base / "report" / "diversity" / "euclidean-Nucleotide.tsv"
    if not golden.exists():
        pytest.skip("golden beta missing")
    rows = golden.read_text().rstrip("\n").split("\n")
    ids = rows[0].split("\t")[1:]
    want = np.array([[float(x) for x in r.split("\t")[1:]] for r in rows[1:]])
    # rebuild the counts matrix from the golden transposed combined file
    src = base / "combined_Nucleotide_T.tsv"
    data = {}
    with open(src) as f:
        f.readline()
        for line in f:
            cols = line.rstrip("\n").split("\t")
            data[cols[0]] = [int(x) for x in cols[1:]]
    mat = np.array([data[i] for i in ids])
    got = beta_distance_matrix("euclidean", mat)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_beta_diversity_writes_outputs(tmp_path):
    src = tmp_path / "T.tsv"
    src.write_text(
        "sample\tAA\tCC\tGG\n"
        "s1\t1\t2\t3\n"
        "s2\t3\t2\t1\n"
        "s3\t0\t5\t0\n"
    )
    done = compute_beta_diversity("test", src, tmp_path / "beta")
    assert "euclidean" in done and "braycurtis" in done
    assert (tmp_path / "beta" / "euclidean-test.tsv").exists()
    assert (tmp_path / "beta" / "euclidean-test.png").exists()
    assert "mahalanobis" not in done  # singular for 3 samples


def test_vendored_fgs_matches_golden_faa(tmp_path, golden_results):
    """The vendored FragGeneScanRs binary reproduces the reference's golden
    fgs output byte-for-byte (same upstream release the reference bundles,
    /root/reference/lib/mercat2_fasta.py:265-288)."""
    import gzip as _gzip

    from mercat2_tpu.orf.caller import fgs_executable, orf_call

    exe = fgs_executable()
    if exe is None or "vendor" not in exe:
        pytest.skip("vendored FGS binary missing")
    clean = golden_results / "fna-5genomes-10" / "clean" / "DJ_clean.fna.gz"
    golden = golden_results / "fna-5genomes-10" / "fgs" / "DJ.faa.gz"
    if not (clean.exists() and golden.exists()):
        pytest.skip("golden fgs inputs missing")
    name, faa = orf_call("DJ", clean, tmp_path, engine="fgs")
    assert name == "DJ"
    with _gzip.open(faa, "rb") as f:
        got = f.read()
    with _gzip.open(golden, "rb") as f:
        want = f.read()
    assert got == want


def test_qc_fastqc_depth_stats(tmp_path):
    """fastqc-depth QC content: per-base composition, duplication levels,
    overrepresented sequences (ref shells out to fastqc,
    lib/mercat2_fasta.py:150)."""
    import json

    from mercat2_tpu.io.fastq import _KNOWN_ADAPTERS, qc

    dup = b"ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTACGTAC"
    adapter_read = _KNOWN_ADAPTERS[0][:33] + b"ACGTACGTACGTACGTA"
    lines = []
    for i in range(60):
        seq = dup if i < 30 else bytes(
            __import__("random").Random(i).choice(b"ACGT") for _ in range(50)
        )
        if 30 <= i < 40:
            seq = adapter_read
        lines += [b"@r%d" % i, seq, b"+", b"I" * len(seq)]
    f = tmp_path / "dups.fastq"
    f.write_bytes(b"\n".join(lines) + b"\n")
    qc(f, tmp_path, "dups")
    stats = json.loads((tmp_path / "dups.fastq_qc.json").read_text())

    content = stats["per_base_content"]
    assert len(content) == 50
    for row in content[:3]:
        s = row["a"] + row["c"] + row["g"] + row["t"] + row["n"]
        assert 99.0 <= s <= 101.0

    d = stats["duplication"]
    assert d["pct_remaining_if_dedup"] < 50.0  # half the reads are one dup
    lvl = {r["level"]: r for r in d["levels"]}
    assert lvl[">10"]["pct_of_total"] >= 50.0  # the 30-copy read's bin

    over = stats["overrepresented"]
    seqs = [o["sequence"] for o in over]
    assert dup.decode() in seqs
    adapter_hits = [o for o in over if o["possible_source"] != "No Hit"]
    assert adapter_hits and adapter_hits[0]["count"] == 10

    html = (tmp_path / "dups.fastq_qc.html").read_text()
    assert "Sequence duplication levels" in html
    assert "Overrepresented sequences" in html
