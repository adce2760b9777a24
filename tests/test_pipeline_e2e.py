"""End-to-end pipeline/CLI tests on the bundled small datasets (CPU mesh)."""

from pathlib import Path

import pytest

from mercat2_tpu.pipeline import PipelineConfig, run_pipeline


@pytest.fixture(scope="module")
def simka_run(ref_data, tmp_path_factory):
    out = tmp_path_factory.mktemp("simka_out") / "res"
    cfg = PipelineConfig(
        kmer=4,
        input_files=[
            ref_data / "simka_test_data" / n
            for n in ["A.fasta", "B.fasta", "C.fasta", "D_paired_1.fasta", "D_paired_2.fasta"]
        ],
        min_count=1,
        chunk_size_mb=100,
        output=str(out),
        pca=True,
        skipclean=True,  # skip contig cleaning for speed; counting still runs
    )
    run_pipeline(cfg)
    return out


def test_per_sample_tsvs(simka_run, ref_kmers_module):
    tsvs = sorted((simka_run / "tsv_nucleotide").glob("*_counts.tsv"))
    assert len(tsvs) == 5
    # byte-level check vs reference oracle on one sample
    ref = ref_kmers_module.find_kmers(
        Path("/root/reference/data/simka_test_data/A.fasta"), 4, 1
    )
    got = {}
    with open(simka_run / "tsv_nucleotide" / "A_counts.tsv") as f:
        f.readline()
        for line in f:
            km, c = line.split()
            got[km] = int(c)
    assert got == ref


def test_combined_outputs(simka_run):
    combined = simka_run / "combined_Nucleotide.tsv"
    combined_t = simka_run / "combined_Nucleotide_T.tsv"
    assert combined.exists() and combined_t.exists()
    header = combined.read_text().split("\n", 1)[0].split("\t")
    assert header == ["k-mer", "A", "B", "C", "D_paired_1", "D_paired_2"]


def test_report_and_figures(simka_run):
    report = simka_run / "report" / "report.html"
    assert report.exists()
    text = report.read_text()
    assert "Combined Nucleotide kmer Summary" in text
    assert "Plotly.newPlot" in text
    assert "PCA 3D" in text  # 5 samples > 3 -> PCA ran
    assert (simka_run / "pca_Nucleotide" / "pca.tsv").exists()


def test_alpha_diversity_outputs(simka_run):
    div = simka_run / "report" / "diversity"
    files = sorted(p.name for p in div.glob("nucleotide-*.tsv"))
    assert files == [
        "nucleotide-A.tsv",
        "nucleotide-B.tsv",
        "nucleotide-C.tsv",
        "nucleotide-D_paired_1.tsv",
        "nucleotide-D_paired_2.tsv",
    ]
    text = (div / "nucleotide-A.tsv").read_text()
    assert text.startswith("Metric\tA\nshannon\t")
    merged = simka_run / "report" / "diversity-Nucleotide.tsv"
    assert merged.exists()
    assert merged.read_text().split("\n")[0] == "Metric\tA\tB\tC\tD_paired_1\tD_paired_2"


def test_beta_diversity_outputs(simka_run):
    beta = simka_run / "report" / "diversity"
    assert (beta / "euclidean-Nucleotide.tsv").exists()
    assert (beta / "braycurtis-Nucleotide.png").exists()


def test_stats_written(simka_run):
    stats = sorted(p.name for p in (simka_run / "stats").glob("*.txt"))
    assert "A.txt" in stats


def test_cli_fastq_path(ref_data, tmp_path):
    from mercat2_tpu.cli import main

    out = tmp_path / "fastq_out"
    rc = main([
        "-k", "4", "-i", str(ref_data / "Test_R1.fastq"), "-c", "1",
        "-o", str(out),
    ])
    assert rc == 0
    assert (out / "tsv_nucleotide" / "Test_R1_counts.tsv").exists()
    assert (out / "clean" / "Test_R1.fastq_qc.html").exists()
    assert (out / "clean" / "Test_R1_trim.fastq").exists()
    assert (out / "report" / "report.html").exists()


def test_cli_protein_with_orf_inputs(ref_data, tmp_path):
    from mercat2_tpu.cli import main

    out = tmp_path / "faa_out"
    rc = main([
        "-k", "3", "-i", str(ref_data / "5-genomes-faa" / "RW1_pro.faa"),
        "-o", str(out),
    ])
    assert rc == 0
    assert (out / "tsv_protein" / "RW1_pro_counts.tsv").exists()
    assert (out / "report" / "metrics-protein.tsv").exists()
    assert (out / "combined_protein.tsv").exists()


def test_output_dir_protection(tmp_path, ref_data):
    from mercat2_tpu.cli import main

    out = tmp_path / "exists"
    out.mkdir()
    with pytest.raises(SystemExit):
        main(["-k", "4", "-i", str(ref_data / "simka_test_data" / "A.fasta"),
              "-o", str(out)])


def test_pipeline_simka_multisample(tmp_path, ref_data):
    """The bundled simka_test_data read set (5 small multi-record FASTAs)
    through the full pipeline with PCA: one count table per sample, a
    combined matrix with 5 sample columns, and pca.tsv present."""
    from mercat2_tpu.pipeline import PipelineConfig, run_pipeline

    folder = ref_data / "simka_test_data"
    if not folder.exists():
        import pytest

        pytest.skip("simka fixture absent")
    out = tmp_path / "simka"
    run_pipeline(PipelineConfig(
        kmer=4, input_folder=str(folder), min_count=1, chunk_size_mb=10,
        pca=True, output=str(out),
    ))
    tsvs = sorted((out / "tsv_nucleotide").glob("*_counts.tsv"))
    assert len(tsvs) == 5, [t.name for t in tsvs]
    header = (out / "combined_Nucleotide.tsv").read_text().splitlines()[0]
    assert len(header.split("\t")) == 6  # k-mer + 5 samples
    assert (out / "pca_Nucleotide" / "pca.tsv").exists()
