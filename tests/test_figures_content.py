"""Figure CONTENT regression tests against golden combined TSVs.

Round-1 coverage only checked that report HTML existed; these tests pin
the actual selection/tie-breaking/label logic of the figures layer
(reference logic: /root/reference/lib/mercat2_figures.py:40-88, 206-352)
using the committed golden combined tables as input.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from mercat2_tpu.report import figures as figs

GOLDEN = Path("/root/reference/results/2023-11-29/fna-5genomes-10")


def _expected_top5(tsv):
    with open(tsv) as r:
        samples = r.readline().rstrip("\n").split("\t")[1:]
        kmers, rows, means = [], [], []
        for line in r:
            cols = line.rstrip("\n").split("\t")
            kmers.append(cols[0])
            rows.append([int(x) for x in cols[1:]])
            means.append(sum(int(x) for x in cols[1:]) / (len(cols) - 1))
    order = sorted(range(len(kmers)), key=lambda i: (-means[i], i))[:5]
    return samples, kmers, rows, order


@pytest.fixture(scope="module")
def combined():
    tsv = GOLDEN / "combined_Nucleotide.tsv"
    if not tsv.exists():
        pytest.skip("golden combined TSV missing")
    return tsv


def test_kmer_summary_top5_selection_and_labels(combined):
    samples, kmers, rows, order = _expected_top5(combined)
    fig, fig_table = figs.kmer_summary(combined)

    # label table: column 0 = k-mer-1..5, column 1 = the top-5 kmers in
    # alphabetical order (pd.Categorical code semantics in the reference)
    cells = fig_table.data[0]["cells"]["values"]
    expect_kmers = sorted(kmers[i] for i in order)
    assert cells[0] == [f"k-mer-{j + 1}" for j in range(5)]
    assert cells[1] == expect_kmers

    # facet rows: one per selected kmer, bars sorted by descending count
    facets = fig.data
    chosen = sorted(order, key=lambda i: kmers[i])
    assert len(facets) == 5 * len(samples)
    for j, i in enumerate(chosen):
        row_traces = facets[j * len(samples) : (j + 1) * len(samples)]
        got_counts = [t["y"][0] for t in row_traces]
        assert got_counts == sorted(rows[i], reverse=True)
        got_samples = {t["x"][0] for t in row_traces}
        assert got_samples == set(samples)


def test_kmer_summary_tie_break_earliest_row(tmp_path):
    """Equal means: the reference's strict-> comparison keeps the EARLIER
    row (lib/mercat2_figures.py top-5 maintenance)."""
    tsv = tmp_path / "combined_t.tsv"
    lines = ["kmer\tS1\tS2"]
    # 6 kmers, all mean 10 except the last two with mean 20; ties at 10
    # must keep the first three listed, not later ones
    lines += [f"AA{c}\t10\t10" for c in "ABCD"]  # means all 10
    lines += ["ZZY\t20\t20", "ZZZ\t20\t20"]
    tsv.write_text("\n".join(lines) + "\n")
    _, fig_table = figs.kmer_summary(tsv)
    cells = fig_table.data[0]["cells"]["values"]
    # top-5 = ZZY, ZZZ (mean 20) + first three ties AAA, AAB, AAC
    assert cells[1] == ["AAA", "AAB", "AAC", "ZZY", "ZZZ"]


def test_pca_components_match_golden(tmp_path, monkeypatch):
    """PCA on the golden transposed table reproduces the golden pca.tsv
    component magnitudes (signs are arbitrary per component) and the
    variance-percentage axis labels."""
    sklearn = pytest.importorskip("sklearn")  # noqa: F841
    tsv_t = GOLDEN / "combined_Nucleotide_T.tsv"
    golden_pca = GOLDEN / "pca_Nucleotide" / "pca.tsv"
    if not (tsv_t.exists() and golden_pca.exists()):
        pytest.skip("golden PCA inputs missing")
    fig3d, _fig2d = figs.plot_pca(tsv_t, tmp_path / "pca")

    got = np.loadtxt(tmp_path / "pca" / "pca.tsv", skiprows=1,
                     usecols=(1, 2, 3))
    want_rows = {}
    with open(golden_pca) as r:
        next(r)
        for line in r:
            c = line.rstrip("\n").split("\t")
            want_rows[c[0]] = [float(x) for x in c[1:4]]
    got_names = [line.split("\t")[0] for line in
                 (tmp_path / "pca" / "pca.tsv").read_text().splitlines()[1:]]
    want = np.array([want_rows[n] for n in got_names])
    # same subspace: compare per-component absolute values
    np.testing.assert_allclose(np.abs(got), np.abs(want), rtol=1e-6)

    # axis labels carry explained-variance percentages (ref :318-330)
    scene = fig3d.layout.get("scene", {})
    labels = [scene.get(ax, {}).get("title", {}).get("text", "")
              for ax in ("xaxis", "yaxis", "zaxis")]
    assert all("PC" in t and "%" in t for t in labels), labels


def test_gc_plot_values():
    fig = figs.gc_plot_sample({"A": 51.2, "B": 47.9})
    data = fig.data[0]
    assert list(data["x"]) == ["A", "B"]
    assert list(data["y"]) == [51.2, 47.9]
