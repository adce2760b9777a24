"""Protein metric golden parity: run the reference's committed FGS protein
files through our vectorized pI/MW/hydropathy and compare with the golden
metrics TSV values."""

import pytest

from mercat2_tpu.metrics.protein import protein_metrics_table


def _golden_rows(path):
    rows = {}
    with open(path) as f:
        f.readline()
        for line in f:
            cols = line.rstrip("\n").split("\t")
            if len(cols) == 6:
                rows[cols[0]] = cols
    return rows


def test_metrics_golden_parity(golden_results, tmp_path):
    faa = golden_results / "fna-5genomes-10" / "fgs" / "RW1.faa.gz"
    golden_tsv = golden_results / "fna-5genomes-10" / "report" / "metrics-fgs.tsv"
    if not faa.exists():
        pytest.skip("golden fgs faa missing")
    golden = _golden_rows(golden_tsv)

    tbl = protein_metrics_table(faa)
    checked = 0
    for i, full in enumerate(tbl["full_name"]):
        if full not in golden:
            continue
        _, _, length, pi, mw, hydro = golden[full]
        assert str(float(tbl["length"][i])) == length, full
        assert str(tbl["pi"][i]) == pi, f"pI mismatch for {full}"
        assert str(tbl["mw"][i]) == mw, f"MW mismatch for {full}"
        assert str(tbl["hydro"][i]) == hydro, f"Hydro mismatch for {full}"
        checked += 1
    assert checked > 100  # RW1 contributes hundreds of proteins


def test_empty_sequence_skipped(tmp_path):
    p = tmp_path / "x.faa"
    p.write_text(">empty\n\n>ok\nMKV\n")
    tbl = protein_metrics_table(p)
    assert tbl["full_name"] == ["ok"]


def test_stop_codon_stripped_trailing_only(tmp_path):
    # reference rstrip('*')s each line; interior '*' is kept
    p = tmp_path / "x.faa"
    p.write_text(">a\nMKV*\n")
    tbl = protein_metrics_table(p)
    assert tbl["length"][0] == 3
