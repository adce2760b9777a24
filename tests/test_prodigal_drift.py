"""Pin the measured native-ORF-caller drift vs golden Prodigal (RW1).

docs/PRODIGAL_DRIFT.md records the full 5-genome evaluation
(scripts/prodigal_drift.py); this test re-derives the headline invariants
on the smallest genome so regressions in the native caller are caught:

- stop recall 1.0: every golden Prodigal gene's stop boundary is among
  the native stop-to-stop ORFs (supersede relationship),
- the over-call factor stays in the measured band (the native caller has
  no gene model; a sudden change either way means its rules drifted).
"""

import gzip
from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path("/root/reference/results/2023-11-29/fna-5genomes-10")
DATA = Path("/root/reference/data/5-genomes-fna_gz")


def _records(path):
    op = gzip.open if str(path).endswith(".gz") else open
    with op(path, "rt") as f:
        header, seq = None, []
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if header is not None:
                    yield header, "".join(seq)
                header, seq = line[1:], []
            elif line:
                seq.append(line)
        if header is not None:
            yield header, "".join(seq)


@pytest.mark.skipif(not GOLDEN.exists(), reason="golden tree absent")
def test_native_caller_supersets_prodigal_stops(tmp_path):
    from mercat2_tpu.io.clean import remove_n
    from mercat2_tpu.orf.native import find_orfs

    gold_stops = set()
    n_gold = 0
    for header, _seq in _records(GOLDEN / "prodigal" / "RW1_pro.faa"):
        parts = [p.strip() for p in header.split("#")]
        seqid = parts[0].rsplit("_", 1)[0]
        start, end, strand = int(parts[1]), int(parts[2]), int(parts[3])
        gold_stops.add((seqid, end if strand > 0 else start, strand))
        n_gold += 1

    cleaned, _ = remove_n(DATA / "RW1.fna.gz", tmp_path)
    native_stops = set()
    n_native = 0
    for header, seq in _records(cleaned):
        seqid = header.split()[0]
        sb = np.frombuffer(seq.encode(), np.uint8)
        for o in find_orfs(sb):
            stop = o["end"] if o["strand"] > 0 else o["start"]
            native_stops.add((seqid, stop, o["strand"]))
            n_native += 1

    missed = gold_stops - native_stops
    assert not missed, f"{len(missed)} golden stops missed: {list(missed)[:5]}"
    # measured over-call band (docs/PRODIGAL_DRIFT.md: 1868 vs 284 genes)
    assert n_gold == 284
    assert 3 <= n_native / n_gold <= 12, (n_native, n_gold)
