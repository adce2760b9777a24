"""Weak-scaling evidence for the mesh-sharded count path (virtual CPU mesh).

Runs the distributed sort-count (parallel.count.sharded_count_sources) at
D = 1, 2, 4, 8 virtual devices with data volume PROPORTIONAL to D (weak
scaling), one subprocess per D (device count is fixed at backend init).
Reports wall time, the all_to_all routing volume (D * seg_cap words per
key column), seg_cap memory, and retry counts — the numbers NOTES_r4's
v5e-8 projection is built from.

CPU-mesh timings do NOT model TPU kernel speed (XLA:CPU sorts are
single-core per shard here); what they validate is the SCALING SHAPE:
per-device work and routing-buffer memory must stay ~flat as D grows with
the data. Run alone: python scripts/weak_scaling.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_CHILD = r"""
import json, os, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
import numpy as np
from mercat2_tpu.engine.codec import codec_for_bytes
from mercat2_tpu.engine.counter import KmerCounter, NumpySource
from mercat2_tpu.parallel import flat_mesh
from mercat2_tpu.parallel.count import sharded_count_sources

D = %(d)d
K = 21
MB_PER_DEV = %(mb)d
rng = np.random.default_rng(0)
alpha = np.frombuffer(b"ACGT", np.uint8)
codec = codec_for_bytes(alpha)
counter = KmerCounter(K, codec)

sources = []
total = 0
for i in range(D):  # one ~MB_PER_DEV file per device slot
    n = MB_PER_DEV << 20
    seq = rng.choice(alpha, size=n).astype(np.uint8)
    rec = np.repeat(np.arange(16), -(-n // 16))[:n]
    sources.append(NumpySource(seq, rec, codec))
    total += n

mesh = flat_mesh(D)
stats = {}
t0 = time.time()
tables = sharded_count_sources(counter, sources, 2, mesh, stats=stats)
warm = None
for rep in range(2):
    t1 = time.time()
    tables = sharded_count_sources(counter, sources, 2, mesh, stats=stats)
    warm = time.time() - t1
n_rows = sum(len(t) for t in tables)
print(json.dumps(dict(
    d=D, total_mb=total >> 20, cold_s=round(time.time() - t0, 2),
    warm_s=round(warm, 2), rows=n_rows, **stats,
)))
"""


def main() -> None:
    results = []
    for d in (1, 2, 4, 8):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={d}"
        ).strip()
        code = _CHILD % dict(repo=str(REPO), d=d, mb=16)
        p = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True,
            text=True, timeout=1200,
        )
        if p.returncode != 0:
            print(f"D={d} FAILED:\n{p.stderr[-2000:]}", file=sys.stderr)
            continue
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        # routing buffer: [D, seg_cap] uint32 per key word, per device
        words = 2 + 1  # k=21 2-bit: 2 payload words + counts
        rec["route_mb_per_dev"] = round(
            rec["d"] * rec["seg_cap"] * 4 * words / 2**20, 1
        )
        results.append(rec)
        print(json.dumps(rec), flush=True)

    out = REPO / "docs" / "WEAK_SCALING.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text("\n".join(json.dumps(r) for r in results) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
