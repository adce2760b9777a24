"""Profile one full-pipeline run: stage timestamps + RSS timeline.

Runs the CLI as a subprocess (fresh process, like bench._pipeline_wall),
samples the process tree's RSS every 0.25 s, and prints each stdout line
with a wall-clock offset so slow stages and memory peaks are attributable.

Usage: python scripts/profile_pipeline.py [extra cli args...]
"""
from __future__ import annotations

import subprocess
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def tree_rss_kb(pid: int) -> int:
    """RSS of pid + all descendants, in KB (via /proc)."""
    total = 0
    stack = [pid]
    while stack:
        p = stack.pop()
        try:
            with open(f"/proc/{p}/status") as f:
                for ln in f:
                    if ln.startswith("VmRSS:"):
                        total += int(ln.split()[1])
                        break
            with open(f"/proc/{p}/task/{p}/children") as f:
                stack += [int(c) for c in f.read().split()]
        except (FileNotFoundError, ProcessLookupError):
            pass
    return total


def main() -> None:
    args = [sys.executable, "-m", "mercat2_tpu.cli", "-k", "5",
            "-f", "/root/reference/data/5-genomes-fna_gz",
            "-o", "/tmp/mercat2_prof_pipeline", "-replace",
            "-pca", "-prod", "-fgs", "-s", "10"] + sys.argv[1:]
    t0 = time.perf_counter()
    p = subprocess.Popen(args, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
    peak = [0]
    samples: list[tuple[float, int]] = []

    def sampler() -> None:
        while p.poll() is None:
            kb = tree_rss_kb(p.pid)
            peak[0] = max(peak[0], kb)
            samples.append((time.perf_counter() - t0, kb))
            time.sleep(0.25)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    assert p.stdout is not None
    for line in p.stdout:
        dt = time.perf_counter() - t0
        rss = samples[-1][1] if samples else 0
        print(f"[{dt:8.2f}s {rss/1024:6.0f}MB] {line.rstrip()}", flush=True)
    p.wait()
    th.join(timeout=2)
    wall = time.perf_counter() - t0
    print(f"\n== wall {wall:.1f} s, peak tree RSS {peak[0]/1024:.0f} MB, "
          f"rc={p.returncode}")
    # RSS timeline, decimated
    step = max(1, len(samples) // 40)
    for t, kb in samples[::step]:
        print(f"  t={t:7.1f}s rss={kb/1024:6.0f}MB")


if __name__ == "__main__":
    main()
