"""Decompose the SUSTAINED k=21 bench config (194.5 Mbp) on the real chip.

Phases measured independently (each best-of-N, warm):
  parse    — threaded gzip+parse of the staged files (host only)
  build    — packed group assembly (host only)
  h2d      — device_put of every group's transport buffers, blocked
  compute  — all count programs enqueued over PRE-STAGED device inputs,
             blocked on the last outputs (pure device pipeline)
  fetch    — n_out syncs + speculative prefix d2h for all groups
  e2e      — the real overlapped path (what bench.py times)

Run:  python scripts/perf_sustained.py [k] [runs]
"""

from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 21
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
MIN_COUNT = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from mercat2_tpu.engine.codec import codec_for_alphabet
    from mercat2_tpu.engine.counter import KmerCounter, fetch_tables
    from mercat2_tpu.io.native import open_fasta_native
    from mercat2_tpu.ops.finalize import count_kmers_packed_segments
    from mercat2_tpu.utils import enable_compilation_cache

    import bench

    enable_compilation_cache()
    files = bench._stage_sustained()
    print(f"files={len(files)} k={K}")

    # -- parse ---------------------------------------------------------------
    for run in range(RUNS + 1):
        t0 = time.perf_counter()
        pool = ThreadPoolExecutor(max_workers=min(16, len(files)))
        sources = list(pool.map(open_fasta_native, files))
        t_parse = time.perf_counter() - t0
        if run:
            print(f"parse: {t_parse:.3f}s")
        alpha = np.zeros(0, np.uint8)
        for s in sources:
            alpha = np.union1d(alpha, s.alphabet())
        counter = KmerCounter(K, codec_for_alphabet(alpha.astype(np.uint8)))

        # group exactly like dispatch_packed_sources
        lens = [s.packed_len(1) for s in sources]
        groups, cur, cur_sym = [], [], 0
        for i, length in enumerate(lens):
            if cur and cur_sym + length > counter._SEG_TARGET:
                groups.append(cur)
                cur, cur_sym = [], 0
            cur.append(i)
            cur_sym += length
        if cur:
            groups.append(cur)

        # -- build -----------------------------------------------------------
        t0 = time.perf_counter()
        built = [
            counter.build_packed_group_segmented([sources[i] for i in g])
            for g in groups
        ]
        t_build = time.perf_counter() - t0
        if run:
            print(f"build: {t_build:.3f}s  groups={len(groups)}")

        # per-group static args
        per = 32 // counter.codec.bits
        launches = []
        for (group, seg_words) in built:
            caps = []
            for w0, w1 in seg_words:
                p = (w1 - w0) * per - K + 1
                cap = min(p, counter._keyspace())
                if MIN_COUNT > 1:
                    cap = min(cap, 1 << 14)
                caps.append(cap)
            launches.append((group, seg_words, tuple(caps)))

        # -- h2d only ----------------------------------------------------------
        t0 = time.perf_counter()
        staged = []
        for (group, seg_words, caps) in launches:
            staged.append((
                jax.device_put(group.words),
                jax.device_put(group.gap_begin),
                jax.device_put(group.gap_end),
                seg_words, caps,
            ))
        for s in staged:
            s[0].block_until_ready()
        t_h2d = time.perf_counter() - t0
        nbytes = sum(g.words.nbytes for g, _, _ in launches)
        if run:
            print(f"h2d:   {t_h2d:.3f}s  ({nbytes/1e6:.1f} MB)")

        # -- compute only (pre-staged inputs) ---------------------------------
        t0 = time.perf_counter()
        outs = []
        for (dw, dgb, dge, seg_words, caps) in staged:
            flat = count_kmers_packed_segments(
                dw, dgb, dge, jnp.int32(MIN_COUNT),
                k=K, bits=counter.codec.bits,
                alphabet_size=counter.codec.size,
                seg_words=seg_words, caps=caps,
            )
            outs.append(flat)
        t_enq = time.perf_counter() - t0
        for flat in outs:
            flat[-1].block_until_ready()
        t_compute = time.perf_counter() - t0
        if run:
            print(f"compute: {t_compute:.3f}s (enqueue {t_enq:.3f}s) "
                  f"= {t_compute/len(staged)*1e3:.1f} ms/group")

        # -- fetch (n_out sync + spec prefix d2h) ------------------------------
        t0 = time.perf_counter()
        got = jax.device_get([flat[-1] for flat in outs])
        t_fetch = time.perf_counter() - t0
        if run:
            print(f"fetch n_outs: {t_fetch:.3f}s")

        for s in sources:
            s.close()
        pool.shutdown(wait=False)

    # -- e2e real path ---------------------------------------------------------
    for run in range(2):
        total, n, dt = bench._count_cold(files, K)
        print(f"e2e: {dt:.3f}s  ({total/dt/1e6:.1f} Mbases/s) kmers={n}")


if __name__ == "__main__":
    main()
