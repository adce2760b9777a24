"""Probe device costs of sort-replacement primitives (real chip).

Times, for p=8.4M rows (the sustained per-segment size):
  sort1   - lax.sort of one u32 operand
  sort2k1 - lax.sort of (u32, u32) with num_keys=1
  sort2   - lax.sort of (u32, u32) with num_keys=2  (current count path)
  search  - jnp.searchsorted of p keys into a 16K sorted table
  amink   - approx_min_k selection of 128K survivors from p
  chain   - full current count chain per segment (reference point)

Run: python scripts/perf_sortprobe.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _force(out):
    """d2h a few bytes of every output leaf: the only reliable completion
    barrier over the tunnel (block_until_ready returns early there)."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    return [jax.device_get(leaf.ravel()[:1]) for leaf in leaves]


def bench(fn, *args, n=5):
    _force(fn(*args))  # compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from mercat2_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    p = 8 << 20
    rng = np.random.default_rng(0)
    h_host = rng.integers(0, 1 << 32, p, dtype=np.uint64).astype(np.uint32)
    w0_host = rng.integers(0, 1 << 10, p, dtype=np.uint64).astype(np.uint32)
    h = jax.device_put(h_host)
    w0 = jax.device_put(w0_host)
    tbl = jax.device_put(np.sort(h_host[: 1 << 14]))

    s1 = jax.jit(lambda a: jax.lax.sort(a))
    s2k1 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
    s2 = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=2))
    srch = jax.jit(lambda a, t: jnp.searchsorted(t, a))

    def amink(a):
        fpos = a.astype(jnp.float32)
        vals, _ = jax.lax.approx_min_k(fpos, 1 << 17, recall_target=1.0)
        return vals

    am = jax.jit(amink)

    null = jax.jit(lambda a: a[:8] + 1)
    gath = jax.jit(lambda t, a: jnp.take(t, a >> 18, fill_value=0))
    cmx = jax.jit(lambda a: jax.lax.cummax(a))
    scat = jax.jit(
        lambda a: jnp.zeros((1 << 22,), jnp.int32).at[
            (a >> 10).astype(jnp.int32)
        ].add(1, mode="drop")
    )

    print(f"p={p}")
    print(f"null:    {bench(null, h)*1e3:7.2f} ms  (barrier latency)")
    print(f"sort1:   {bench(s1, h)*1e3:7.2f} ms")
    print(f"sort2k1: {bench(s2k1, h, w0)*1e3:7.2f} ms")
    print(f"sort2:   {bench(s2, w0, h)*1e3:7.2f} ms")
    print(f"search:  {bench(srch, h, tbl)*1e3:7.2f} ms")
    print(f"gather:  {bench(gath, tbl, h)*1e3:7.2f} ms")
    print(f"cummax:  {bench(cmx, h)*1e3:7.2f} ms")
    print(f"scat22:  {bench(scat, h)*1e3:7.2f} ms")
    print(f"amink:   {bench(am, h)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
