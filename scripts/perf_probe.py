"""Device microbenchmarks for the k-mer engine (run on the real TPU).

Times each candidate op by chaining R dependent iterations inside ONE jit
and fetching a single tiny value — per NOTES_r1.md, wall time of a chained
jit with a tiny fetch is the only trustworthy microbenchmark on the
tunneled backend. Prints per-iteration device time estimates.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from mercat2_tpu.utils import enable_compilation_cache

enable_compilation_cache()

R = 8  # chained iterations per timed call


def timed(name, fn, *args):
    """jit fn chained R times; report (total - overhead)/R."""
    f = jax.jit(fn)
    out = f(*args)  # compile
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*args)
        # fetch a scalar to force completion through the tunnel
        np.asarray(jax.tree_util.tree_leaves(out)[0])[()]
        best = min(best, time.perf_counter() - t0)
    print(f"{name:55s} {best*1e3/R:9.3f} ms/iter  ({best*1e3:8.1f} ms total)")
    return best / R


def chain_sort_1w(x):
    def body(y, i):
        y = lax.sort(y ^ jnp.uint32(i + 1))
        return y, y[0]
    _, outs = lax.scan(body, x, jnp.arange(R))
    return outs[-1]


def chain_sort_2w(hi, lo):
    def body(carry, i):
        h, l = carry
        h2, l2 = lax.sort((h ^ jnp.uint32(i + 1), l), num_keys=2)
        return (h2, l2), h2[0]
    _, outs = lax.scan(body, (hi, lo), jnp.arange(R))
    return outs[-1]


def chain_sort_3w(hi, mid, lo):
    def body(carry, i):
        h, m, l = carry
        h2, m2, l2 = lax.sort((h ^ jnp.uint32(i + 1), m, l), num_keys=3)
        return (h2, m2, l2), h2[0]
    _, outs = lax.scan(body, (hi, mid, lo), jnp.arange(R))
    return outs[-1]


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)

    sizes = [1 << 20, 2 << 20, 4 << 20, 8 << 20, 16 << 20, 21 * (1 << 20)]
    for n in sizes:
        x = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        t = timed(f"sort 1-word u32          n={n>>20:3d}M", chain_sort_1w, x)
        print(f"{'':55s} {t*1e9/n:9.3f} ns/elem")
    for n in sizes:
        hi = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        lo = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        t = timed(f"sort 2-word u32          n={n>>20:3d}M", chain_sort_2w, hi, lo)
        print(f"{'':55s} {t*1e9/n:9.3f} ns/elem")
    n = 8 << 20
    hi = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    mid = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    timed(f"sort 3-word u32          n={n>>20:3d}M", chain_sort_3w, hi, mid, lo)

    # tiled local sort: T tiles of n/T inside one jit (map over leading dim
    # is NOT vmap-batched sort; use a python loop over static slices)
    n = 21 * (1 << 20)
    hi = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
    for tiles in (8, 16, 32):
        tile = n // tiles
        def tiled(h, l, tiles=tiles, tile=tile):
            def body(carry, i):
                h, l = carry
                outs = []
                for t in range(tiles):
                    hs = lax.dynamic_slice_in_dim(h, t * tile, tile)
                    ls = lax.dynamic_slice_in_dim(l, t * tile, tile)
                    outs.append(lax.sort((hs ^ jnp.uint32(i + 1), ls), num_keys=2))
                h2 = jnp.concatenate([o[0] for o in outs])
                l2 = jnp.concatenate([o[1] for o in outs])
                return (h2, l2), h2[0]
            _, outs = lax.scan(body, (h, l), jnp.arange(R))
            return outs[-1]
        timed(f"tiled sort 2w {tiles:2d}x{tile>>20}M      n=21M", tiled, hi, lo)

    # pack + validity at k=21 over a 21M stream (current XLA path)
    from mercat2_tpu.ops.kmer_pack import pack_kmer_words, window_validity
    codes = jnp.asarray(rng.integers(0, 4, size=n + 20, dtype=np.uint8))

    def packval(c):
        def body(c, i):
            c = c ^ jnp.uint8(0)  # keep dependency
            valid = window_validity(c, 21, 4)
            w = pack_kmer_words(c.astype(jnp.uint32), 21, 2)
            s = w[0].sum() + w[1].sum() + valid.sum()
            return c, s
        _, outs = lax.scan(body, c, jnp.arange(R))
        return outs[-1]
    timed("XLA pack+validity k=21   n=21M", packval, codes)


if __name__ == "__main__":
    main()
