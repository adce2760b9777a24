"""Dense k-mer histogram for small keyspaces (S**k bins).

Used when the full keyspace fits comfortably in HBM (e.g. nucleotide k<=10,
protein k<=4). The bin index is the base-S big-endian value of the window's
codes, so bin order == lexicographic k-mer order and decoding a bin index
back to a string is trivial.

This is also the path used by the multi-chip data-parallel reduction: each
device histograms its shard and partial histograms merge with a single
``psum`` over the mesh (see ``mercat2_tpu.parallel``), replacing the
reference's driver-side dict merge (/root/reference/bin/mercat2.py:121-127).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mercat2_tpu.ops.kmer_pack import window_validity

__all__ = ["dense_kmer_histogram", "dense_kmer_index"]


def dense_kmer_index(codes_u8: jax.Array, k: int, alphabet_size: int) -> jax.Array:
    """int32[N-k+1] base-S window index (garbage where the window is invalid)."""
    n = codes_u8.shape[0]
    p = n - k + 1
    codes = codes_u8.astype(jnp.int32)
    idx = jnp.zeros((p,), jnp.int32)
    s = jnp.int32(alphabet_size)
    for j in range(k):
        c = jax.lax.slice_in_dim(codes, j, j + p)
        # separator values (>= S) would corrupt the index; clamp them --
        # those windows are masked out by validity anyway.
        idx = idx * s + jnp.minimum(c, s - 1)
    return idx


@functools.partial(jax.jit, static_argnames=("k", "alphabet_size"))
def dense_kmer_histogram(codes_u8: jax.Array, *, k: int, alphabet_size: int) -> jax.Array:
    """int32[S**k] histogram of valid windows."""
    valid = window_validity(codes_u8, k, alphabet_size)
    idx = dense_kmer_index(codes_u8, k, alphabet_size)
    nbins = alphabet_size**k
    hist = jnp.zeros((nbins,), jnp.int32)
    return hist.at[idx].add(valid.astype(jnp.int32))
