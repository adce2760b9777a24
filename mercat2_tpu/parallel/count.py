"""Sharded k-mer counting over a ('data', 'bins') device mesh.

Stream sharding uses a (k-1)-symbol halo: shard d covers window start
positions [d*L, (d+1)*L) of the global stream and carries the next k-1
symbols so every window is counted exactly once and none straddles a shard
boundary invisibly. This is the TPU equivalent of the reference's Chunker
record-boundary splitting (/root/reference/lib/mercat2_Chunker.py:39-59) —
but exact, because the halo preserves cross-cut windows while the Chunker
relies on record boundaries.

Two reduction strategies:

- dense (small k): per-device histogram, ``psum_scatter`` over ``bins`` then
  ``psum`` over ``data`` — each device ends up owning a contiguous bin range
  of the fully-merged histogram. Replaces the reference's driver dict merge
  (/root/reference/bin/mercat2.py:121-127).
- sorted (large k): per-device rolling pack + local sort, ``all_gather`` +
  global re-sort. Deterministic merge; the min-count filter is applied by
  the caller AFTER this global merge (or per-chunk in compat mode).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from mercat2_tpu.ops.dense_hist import dense_kmer_histogram
from mercat2_tpu.ops.kmer_pack import (
    key_words_for,
    pack_kmer_words,
    window_validity,
)

__all__ = ["shard_stream", "sharded_dense_histogram", "sharded_sorted_kmer_keys"]

_ONES32 = jnp.uint32(0xFFFFFFFF)


def shard_stream(stream: np.ndarray, k: int, n_shards: int, sentinel: int) -> np.ndarray:
    """uint8[N] stream -> uint8[n_shards, L + k - 1] haloed shard matrix.

    L = ceil(N / n_shards) window starts per shard; the trailing k-1 symbols
    of each row replicate the head of the next shard. Tail rows are sentinel
    padded, so their surplus windows are invalid and drop out downstream.
    """
    n = int(stream.shape[0])
    L = -(-max(n, 1) // n_shards)
    total = n_shards * L + k - 1
    padded = np.full(total, sentinel, np.uint8)
    padded[:n] = stream
    idx = np.arange(L + k - 1)[None, :] + (np.arange(n_shards) * L)[:, None]
    return padded[idx]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.jit, static_argnames=("k", "alphabet_size", "mesh"), donate_argnums=(0,)
)
def _dense_hist_sharded(shards, *, k: int, alphabet_size: int, mesh: Mesh):
    data_sz = mesh.shape["data"]
    bins_sz = mesh.shape["bins"]
    nbins = alphabet_size**k
    nbins_pad = _round_up(nbins, bins_sz)

    def step(local):  # local: uint8[1, 1, row]
        hist = dense_kmer_histogram(local[0, 0], k=k, alphabet_size=alphabet_size)
        hist = jnp.pad(hist, (0, nbins_pad - nbins))
        # scatter bins intra-axis first (cheap), then sum partials over data
        shard = jax.lax.psum_scatter(hist, "bins", scatter_dimension=0, tiled=True)
        return jax.lax.psum(shard, "data")

    return shard_map(
        step,
        mesh=mesh,
        in_specs=P("data", "bins", None),
        out_specs=P("bins"),
    )(shards)


def sharded_dense_histogram(
    shards: np.ndarray, *, k: int, alphabet_size: int, mesh: Mesh
) -> np.ndarray:
    """Fully-merged dense histogram (int64 on host) from haloed shards.

    ``shards`` must have ``mesh.size`` rows (see :func:`shard_stream`);
    they are laid out row-major over the (data, bins) mesh grid.
    """
    data_sz = mesh.shape["data"]
    bins_sz = mesh.shape["bins"]
    assert shards.shape[0] == data_sz * bins_sz, (shards.shape, mesh.shape)
    arr = shards.reshape(data_sz, bins_sz, shards.shape[1])
    sharding = NamedSharding(mesh, P("data", "bins", None))
    arr = jax.device_put(jnp.asarray(arr), sharding)
    hist = _dense_hist_sharded(arr, k=k, alphabet_size=alphabet_size, mesh=mesh)
    nbins = alphabet_size**k
    return np.asarray(hist)[:nbins].astype(np.int64)


@functools.partial(jax.jit, static_argnames=("k", "bits", "alphabet_size", "mesh"))
def _sorted_keys_sharded(shards, *, k: int, bits: int, alphabet_size: int, mesh: Mesh):
    total_words, tiebreak = key_words_for(k, bits)

    def step(local):  # uint8[1, 1, row]
        row = local[0, 0]
        valid = window_validity(row, k, alphabet_size)
        payload = pack_kmer_words(row.astype(jnp.uint32), k, bits)
        keyed = [jnp.where(valid, w, _ONES32) for w in payload]
        if tiebreak:
            keyed.append(jnp.where(valid, jnp.uint32(0), _ONES32))
        local_sorted = jax.lax.sort(tuple(keyed), num_keys=total_words)
        # deterministic global merge: gather every device's sorted run and
        # re-sort (XLA lowers to a single fused sort over the gathered keys)
        gathered = [
            jax.lax.all_gather(w, ("data", "bins"), tiled=True) for w in local_sorted
        ]
        final = jax.lax.sort(tuple(gathered), num_keys=total_words)
        n_valid = jax.lax.psum(jnp.sum(valid, dtype=jnp.int32), ("data", "bins"))
        return tuple(f[None] for f in final) + (n_valid[None],)

    out = shard_map(
        step,
        mesh=mesh,
        in_specs=P(("data", "bins"), None),
        out_specs=tuple([P(("data", "bins"), None)] * total_words)
        + (P(("data", "bins")),),
    )(shards.reshape(mesh.size, 1, shards.shape[-1]))
    words, n_valid = out[:-1], out[-1]
    # every row holds the same replicated result; take row 0
    return tuple(w[0] for w in words), n_valid[0]


def sharded_sorted_kmer_keys(
    shards: np.ndarray, *, k: int, bits: int, alphabet_size: int, mesh: Mesh
):
    """Globally sorted packed key words from haloed shards (+ valid count).

    Output matches single-device ``ops.kmer_pack.sorted_kmer_keys`` on the
    unsharded stream: uint32 word columns sorted lexicographically with
    invalid windows (all-ones keys) at the end.
    """
    arr = jax.device_put(
        jnp.asarray(shards.reshape(mesh.size, 1, shards.shape[-1])),
        NamedSharding(mesh, P(("data", "bins"), None, None)),
    )
    words, n_valid = _sorted_keys_sharded(
        arr, k=k, bits=bits, alphabet_size=alphabet_size, mesh=mesh
    )
    return [np.asarray(w) for w in words], int(n_valid)
