"""Fused device-side k-mer count finalization.

The first engine iteration sorted packed keys on device and shipped the
FULL sorted key stream to the host for run-length encoding — ~12 bytes per
window over the wire. On the tunneled single-chip setup the d2h link
(~30 MB/s) made that the pipeline bottleneck (2.1 s/genome), with host RLE
adding another ~1 s. This module moves the whole reduction on device:

    pack -> multiword sort -> boundary detection -> run lengths (cummin
    scan) -> min-count filter -> compaction (position sort + gather)

and returns only the compacted unique (key, count) table, capped at a
static ``cap`` (a few MB instead of tens). ``min_count`` is a traced
scalar so changing it never recompiles; ``cap`` overflow is detected via
the returned ``n_out`` and retried by the caller with a bigger cap.

This replaces the reference's per-file dict + Counter filter
(/root/reference/lib/mercat2_kmers.py:56-76) with an all-device pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mercat2_tpu.ops.kmer_pack import (
    key_words_for,
    pack_kmer_words,
    window_validity,
)

__all__ = ["count_kmers_device", "dense_count_device"]

_ONES32 = jnp.uint32(0xFFFFFFFF)
_I32MAX = jnp.int32(2**31 - 1)


@functools.partial(
    jax.jit, static_argnames=("k", "bits", "alphabet_size", "cap")
)
def count_kmers_device(
    codes_u8: jax.Array,
    min_count: jax.Array,
    *,
    k: int,
    bits: int,
    alphabet_size: int,
    cap: int,
):
    """uint8[N] code stream -> compacted sorted unique-kmer table.

    Args:
        codes_u8: sentinel-delimited padded code stream (see engine.codec).
        min_count: int32 scalar; keep kmers with count >= min_count.
        cap: static output capacity (table rows). If the true number of
            surviving kmers exceeds cap, ``n_out`` reports it and the
            leading cap rows are still the lexicographically first ones.

    Returns:
        (words, counts, n_out):
        words: tuple of uint32[cap] payload columns (big-endian packed,
            lexicographically sorted).
        counts: int32[cap] occurrence counts.
        n_out: int32 -- number of surviving kmers (may exceed cap).
    """
    n = codes_u8.shape[0]
    p = n - k + 1

    valid = window_validity(codes_u8, k, alphabet_size)
    payload = pack_kmer_words(codes_u8.astype(jnp.uint32), k, bits)
    total_words, tiebreak = key_words_for(k, bits)
    keyed = [jnp.where(valid, w, _ONES32) for w in payload]
    if tiebreak:
        keyed.append(jnp.where(valid, jnp.uint32(0), _ONES32))
    words = jax.lax.sort(tuple(keyed), num_keys=total_words)
    n_valid = jnp.sum(valid, dtype=jnp.int32)

    payload_words = total_words - int(tiebreak)
    sorted_payload = words[:payload_words]

    pos = jax.lax.broadcasted_iota(jnp.int32, (p,), 0)
    in_valid = pos < n_valid

    # run boundaries over the sorted keys (first element is a boundary)
    boundary = jnp.zeros((p,), bool).at[0].set(True)
    for w in sorted_payload:
        boundary = boundary | jnp.concatenate(
            [jnp.ones((1,), bool), w[1:] != w[:-1]]
        )
    boundary = boundary & in_valid

    # run length of the run starting at each boundary = next boundary - pos
    # (next-boundary-position via a reverse cummin over boundary positions)
    bpos = jnp.where(boundary, pos, _I32MAX)
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(bpos)))  # inclusive: >= own pos
    # exclusive "next boundary strictly after i": shift left by one
    nxt_excl = jnp.concatenate([nxt[1:], jnp.full((1,), _I32MAX, jnp.int32)])
    run_len = jnp.minimum(nxt_excl, n_valid) - pos  # valid at boundaries

    keep = boundary & (run_len >= jnp.asarray(min_count, jnp.int32))
    n_out = jnp.sum(keep, dtype=jnp.int32)

    # compaction: select the positions of kept boundaries, take first cap,
    # gather. approx_min_k at recall 1.0 is ~2x cheaper than a full sort on
    # TPU; float32 position keys are exact below 2**24, and the padded filler
    # 2**24 always sorts after every real position.
    if p <= (1 << 24) and cap * 4 <= p:
        fpos = jnp.where(keep, pos.astype(jnp.float32), jnp.float32(1 << 24))
        vals, _ = jax.lax.approx_min_k(fpos, cap, recall_target=1.0)
        kept_pos = jax.lax.sort(vals).astype(jnp.int32)
    else:
        kept_pos = jnp.where(keep, pos, _I32MAX)
        kept_pos = jax.lax.sort(kept_pos)[:cap]
    safe = jnp.minimum(kept_pos, p - 1)
    out_words = tuple(w[safe] for w in sorted_payload)
    out_counts = jnp.where(kept_pos < p, run_len[safe], 0)
    return out_words, out_counts, n_out


@functools.partial(jax.jit, static_argnames=("k", "alphabet_size"))
def dense_count_device(codes_u8: jax.Array, *, k: int, alphabet_size: int):
    """int32[S**k] full histogram (small keyspaces; bin == lexicographic rank).

    The host applies the min-count filter and decodes nonzero bins; the
    transfer is S**k * 4 bytes (e.g. 62 KB for protein k=3), far below any
    sort-path output.
    """
    from mercat2_tpu.ops.dense_hist import dense_kmer_index

    valid = window_validity(codes_u8, k, alphabet_size)
    idx = dense_kmer_index(codes_u8, k, alphabet_size)
    nbins = alphabet_size**k
    return jnp.zeros((nbins,), jnp.int32).at[
        jnp.where(valid, idx, nbins)
    ].add(1, mode="drop")
