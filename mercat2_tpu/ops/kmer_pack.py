"""Device-side k-mer extraction: rolling multiword bit-pack + lexicographic sort.

This replaces the reference's Python dict hot loop
(/root/reference/lib/mercat2_kmers.py:56-69) with a TPU-native pipeline:

    uint8 code stream (separator-delimited records, sentinel-padded)
      -> rolling b-bit pack into ceil(k*b/32) uint32 key words per window
      -> window validity mask (no window may contain a record separator,
         mirroring the reference's per-record ``seq`` reset at
         /root/reference/lib/mercat2_kmers.py:52-61)
      -> invalid windows forced to the all-ones key
      -> multi-key ``lax.sort`` (lexicographic over the key words)

The sorted key stream is then run-length encoded (on host for now; see
``mercat2_tpu.engine.counter``) to produce (kmer, count) pairs already in
the reference's output order, because codes are assigned in ascending byte
order (see ``mercat2_tpu.engine.codec``).

Everything here is static-shape and jit-friendly: ``k``, ``bits`` and the
word count are Python-level constants baked into the compiled kernel; the
stream length is padded to a size bucket by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["pack_kmer_words", "window_validity", "sorted_kmer_keys", "key_words_for"]

_ONES32 = jnp.uint32(0xFFFFFFFF)


def key_words_for(k: int, bits: int) -> tuple[int, bool]:
    """(total sort-key words, has_tiebreak_word).

    The payload is ``ceil(k*bits/32)`` words. When ``k*bits`` exactly fills
    the payload, an extra tie-break word (0 = valid, ~0 = invalid) is
    appended so the all-ones invalid marker cannot collide with a real key
    (e.g. ``T``*16 under 2-bit DNA).
    """
    payload = max(1, -(-(k * bits) // 32))
    tiebreak = k * bits == 32 * payload
    return payload + int(tiebreak), tiebreak


def pack_kmer_words(codes: jax.Array, k: int, bits: int) -> list[jax.Array]:
    """Rolling pack: for each window start i, big-endian pack codes[i:i+k].

    Args:
        codes: uint32[N] symbol codes (values at separator positions are
            arbitrary; they get masked to ``bits`` bits and discarded by the
            validity mask downstream).
        k: window length (static).
        bits: bits per symbol (static, 1..8).

    Returns:
        List of ``payload`` uint32[N-k+1] words, most-significant first.
        Symbol 0 of the window occupies the most-significant bits, so
        numeric order of the word tuple == lexicographic order of windows.
    """
    n = codes.shape[0]
    p = n - k + 1
    payload = max(1, -(-(k * bits) // 32))
    mask_b = jnp.uint32((1 << bits) - 1)

    words = [jnp.zeros((p,), jnp.uint32) for _ in range(payload)]
    for j in range(k):
        c = jax.lax.slice_in_dim(codes, j, j + p) & mask_b
        if payload == 1:
            words[0] = (words[0] << bits) | c
        else:
            shifted = [
                (words[w] << bits) | (words[w + 1] >> (32 - bits))
                for w in range(payload - 1)
            ]
            shifted.append((words[payload - 1] << bits) | c)
            words = shifted
    return words


def window_validity(codes_u8: jax.Array, k: int, alphabet_size: int) -> jax.Array:
    """bool[N-k+1]: True where codes[i:i+k] contains no separator/pad.

    Separators are stored out-of-band as values ``>= alphabet_size`` in the
    uint8 stream (see codec docs).
    """
    n = codes_u8.shape[0]
    p = n - k + 1
    sep = (codes_u8 >= jnp.uint8(alphabet_size)).astype(jnp.int32)
    ecs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(sep)])
    return (ecs[k : k + p] - ecs[:p]) == 0


@functools.partial(jax.jit, static_argnames=("k", "bits", "alphabet_size"))
def sorted_kmer_keys(codes_u8: jax.Array, *, k: int, bits: int, alphabet_size: int):
    """Full device pipeline: codes -> sorted key words + valid-window count.

    Args:
        codes_u8: uint8[N] stream; symbol codes in [0, alphabet_size),
            separators/padding >= alphabet_size. N is the padded bucket size.

    Returns:
        (words, n_valid): ``words`` is a tuple of uint32[N-k+1] sorted
        lexicographically (invalid windows hold the all-ones key and sort
        last); ``n_valid`` is the int32 count of valid windows, i.e. the
        prefix of ``words`` holding real k-mers.
    """
    valid = window_validity(codes_u8, k, alphabet_size)
    payload = pack_kmer_words(codes_u8.astype(jnp.uint32), k, bits)
    total_words, tiebreak = key_words_for(k, bits)

    keyed = [jnp.where(valid, w, _ONES32) for w in payload]
    if tiebreak:
        keyed.append(jnp.where(valid, jnp.uint32(0), _ONES32))
    assert len(keyed) == total_words

    sorted_words = jax.lax.sort(tuple(keyed), num_keys=total_words)
    n_valid = jnp.sum(valid, dtype=jnp.int32)
    return sorted_words, n_valid
