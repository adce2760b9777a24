"""Bit-parity of the Pallas hot-path kernels vs their XLA references.

Runs in Pallas interpreter mode on CPU (tests/conftest.py forces
JAX_PLATFORMS=cpu); the engine only routes to the compiled kernels on real
TPU backends, where scripts/perf_pallas.py re-validates parity compiled.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mercat2_tpu.ops.finalize import finalize_sorted
from mercat2_tpu.ops.kmer_pack import (
    key_words_for, pack_kmer_words, window_validity,
)
from mercat2_tpu.ops.pallas_finalize import (
    _FIN_TILE, build_keys_pallas, finalize_sorted_pallas,
)

_ONES = np.uint32(0xFFFFFFFF)


def _sorted_columns(rng, p, n_words, n_valid, max_run):
    """Synthesize sorted key columns with runs, invalid tail all-ones."""
    n_runs = max(1, n_valid // max(1, (max_run // 2)))
    lens = rng.integers(1, max_run + 1, size=n_runs)
    while lens.sum() < n_valid:
        lens = np.concatenate([lens, rng.integers(1, max_run + 1, size=8)])
    # cut to exactly n_valid
    csum = np.cumsum(lens)
    n_runs = int(np.searchsorted(csum, n_valid) + 1)
    lens = lens[:n_runs]
    lens[-1] -= csum[n_runs - 1] - n_valid
    lens = lens[lens > 0]
    # ascending multi-word keys; keep top bit clear so never all-ones
    keys = np.sort(
        rng.choice(np.arange(0, 1 << 20, dtype=np.uint64), len(lens),
                   replace=False)
    )
    cols = []
    for w in range(n_words):
        shift = 10 * (n_words - 1 - w)
        col = ((keys >> shift) & 0x3FF).astype(np.uint32)
        full = np.repeat(col, lens)
        cols.append(np.concatenate([
            full, np.full(p - n_valid, _ONES, np.uint32)
        ]))
    return [jnp.asarray(c) for c in cols], np.repeat(keys, lens)


@pytest.mark.parametrize("p,n_valid,n_words,min_count,max_run", [
    # run lengths keep survivors under the kernel's 128-per-tile emission
    # budget (denser tables trip its overflow sentinel -> XLA retry, which
    # test_finalize_overflow_reports_n_out pins separately)
    (1000, 900, 2, 3, 40),
    (1000, 1000, 1, 1, 30),      # no invalid tail, min_count 1
    (20000, 17000, 3, 10, 400),  # multiple tiles
    (_FIN_TILE + 17, _FIN_TILE + 17, 2, 2, 1200),  # run crossing tile edge
    (5000, 0, 2, 2, 4),          # empty
])
def test_finalize_parity(p, n_valid, n_words, min_count, max_run):
    rng = np.random.default_rng(p + n_words)
    cols, _ = _sorted_columns(rng, p, n_words, n_valid, max_run)
    cap = 4096
    ref_w, ref_c, ref_n = finalize_sorted(
        tuple(cols), jnp.int32(n_valid), jnp.int32(min_count), cap
    )
    got_w, got_c, got_n = finalize_sorted_pallas(
        tuple(cols), n_valid, min_count=min_count, cap=cap, interpret=True
    )
    assert int(got_n) == int(ref_n)
    n = min(int(ref_n), cap)
    for rw, gw in zip(ref_w, got_w):
        assert np.array_equal(np.asarray(rw)[:n], np.asarray(gw)[:n])
    assert np.array_equal(np.asarray(ref_c)[:n], np.asarray(got_c)[:n])


def test_finalize_long_run_many_tiles():
    """One run spanning several tiles, counted exactly."""
    p = 3 * _FIN_TILE
    n_valid = p - 5
    col = np.full(p, 7, np.uint32)
    col[n_valid:] = _ONES
    got_w, got_c, got_n = finalize_sorted_pallas(
        (jnp.asarray(col),), n_valid, min_count=2, cap=16, interpret=True
    )
    assert int(got_n) == 1
    assert int(np.asarray(got_w[0])[0]) == 7
    assert int(np.asarray(got_c)[0]) == n_valid


def test_finalize_overflow_reports_n_out():
    p = 4096
    col = np.arange(p, dtype=np.uint32) // 2  # 2048 runs of length 2
    got_w, got_c, got_n = finalize_sorted_pallas(
        (jnp.asarray(col),), p, min_count=2, cap=64, interpret=True
    )
    # 2048 survivors also exceed the per-tile emission budget; the kernel
    # must report n_out > cap either way so the caller retries via XLA
    assert int(got_n) >= 2048
    assert np.array_equal(np.asarray(got_w[0])[:64], np.arange(64))
    assert np.all(np.asarray(got_c)[:64] == 2)


def test_finalize_per_tile_emission_overflow_sentinel():
    """>128 survivors in ONE tile but n_out < cap: the sentinel must still
    force n_out > cap (rows beyond the tile budget were dropped)."""
    p = 4096
    col = np.arange(p, dtype=np.uint32) // 8  # 512 runs of length 8
    _, _, got_n = finalize_sorted_pallas(
        (jnp.asarray(col),), p, min_count=2, cap=4096, interpret=True
    )
    assert int(got_n) > 4096  # sentinel: true 512 < cap, but rows were lost


@pytest.mark.parametrize("k,bits,n", [
    (21, 2, 50000),
    (16, 2, 20000),   # tie-break word case (k*bits == 32)
    (5, 2, 4000),
    (31, 2, 40000),
    (7, 4, 9000),
])
def test_build_keys_parity(k, bits, n):
    """Pallas key build == XLA unpack+pack+mask on random packed streams."""
    rng = np.random.default_rng(k * 100 + bits)
    per = 32 // bits
    n = -(-n // per) * per
    codes = rng.integers(0, 1 << bits, size=n).astype(np.uint32)
    # pack codes big-endian into words (host layout)
    shifts = (32 - bits * (np.arange(per) + 1)).astype(np.uint32)
    words = np.bitwise_or.reduce(
        codes.reshape(-1, per).astype(np.uint32) << shifts, axis=1
    )
    p = n - k + 1
    valid = rng.random(p) < 0.9
    valid_u8 = valid.astype(np.uint8)

    total_words, tiebreak = key_words_for(k, bits)
    payload = pack_kmer_words(jnp.asarray(codes), k, bits)
    ref = [jnp.where(jnp.asarray(valid), w, np.uint32(0xFFFFFFFF))
           for w in payload]
    if tiebreak:
        ref.append(jnp.where(jnp.asarray(valid), jnp.uint32(0),
                             np.uint32(0xFFFFFFFF)))

    got = build_keys_pallas(
        jnp.asarray(words), jnp.asarray(valid_u8), k=k, bits=bits, p=p,
        interpret=True,
    )
    assert len(got) == total_words
    for r, g in zip(ref, got):
        assert np.array_equal(np.asarray(r), np.asarray(g))
