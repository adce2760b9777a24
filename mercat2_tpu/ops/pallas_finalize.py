"""Pallas TPU kernels for the k-mer count hot path.

Two fused kernels replace the XLA op chains around the device sort (the
sort itself stays ``jax.lax.sort``; XLA's TPU sort is close to memory
speed-of-light and a Pallas rewrite is the wrong complexity trade):

- :func:`build_keys_pallas` — packed transport words -> masked rolling
  sort-key columns. Fuses unpack (bit extraction), the k-window multiword
  rolling pack, and validity masking into ONE pass over HBM. The XLA
  log-tree version (ops.kmer_pack.pack_kmer_words) materializes every
  intermediate (~8 ms per 8.4M windows on a v5e); this kernel keeps the
  whole tree in VMEM and writes only the final key columns.

- :func:`finalize_sorted_pallas` — sorted key columns -> compacted
  (key, count) table in one sequential-grid pass. Replaces the XLA chain
  boundary / reverse-cummin run-length / approx_min_k select / gathers
  (~8 ms per 8.4M rows) with a scan-free formulation:

    * a run ending at row j passes the min-count filter iff
      ``key[j-1] == key[j-min_count]`` — over SORTED keys, equal endpoints
      imply the whole span is equal, so no running scan is needed;
    * survivors are rare (min-count filters kill almost everything), so
      most tiles skip emission entirely; a surviving tile rank-compacts
      its survivors (flat log-shift scans + masked-reduce selects) into
      its own blocked output row, and a tiny XLA post-pass stitches the
      ragged rows into the dense table (Mosaic supports neither scatter
      nor scalar/unaligned dynamic VMEM stores).

Both kernels are bit-exact vs their XLA counterparts; tests run them in
interpreter mode on CPU, and the engine routes to them only on real TPU
backends. The reference has no counterpart (its hot loop is a Python dict,
/root/reference/lib/mercat2_kmers.py:56-76); the design is TPU-first.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["build_keys_pallas", "finalize_sorted_pallas", "pallas_ok"]

# plain numpy scalars: jnp scalars would be traced constants, which
# pallas kernels may not close over
_ONES32 = np.uint32(0xFFFFFFFF)
_BIG = np.int32(2**31 - 1)

#: rows per sequential finalize tile (as a (128, 128) block; bigger
#: blocks amortize per-grid-step overhead but the kernel's live temporaries
#: scale with the block — 512 rows exceeded the 16 MB scoped-VMEM budget)
_FIN_R = 128
_FIN_TILE = _FIN_R * 128
#: max survivors emitted per finalize tile (vector-store width); a tile
#: with more flags overflow and the caller retries through the XLA path
_EMIT = 128
#: windows per key-build tile (as a (512, 128) block)
_KEY_R = 512
_KEY_TILE = _KEY_R * 128


def pallas_ok() -> bool:
    """True when compiled Pallas TPU kernels can run on the default backend."""
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# flat-order helpers on (R, 128) tiles
# ---------------------------------------------------------------------------


def _roll_flat(x: jax.Array, s: int) -> jax.Array:
    """Circular roll in row-major flat order: out[f] = x[(f - s) mod n]."""
    R, C = x.shape
    n = R * C
    s %= n
    if s == 0:
        return x
    a, b = divmod(s, C)
    if b:
        t = pltpu.roll(x, b, axis=1)
        tp = pltpu.roll(t, 1, axis=0)
        col = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
        x = jnp.where(col < b, tp, t)
    if a:
        x = pltpu.roll(x, a, axis=0)
    return x


def _shift_from_prev(x: jax.Array, prev: jax.Array, s: int) -> jax.Array:
    """out[f] = x[f - s], with x[-i] taken from the tail of ``prev``.

    ``x`` and ``prev`` are consecutive (R, 128) tiles of one flat stream
    (``prev`` immediately precedes ``x``); 0 < s < R*128 static.
    """
    R, C = x.shape
    xs = _roll_flat(x, s)
    ps = _roll_flat(prev, s)
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
        + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    )
    return jnp.where(flat < s, ps, xs)


def _flat_slice(x: jax.Array, off: int, rows: int) -> jax.Array:
    """rows*128 flat elements of ``x`` starting at flat offset ``off``
    (static). Elements past the end wrap circularly — callers must not
    depend on the wrapped tail."""
    return _roll_flat(x, -off)[:rows]


def _flat_scan(x: jax.Array, op, fill) -> jax.Array:
    """Inclusive scan (op) over row-major flat order of an (R, 128) tile.

    Log-shift formulation using only roll + select (safe Mosaic ops):
    lane-level scan inside each row, then an exclusive row-prefix of the
    per-row totals folded back in.
    """
    R, C = x.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    s = 1
    while s < C:
        rolled = pltpu.roll(x, s, axis=1)
        x = op(x, jnp.where(col >= s, rolled, fill))
        s *= 2
    row_tot = x[:, C - 1 : C]  # (R, 1) inclusive row totals
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    # exclusive row prefix: shift down one row, then log-scan
    pref = jnp.where(row >= 1, pltpu.roll(row_tot, 1, axis=0), fill)
    s = 1
    while s < R:
        rolled = pltpu.roll(pref, s, axis=0)
        pref = op(pref, jnp.where(row >= s, rolled, fill))
        s *= 2
    return op(x, jnp.broadcast_to(pref, (R, C)))


# ---------------------------------------------------------------------------
# finalize_sorted_pallas
# ---------------------------------------------------------------------------


def _finalize_kernel(nv_ref, *refs, n_words: int, min_count: int, cap: int,
                     p: int):
    """One sequential tile: emits this tile's survivors (rank-compacted,
    ascending) into its own blocked output row, plus a meta row with the
    survivor count and an emission-overflow flag. Everything is static
    stores — Mosaic supports neither scatter nor scalar/unaligned dynamic
    VMEM stores; a tiny XLA post-pass stitches the ragged rows together.
    """
    i = pl.program_id(0)
    n_valid = nv_ref[0]
    in_refs = refs[:n_words]
    out_refs = refs[n_words : 2 * n_words]  # blocked (1, _EMIT) rows
    counts_ref = refs[2 * n_words]          # blocked (1, _EMIT) row
    meta_ref = refs[2 * n_words + 1]        # blocked (1, _EMIT): lane0=emit
    carry = refs[2 * n_words + 2]           # SMEM [open_run_start]
    prevs = refs[2 * n_words + 3 :]         # n_words VMEM (R,128) prev tiles

    cols = [r[...] for r in in_refs]
    R, C = cols[0].shape

    @pl.when(i == 0)
    def _():
        carry[0] = 0
        for w in range(n_words):
            # seed so row 0 compares equal to its "previous" row: the run
            # at position 0 opens without a boundary
            prevs[w][...] = jnp.full((R, C), cols[w][0, 0], jnp.int32)

    base = i * (R * C)
    pos = base + (
        jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) * C
        + jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    )

    prev1 = [_shift_from_prev(cols[w], prevs[w][...], 1)
             for w in range(n_words)]
    neq = None
    for w in range(n_words):
        d = cols[w] != prev1[w]
        neq = d if neq is None else (neq | d)
    boundary = neq & (pos <= n_valid)

    # min-count test without a scan: over sorted keys, the run ending at j
    # spans >= min_count rows iff key[j-1] == key[j-min_count]
    if min_count <= 1:
        long_enough = jnp.full((R, C), True)
    else:
        prevmc = [_shift_from_prev(cols[w], prevs[w][...], min_count)
                  for w in range(n_words)]
        long_enough = None
        for w in range(n_words):
            e = prev1[w] == prevmc[w]
            long_enough = e if long_enough is None else (long_enough & e)
    keep = boundary & long_enough & (pos >= min_count)

    emit_cnt = jnp.sum(keep.astype(jnp.int32))
    open_start = carry[0]
    bpos = jnp.where(boundary, pos, np.int32(-1))
    # output blocks are (8, _EMIT) — Mosaic requires 8-divisible block
    # rows — with payload in row 0 only
    orow = jax.lax.broadcasted_iota(jnp.int32, (8, _EMIT), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, _EMIT), 1)
    meta_ref[...] = jnp.where(
        (orow == 0) & (lane == 0), emit_cnt,
        jnp.where(
            (orow == 0) & (lane == 1),
            (emit_cnt > _EMIT).astype(jnp.int32), 0,
        ),
    )

    @pl.when(emit_cnt > 0)
    def _():
        # rank of each survivor in flat order (0-based), and each row's
        # run start (the nearest boundary strictly before it, or the
        # carried open-run start) via flat log-shift scans
        rank = _flat_scan(keep.astype(jnp.int32), jnp.add, np.int32(0)) - 1
        incl_max = _flat_scan(bpos, jnp.maximum, np.int32(-1))
        flat0 = (pos - base) == 0
        excl_max = jnp.where(
            flat0, np.int32(-1), _roll_flat(incl_max, 1)
        )
        run_start = jnp.maximum(excl_max, open_start)
        run_count = pos - run_start

        # masked-reduce extraction per emission lane: select-based vector
        # construction, static full-row stores. Rare: most tiles have no
        # survivors and skip this block entirely.
        def compact(val2d):
            vec = jnp.zeros((8, _EMIT), jnp.int32)
            for e in range(_EMIT):
                s = jnp.sum(jnp.where(keep & (rank == e), val2d,
                                      np.int32(0)))
                vec = jnp.where((orow == 0) & (lane == e), s, vec)
            return vec

        for w in range(n_words):
            out_refs[w][...] = compact(prev1[w])
        counts_ref[...] = compact(run_count)

    carry[0] = jnp.maximum(open_start, jnp.max(bpos))
    for w in range(n_words):
        prevs[w][...] = cols[w]


@functools.partial(
    jax.jit, static_argnames=("min_count", "cap", "interpret")
)
def finalize_sorted_pallas(words, n_valid, *, min_count: int, cap: int,
                           interpret: bool = False):
    """Sorted masked key columns -> compacted (words, counts, n_out).

    Same contract as ops.finalize.finalize_sorted, with a STATIC
    ``min_count`` (the engine's value is a per-run constant): returns the
    leading ``cap`` rows of the surviving sorted table plus the true
    survivor count ``n_out`` (> cap signals overflow; callers retry).

    Requirements: every valid key differs from the all-ones marker in at
    least one word (guaranteed by build_keyed_words), and
    ``min_count < _FIN_TILE``.
    """
    n_words = len(words)
    p = int(words[0].shape[0])
    assert 1 <= min_count < _FIN_TILE
    # pad to whole tiles with the all-ones marker, at least one row PAST p
    # so the final run is always closed by an in-stream boundary
    n_tiles = (p + _FIN_TILE) // _FIN_TILE
    p_pad = n_tiles * _FIN_TILE
    # the kernel runs on int32 bitcasts (Mosaic lacks unsigned reductions);
    # only equalities and position order are used, so signs never matter
    padded = [
        jnp.pad(
            jax.lax.bitcast_convert_type(w, jnp.int32),
            (0, p_pad - p), constant_values=np.int32(-1)
        ).reshape(n_tiles * _FIN_R, 128)
        for w in words
    ]
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)

    kernel = functools.partial(
        _finalize_kernel, n_words=n_words, min_count=min_count, cap=cap, p=p
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            # index maps receive (grid idx, scalar-prefetch ref)
            pl.BlockSpec((_FIN_R, 128), lambda i, _nv: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_words)
        ],
        out_specs=[
            pl.BlockSpec((8, _EMIT), lambda i, _nv: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_words + 2)
        ],
        scratch_shapes=(
            [pltpu.SMEM((1,), jnp.int32)]
            + [pltpu.VMEM((_FIN_R, 128), jnp.int32) for _ in range(n_words)]
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles * 8, _EMIT), jnp.int32)
            for _ in range(n_words + 2)
        ),
        interpret=interpret,
    )(nv, *padded)
    # payload lives in row 0 of each tile's 8-row output block
    out = tuple(o.reshape(n_tiles, 8, _EMIT)[:, 0, :] for o in out)

    # XLA post-pass: stitch the per-tile rank-compacted rows (ragged, in
    # order) into the dense leading-cap table. Tiny: n_tiles*_EMIT rows.
    from mercat2_tpu.ops.finalize import _select_first_positions

    meta = out[n_words + 1]
    emits = meta[:, 0]
    overflow = jnp.max(meta[:, 1])
    n_out = jnp.sum(emits)
    total = n_tiles * _EMIT
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_tiles, _EMIT), 1)
    valid = (lane < emits[:, None]).reshape(total)
    kept = _select_first_positions(valid, total, cap)
    safe = jnp.minimum(kept, total - 1)
    in_range = kept < total
    out_words = tuple(
        jax.lax.bitcast_convert_type(
            jnp.where(in_range, out[w].reshape(total)[safe], 0), jnp.uint32
        )
        for w in range(n_words)
    )
    counts = jnp.where(in_range, out[n_words].reshape(total)[safe], 0)
    # per-tile emission overflow lost rows: force n_out past cap so the
    # caller retries through the XLA variant (exact either way)
    n_out = jnp.where(overflow > 0,
                      jnp.maximum(n_out, np.int32(cap + 1)), n_out)
    return out_words, counts, n_out


# ---------------------------------------------------------------------------
# build_keys_pallas
# ---------------------------------------------------------------------------


def _build_keys_kernel(wm_ref, wh_ref, valid_ref, *out_refs, k: int,
                       bits: int, payload: int, tiebreak: bool):
    per = 32 // bits
    mask_b = np.uint32((1 << bits) - 1)

    # unpack: words laid out (rows, 128//per) so that repeat along lanes
    # reproduces row-major flat symbol order
    def unpack(words2d):
        rows, wpl = words2d.shape
        # element-wise lane expand: lanes[r, c] = words2d[r, c // per].
        # Mosaic cannot shape-cast a (rows, wpl, per) broadcast back to
        # (rows, 128), so build it as wpl masked broadcasts of one column
        # each (cheap VPU selects).
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
        word_of = col // per
        lanes = jnp.zeros((rows, 128), jnp.uint32)
        for j in range(wpl):
            lanes = jnp.where(word_of == j, words2d[:, j : j + 1], lanes)
        shift = (
            np.uint32(32)
            - np.uint32(bits) * (col % per + 1).astype(jnp.uint32)
        )
        return (lanes >> shift) & mask_b

    codes_main = unpack(wm_ref[...])      # (_KEY_R, 128)
    codes_halo = unpack(wh_ref[...])      # (halo rows, 128)
    codes = jnp.concatenate([codes_main, codes_halo], axis=0)

    # log-tree rolling pack entirely in VMEM (see ops.kmer_pack)
    pows = [codes]
    m = 1
    while 2 * m <= per:
        pm = pows[-1]
        pows.append(
            (pm << np.uint32(m * bits)) | _flat_slice(pm, m, pm.shape[0])
        )
        m *= 2

    def pack_range(a: int, s: int) -> jax.Array:
        acc = None
        off, rem = a, s
        for j in range(len(pows) - 1, -1, -1):
            mj = 1 << j
            if rem >= mj:
                part = _flat_slice(pows[j], off, _KEY_R)
                acc = part if acc is None else (
                    (acc << np.uint32(mj * bits)) | part
                )
                off += mj
                rem -= mj
        assert rem == 0
        return acc

    kb0 = k * bits - 32 * (payload - 1)
    s0 = kb0 // bits
    cols = [pack_range(0, s0)]
    a = s0
    for _ in range(payload - 1):
        cols.append(pack_range(a, per))
        a += per

    valid = valid_ref[...] != 0
    for w in range(payload):
        out_refs[w][...] = jnp.where(valid, cols[w], _ONES32)
    if tiebreak:
        out_refs[payload][...] = jnp.where(valid, np.uint32(0), _ONES32)


@functools.partial(
    jax.jit, static_argnames=("k", "bits", "p", "interpret")
)
def build_keys_pallas(packed: jax.Array, valid_u8: jax.Array, *, k: int,
                      bits: int, p: int, interpret: bool = False):
    """Packed transport words + validity bytes -> masked sort-key columns.

    Fused equivalent of ``unpack_codes`` + ``pack_kmer_words`` +
    ``build_keyed_words`` for word-aligned symbol widths whose per-word
    symbol count divides 128 (bits in {1, 2, 4} — i.e. the DNA hot path).

    Args:
        packed: uint32[W] big-endian packed symbols (host transport layout).
        valid_u8: uint8[>= p] window validity (0/1), entries >= p must be 0.
        p: number of windows.

    Returns:
        tuple of key columns uint32[p] (payload + optional tie-break),
        masked like build_keyed_words for the single-file case.
    """
    from mercat2_tpu.ops.kmer_pack import key_words_for

    per = 32 // bits
    assert 32 % bits == 0 and 128 % per == 0, (bits, per)
    assert 2 <= k <= 129, k  # one extra 128-symbol row covers the lookahead
    total_words, tiebreak = key_words_for(k, bits)
    payload = total_words - int(tiebreak)

    n_tiles = -(-p // _KEY_TILE)
    p_pad = n_tiles * _KEY_TILE
    wpl = 128 // per                       # words per 128-symbol row
    halo_rows = 8                          # symbol rows of lookahead
    # (Mosaic requires sublane-divisible block rows; 8 rows = 1024 symbols
    # comfortably covers the k-1 <= 128 lookahead)
    # words laid out (sym_rows, wpl); pad one extra halo block
    need_words = (p_pad // 128 + halo_rows) * wpl
    if packed.shape[0] < need_words:
        packed = jnp.pad(packed, (0, need_words - packed.shape[0]))
    words2d = packed[: need_words].reshape(-1, wpl)
    if valid_u8.shape[0] < p_pad:
        valid_u8 = jnp.pad(valid_u8, (0, p_pad - valid_u8.shape[0]))
    valid2d = valid_u8[:p_pad].reshape(-1, 128)

    kernel = functools.partial(
        _build_keys_kernel, k=k, bits=bits, payload=payload,
        tiebreak=bool(tiebreak),
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            # one words2d row holds the wpl words of one 128-symbol row
            pl.BlockSpec((_KEY_R, wpl), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (halo_rows, wpl),
                lambda i: ((i + 1) * (_KEY_R // halo_rows), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((_KEY_R, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((_KEY_R, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(total_words)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((p_pad // 128, 128), jnp.uint32)
            for _ in range(total_words)
        ),
        interpret=interpret,
    )(words2d, words2d, valid2d)
    return tuple(o.reshape(p_pad)[:p] for o in out)
