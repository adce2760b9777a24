"""Multi-chip sharded counting vs the single-device engine.

Runs on 8 virtual CPU devices (tests/conftest.py). Covers the TPU mapping
of the reference's chunk-level data parallelism + driver dict merge
(/root/reference/bin/mercat2.py:118-127): haloed stream sharding, dense
psum_scatter/psum histogram reduction, and the sorted all_gather merge.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mercat2_tpu.ops.dense_hist import dense_kmer_histogram
from mercat2_tpu.ops.kmer_pack import sorted_kmer_keys
from mercat2_tpu.parallel import (
    make_mesh,
    mesh_shape_for,
    shard_stream,
    sharded_dense_histogram,
    sharded_sorted_kmer_keys,
)


def _random_stream(n, alphabet, seed, sep_every=None):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, alphabet, size=n, dtype=np.uint8)
    if sep_every:
        s[::sep_every] = alphabet  # sprinkle separators (values >= alphabet)
    return s


def test_mesh_shape_for():
    assert mesh_shape_for(1) == (1, 1)
    assert mesh_shape_for(2) == (2, 1)
    assert mesh_shape_for(8) == (4, 2)
    assert mesh_shape_for(8, bins_parallel=1) == (8, 1)
    with pytest.raises(ValueError):
        mesh_shape_for(6, bins_parallel=4)


def test_shard_stream_covers_every_window():
    k, n_shards = 5, 8
    s = _random_stream(1000, 4, 0)
    shards = shard_stream(s, k, n_shards, sentinel=4)
    L = shards.shape[1] - (k - 1)
    # every global window start appears in exactly one shard, with its full
    # k-symbol window intact thanks to the halo
    rebuilt = []
    for d in range(n_shards):
        for i in range(L):
            g = d * L + i
            if g <= s.shape[0] - k:
                np.testing.assert_array_equal(shards[d, i : i + k], s[g : g + k])
                rebuilt.append(g)
    assert rebuilt == list(range(s.shape[0] - k + 1))


@pytest.mark.parametrize("k,alphabet", [(3, 4), (5, 4), (3, 25)])
def test_sharded_dense_matches_single_device(k, alphabet):
    mesh = make_mesh(8)
    s = _random_stream(4096, alphabet, 1, sep_every=97)
    shards = shard_stream(s, k, mesh.size, sentinel=alphabet)
    hist = sharded_dense_histogram(shards, k=k, alphabet_size=alphabet, mesh=mesh)
    ref = np.asarray(
        dense_kmer_histogram(jnp.asarray(s), k=k, alphabet_size=alphabet)
    )
    np.testing.assert_array_equal(hist, ref.astype(np.int64))


@pytest.mark.parametrize("k,bits,alphabet", [(21, 2, 4), (16, 2, 4), (3, 5, 25)])
def test_sharded_sorted_matches_single_device(k, bits, alphabet):
    mesh = make_mesh(8)
    s = _random_stream(4096, alphabet, 2, sep_every=131)
    shards = shard_stream(s, k, mesh.size, sentinel=alphabet)
    words, n_valid = sharded_sorted_kmer_keys(
        shards, k=k, bits=bits, alphabet_size=alphabet, mesh=mesh
    )
    ref_words, ref_valid = sorted_kmer_keys(
        jnp.asarray(s), k=k, bits=bits, alphabet_size=alphabet
    )
    assert n_valid == int(ref_valid)
    for w, rw in zip(words, ref_words):
        np.testing.assert_array_equal(w[:n_valid], np.asarray(rw)[:n_valid])


def test_sharded_dense_on_small_mesh():
    mesh = make_mesh(2)
    s = _random_stream(512, 4, 3)
    shards = shard_stream(s, 4, mesh.size, sentinel=4)
    hist = sharded_dense_histogram(shards, k=4, alphabet_size=4, mesh=mesh)
    assert int(hist.sum()) == s.shape[0] - 4 + 1
