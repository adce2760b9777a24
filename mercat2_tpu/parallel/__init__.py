"""Multi-chip scaling: device meshes + sharded k-mer counting.

Replaces the reference's Ray local-cluster runtime
(/root/reference/bin/mercat2.py:217 and the ``@ray.remote`` task fan-out at
:86-120) with JAX SPMD over a ``jax.sharding.Mesh``:

- **data axis**: the packed code stream is sharded across devices with a
  (k-1)-symbol halo so no window is lost at a shard boundary; each device
  counts its shard independently (the analog of the reference's per-chunk
  ``countKmers`` tasks, /root/reference/bin/mercat2.py:118-120).
- **bins axis** (tensor-parallel analog): for the dense small-k path the
  histogram itself is sharded — partial histograms ``psum_scatter`` over the
  data axis so each device owns a contiguous bin range, replacing the
  reference's driver-side dict merge (/root/reference/bin/mercat2.py:121-127).
- large-k sorted path: per-device local sort, ``all_gather`` + global merge
  sort — a deterministic multi-chip reduction over ICI.
"""

from mercat2_tpu.parallel.mesh import make_mesh, mesh_shape_for
from mercat2_tpu.parallel.count import (
    shard_stream,
    sharded_dense_histogram,
    sharded_sorted_kmer_keys,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "shard_stream",
    "sharded_dense_histogram",
    "sharded_sorted_kmer_keys",
]
