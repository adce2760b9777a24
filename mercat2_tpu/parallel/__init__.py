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
- large-k sorted path: a scalable distributed sort-count — local sort,
  sample-based splitter agreement, one ``all_to_all`` key-range shuffle,
  then per-device RLE + min-count + compaction. Per-device work stays
  O(N/D log N/D); the concatenated per-device tables ARE the global sorted
  filtered count table (see mercat2_tpu.parallel.count).
"""

from mercat2_tpu.parallel.mesh import make_mesh, mesh_shape_for
from mercat2_tpu.parallel.count import (
    flat_mesh,
    shard_stream,
    shard_stream_blocks,
    sharded_count_sources,
    sharded_count_streams,
    sharded_dense_histogram,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "flat_mesh",
    "shard_stream",
    "shard_stream_blocks",
    "sharded_count_sources",
    "sharded_count_streams",
    "sharded_dense_histogram",
]
