"""Multi-host execution: 2 JAX processes on CPU over a shared output tree.

Proves the Ray-replacement contract (SURVEY §5, ref bin/mercat2.py:217,
336-339): deterministic per-host file ownership (host_shard), per-host
sample artifacts, coordinator-only combined TSVs — and that the combined
output is IDENTICAL to a single-process run on the same inputs.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/root/reference/data/simka_test_data")

_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address={coord!r}, num_processes=2, process_id={pid},
)
from mercat2_tpu.pipeline import PipelineConfig, run_pipeline
cfg = PipelineConfig(
    kmer=4, input_folder={data!r}, min_count=2, output={out!r},
    chunk_size_mb=0, pca=False, mesh={mesh!r},
)
run_pipeline(cfg)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_host_shard_partition():
    from mercat2_tpu.parallel.dist import host_shard

    items = [f"s{i}" for i in range(7)]
    a = host_shard(items, process_id=0, num_processes=2)
    b = host_shard(items, process_id=1, num_processes=2)
    assert sorted(a + b) == sorted(items)
    assert not set(a) & set(b)
    # deterministic: same call, same answer
    assert a == host_shard(list(reversed(items)), 0, 2)


@pytest.mark.skipif(not DATA.exists(), reason="simka data missing")
@pytest.mark.parametrize("mesh,local_devices", [
    ("off", 1),
    # the default policy on a pod host: hosts × local chips composed.
    # Each process meshes its own 4 virtual devices (8 global) — this is
    # the shape that crashed when _resolve_mesh used global jax.devices().
    ("auto", 4),
])
def test_two_process_pipeline_matches_single(tmp_path, mesh, local_devices):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out2 = tmp_path / "two_proc"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if local_devices > 1:
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={local_devices}"
        )
    else:
        env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER.format(
                repo=str(REPO), coord=coord, pid=pid,
                data=str(DATA), out=str(out2), mesh=mesh,
            )],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for p, text in zip(procs, outs):
        assert p.returncode == 0, text[-3000:]

    # single-process reference run
    from mercat2_tpu.pipeline import PipelineConfig, run_pipeline

    out1 = tmp_path / "one_proc"
    run_pipeline(PipelineConfig(
        kmer=4, input_folder=str(DATA), min_count=2, output=str(out1),
        chunk_size_mb=0, pca=False, mesh="off",
    ))

    # per-host ownership: every sample counted exactly once, by some host
    tsvs2 = sorted(p.name for p in (out2 / "tsv_nucleotide").glob("*.tsv"))
    tsvs1 = sorted(p.name for p in (out1 / "tsv_nucleotide").glob("*.tsv"))
    assert tsvs2 == tsvs1 and len(tsvs1) == 5

    # identical per-sample AND combined artifacts
    for name in tsvs1:
        a = (out1 / "tsv_nucleotide" / name).read_bytes()
        b = (out2 / "tsv_nucleotide" / name).read_bytes()
        assert a == b, name
    comb1 = (out1 / "combined_Nucleotide.tsv").read_bytes()
    comb2 = (out2 / "combined_Nucleotide.tsv").read_bytes()
    assert comb1 == comb2
