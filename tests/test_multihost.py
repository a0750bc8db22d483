"""Multi-host helpers (single-process semantics + index sharding math) and
a TRUE multi-process run: 2 jax.distributed processes over gloo CPU
collectives driving per-host index sharding -> local-array global assembly
-> one cross-process data-parallel train step."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

from protopformer_tpu.data.datasets import build_synthetic_index
from protopformer_tpu.parallel import (
    is_main_process,
    shard_index_for_process,
)


def test_is_main_process_single():
    assert is_main_process()


def test_shard_index_even_split():
    index = build_synthetic_index(num_samples=10, num_classes=2, image_size=8)
    shards = [
        shard_index_for_process(index, process_index=p, process_count=4)
        for p in range(4)
    ]
    # even=True: every shard the same length (ceil(10/4) = 3, wrapping)
    assert all(len(s) == 3 for s in shards)
    # every original sample appears in some shard
    covered = set()
    for p, s in enumerate(shards):
        for path in s.paths:
            covered.add(path)
    assert covered == set(index.paths)
    # labels track paths through the shuffle
    for s in shards:
        for path, label, img in zip(s.paths, s.labels, s.images):
            i = int(path.split("://")[1])
            assert label == index.labels[i]
            np.testing.assert_array_equal(img, index.images[i])


def test_shard_index_process_count_one_is_identity():
    index = build_synthetic_index(num_samples=7, num_classes=2, image_size=8)
    out = shard_index_for_process(index, process_index=0, process_count=1)
    assert out.paths == index.paths


def _run_worker(pid: int, nproc: int, port: int, ckpt_dir: str = None):
    env = dict(os.environ)
    # the worker forces the CPU platform itself; scrub any axon/TPU state
    env.pop("XLA_FLAGS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    argv = [sys.executable,
            os.path.join(os.path.dirname(__file__), "_mp_worker.py"),
            str(pid), str(nproc), str(port)]
    if ckpt_dir:
        argv.append(ckpt_dir)
    return subprocess.Popen(
        argv,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


def _last_json(stdout: str) -> dict:
    for line in reversed(stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON line in worker output: {stdout!r}")


@pytest.mark.timeout(600)
def test_two_process_distributed_train_step(tmp_path):
    """The process-boundary path the in-process mesh tests cannot reach
    (ref equivalent: torch.distributed.launch + DistributedSampler + DDP,
    main.py:286-316): 2 OS processes, 2 CPU devices each, gloo collectives.
    Asserts (a) both processes see the 4-device global mesh, (b) the
    per-host shards cover the dataset disjointly, (c) both report identical
    metrics (the loss is psum'd), (d) parameters moved, (e) the
    metrics MATCH a single-process emulation of the same global batch on
    the same 4-device mesh — the distributed assembly changes nothing —
    and (f) a MULTIHOST Orbax checkpoint saved by the 2-process run
    round-trips exactly on both processes (ref: save_on_master,
    tools/utils.py:242-244)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    ckpt_dir = str(tmp_path / "mh_ckpt")
    procs = [_run_worker(p, 2, port, ckpt_dir) for p in range(2)]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        outs.append(_last_json(stdout))

    r0, r1 = sorted(outs, key=lambda r: r["pid"])
    assert r0["is_main"] and not r1["is_main"]
    for r in (r0, r1):
        assert r["n_local_devices"] == 2 and r["n_global_devices"] == 4
        assert r["global_batch"] == 8
        assert np.isfinite(r["loss"])
        assert r["param_delta"] > 0  # gradients crossed processes
        # the multihost checkpoint reproduced the post-step params exactly
        assert r["ckpt_roundtrip_delta"] == 0.0
        assert r["ckpt_step"] == 1
        assert r["ckpt_meta"]["epoch"] == 0
        assert r["ckpt_meta"]["val_acc"] == 0.5
    assert r0["loss"] == r1["loss"]  # replicated (psum'd) metrics agree

    # disjoint-and-complete shard coverage (8 + 8 = 16 samples)
    assert len(r0["shard_labels"]) == len(r1["shard_labels"]) == 8

    # single-process ground truth on the identical global batch + mesh size
    ref = _run_worker(0, 1, port)
    stdout, stderr = ref.communicate(timeout=540)
    assert ref.returncode == 0, f"reference worker failed:\n{stderr[-3000:]}"
    rref = _last_json(stdout)
    assert rref["global_batch"] == 8
    np.testing.assert_allclose(r0["loss"], rref["loss"], rtol=1e-5)
    np.testing.assert_allclose(r0["ce_loss"], rref["ce_loss"], rtol=1e-5)
