"""Multi-host (multi-process) data parallelism smoke test.

Spawns two real OS processes, each owning one CPU device, connected through
``jax.distributed.initialize`` (local coordinator) — the same code path as
multi-slice TPU training over DCN.  One Trainer epoch runs with the batch
sharded ACROSS processes (gradient psum over the process boundary), then an
eval pass with cross-process output gathering, then a checkpoint save.

SURVEY.md §5 distributed-backend row; reference has no counterpart
(single-process DataParallel only, train.py:255-256).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
HIER_WORKER = os.path.join(os.path.dirname(__file__),
                           "multihost_hier_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_training(tmp_path):
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # one device per process: the mesh must span BOTH processes
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_NUM_PROCESSES", None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", coordinator, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=570)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_pid = {o["pid"]: o for o in outs}
    assert set(by_pid) == {0, 1}
    for o in outs:
        assert o["devices"] == 2
        assert o["steps"] >= 1
    # SPMD: both processes computed the SAME replicated eval loss
    assert by_pid[0]["eval_loss"] == pytest.approx(by_pid[1]["eval_loss"])

    # process 0 wrote a usable checkpoint
    ckpts = os.listdir(tmp_path / "ckpts")
    assert len(ckpts) == 1
    # and the eval epoch rendered audio into metrics.jsonl
    log_dir = next((tmp_path / "logs").iterdir())
    evals = [
        json.loads(l)
        for l in open(log_dir / "metrics.jsonl", encoding="utf-8")
        if json.loads(l)["kind"] == "eval"
    ]
    assert evals and evals[-1]["audio_generated_samples"] > 0


def test_hierarchical_mesh_fused_decoder_grad_parity(tmp_path):
    """2 processes x 4 devices each: a (data=4, model=2) mesh spanning the
    intra-process (ICI analog) AND inter-process (DCN analog) boundaries
    runs the fused Pallas train decoder (interpret mode) through shard_map;
    each worker asserts gradient parity vs single-local-device autodiff —
    the configuration a real multi-chip pod uses."""
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_NUM_PROCESSES", None)

    procs = [
        subprocess.Popen(
            [sys.executable, HIER_WORKER, str(pid), "2", coordinator],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=570)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert {o["pid"] for o in outs} == {0, 1}
    for o in outs:
        assert o["devices"] == 8
        assert o["local_devices"] == 4
        assert o["mesh"] == {"data": 4, "model": 2}
        assert o["grad_worst_rel"] < 1e-4
