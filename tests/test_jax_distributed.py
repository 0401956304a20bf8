"""TRUE multi-process `jax.distributed` smoke: two local CPU processes.

Everything else in the suite runs multihost helpers with process_count()==1
(or pure-function paths); this test actually spawns two processes, connects
them through a coordinator, and runs a globally-sharded step + broadcast +
prediction gather + barrier across the process boundary — the gloo-backed
code path real TPU pod hosts use. Ref surface being replaced:
train/train.py:136-141 (DDP init) and :325-330 (DistributedSampler).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_workers(tmp_path, mode: str, nproc: int = 2, timeout: int = 240):
    port = _free_port()
    env = dict(os.environ)
    # the workers pin the platform pre-init themselves; scrub any forced
    # device-count flags so each process gets exactly 1 local CPU device
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    # share the suite's persistent compile cache with the workers — the
    # model-mode salmonn step/generate compiles start warm on re-runs
    import tempfile
    env.setdefault("ICL_TPU_COMPILE_CACHE",
                   os.path.join(tempfile.gettempdir(),
                                "icl_tpu_test_compile_cache"))
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(p), str(nproc),
             str(tmp_path), mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for p in range(nproc)
    ]
    outs = []
    try:
        for pr in procs:
            out, _ = pr.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for pr in procs:
            if pr.poll() is None:
                pr.kill()
    for p, pr in enumerate(procs):
        assert pr.returncode == 0, f"worker {p} failed:\n{outs[p][-3000:]}"


def test_two_process_distributed(tmp_path):
    nproc = 2
    _spawn_workers(tmp_path, "synthetic", nproc)
    results = []
    for p in range(nproc):
        with open(tmp_path / f"ok_{p}.json") as f:
            results.append(json.load(f))
    # the globally-reduced loss equals the single-process value on both hosts
    for r in results:
        assert abs(r["loss"] - r["expect"]) < 1e-6
        assert r["n_rows"] == 16
    assert results[0]["loss"] == results[1]["loss"]


@pytest.mark.heavy
def test_two_process_real_model_step(tmp_path):
    """The REAL salmonn train step + generate + prediction gather across a
    true 2-process mesh (VERDICT r4 #4) — the integration the synthetic smoke
    does not cover. The worker asserts loss == single-process and the
    gathered generate strings match single-process decode; this side checks
    both hosts wrote consistent results. Heavy tier: two concurrent CPU
    compiles of the full salmonn-tiny step (~2 min on a 1-core box)."""
    nproc = 2
    _spawn_workers(tmp_path, "model", nproc, timeout=480)
    results = []
    for p in range(nproc):
        with open(tmp_path / f"model_ok_{p}.json") as f:
            results.append(json.load(f))
    for r in results:
        assert abs(r["loss"] - r["expect"]) < 1e-4
        assert r["n_rows"] == nproc
    assert results[0]["loss"] == results[1]["loss"]
