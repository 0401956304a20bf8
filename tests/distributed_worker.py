"""Worker for the true multi-process `jax.distributed` smoke test.

Spawned N times by tests/test_jax_distributed.py. Each process connects to
the coordinator, then drives the FULL multihost surface the way a real pod
host would (ref: the reference's only multi-machine surface is DDP init +
DistributedSampler, train/train.py:136-141,325-330):

  initialize_distributed → shard_indices → one globally-sharded step →
  broadcast_from_main → gather_predictions → sync_hosts

and writes an ok-file rank 0's test asserts on. Collectives ride gloo on
CPU — the same code path `jax.distributed` uses between real TPU hosts.
"""

import json
import os
import sys

import numpy as np


def main() -> None:
    port, pid, nproc, outdir = (sys.argv[1], int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    import jax

    # pre-init platform pin: this must run before any backend touch (the
    # host's sitecustomize may pin another platform via env)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from icl_speech_text_llm_tpu.parallel import multihost as mh

    rank = mh.initialize_distributed(
        f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert rank == pid
    assert mh.process_count() == nproc
    assert mh.is_main_process() == (pid == 0)

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    # DistributedSampler parity: every host draws the same permutation and
    # takes a disjoint slice
    n = 16
    idx = mh.shard_indices(n, epoch=1, seed=0)
    data = np.arange(n, dtype=np.float32) * 0.5 + 1.0
    local = data[idx]

    # one step over the GLOBAL mesh: per-host shards assembled into one
    # global array, reduction crosses the process boundary
    mesh = Mesh(np.array(jax.devices()), ("dp",))
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("dp")), local)
    loss = float(jax.jit(lambda x: (x * x).mean())(garr))
    expect = float((data * data).mean())
    assert abs(loss - expect) < 1e-6, (loss, expect)

    # broadcast: every host must end up with rank 0's value
    got = np.asarray(mh.broadcast_from_main(
        np.asarray([rank * 100 + 7], np.int32)))
    assert int(got[0]) == 7, got

    # gather: string-bearing prediction rows from all hosts, on all hosts
    rows = [{"host": rank, "idx": int(i), "pred": f"p{int(i)}"} for i in idx]
    allrows = mh.gather_predictions(rows)
    assert sorted(r["idx"] for r in allrows) == sorted(range(n))
    assert sorted({r["host"] for r in allrows}) == list(range(nproc))

    mh.sync_hosts("done")
    with open(os.path.join(outdir, f"ok_{rank}.json"), "w") as f:
        json.dump({"loss": loss, "expect": expect, "n_rows": len(allrows)}, f)


if __name__ == "__main__":
    main()
