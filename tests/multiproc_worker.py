"""Worker for the 2-process multi-host test (spawned by test_multiprocess).

Each process owns 2 virtual CPU devices; together they form a (dp=2, tp=2)
mesh with the dp axis spanning processes — the layout a 2-host TPU pod
would use (SURVEY.md §2.4 / BASELINE 2-host target). Every process runs
this same SPMD program; process 0 writes the gathered generations.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> int:
    coordinator, nproc, pid, model_path, out_path = sys.argv[1:6]

    from xalm_tpu.parallel.multihost import all_hosts, init_distributed

    init_distributed(coordinator, int(nproc), int(pid))
    assert jax.process_count() == int(nproc), jax.process_count()
    assert jax.local_device_count() == 2
    assert jax.device_count() == 2 * int(nproc)

    from xalm_tpu.parallel.mesh import make_mesh
    from xalm_tpu.parallel.sharded_engine import ShardedEngine

    mesh = make_mesh(dp=int(nproc), tp=2)
    eng = ShardedEngine.from_xalm(model_path, mesh)

    rng = np.random.default_rng(0)
    prompts = rng.integers(3, 350, size=(2, 8)).astype(np.int32)

    # per-host dp feeding: each process contributes only ITS row of the
    # global batch; the assembled global array must equal the full batch
    from jax.sharding import PartitionSpec as P

    from xalm_tpu.parallel.multihost import host_local_to_global

    local_rows = prompts[int(pid) : int(pid) + 1]
    fed = host_local_to_global(mesh, P("dp", None), local_rows)
    assert fed.shape == prompts.shape
    np.testing.assert_array_equal(all_hosts(fed), prompts)

    cache = eng.new_cache(2)
    logits, cache = eng.step(
        prompts, np.zeros(2, np.int32), cache, logits_mode="last"
    )
    tok0 = all_hosts(logits).argmax(-1).astype(np.int32)
    toks, cache = eng.decode_scan(tok0, np.full(2, 8, np.int32), cache, 6)
    out = all_hosts(toks)
    if int(pid) == 0:
        payload = {"tok0": tok0.tolist(), "generated": np.asarray(out).tolist()}
        with open(out_path, "w") as f:
            json.dump(payload, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
