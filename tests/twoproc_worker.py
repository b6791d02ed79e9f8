"""Worker for tests/test_two_process_distributed.py — runs as one of two
real `jax.distributed` CPU processes and exercises the multi-process paths
that single-process tests can only fake: process_allgather-backed
all_gather_objects, resolve_eval_mesh's per-process local mesh, and
sharded_eval_loop's round-robin record sharding + evaluator merge.

Writes a JSON result file for the parent test to assert on.
"""

import json
import os
import sys

# spawned as `python tests/twoproc_worker.py` — python puts tests/ on
# sys.path, not the repo root, and the parent's pytest path munging does
# not reach a subprocess; make the import self-contained
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class CountingEvaluator:
    """Module-level so instances survive the pickle round-trip inside
    all_gather_objects (local classes cannot be pickled)."""

    def __init__(self):
        self.seen = []

    def merge_from(self, other):
        self.seen.extend(other.seen)


def main():
    coord, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # older/newer configs: default implementation
    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 2 and len(jax.devices()) == 4

    from mp_former_tpu.parallel.dist import (all_gather_objects,
                                             resolve_eval_mesh,
                                             sharded_eval_loop)

    # 1. all_gather_objects with per-process payloads of DIFFERENT pickled
    # sizes (exercises the pad-to-max + size-trim path)
    payload = {"pid": pid, "blob": "x" * (10 + 300 * pid)}
    gathered = all_gather_objects(payload)
    assert [g["pid"] for g in gathered] == [0, 1]
    assert len(gathered[1]["blob"]) == 310

    # 2. resolve_eval_mesh: a global 4-device mesh spanning both processes
    # must resolve to this process's own 2-device mesh
    import numpy as np
    from jax.sharding import Mesh

    global_mesh = Mesh(np.asarray(jax.devices()), ("data",))
    local = resolve_eval_mesh(global_mesh)
    assert local is not None and local.devices.size == 2
    assert all(d.process_index == pid for d in local.devices.flat)

    # 3. sharded_eval_loop: 11 records round-robin over 2 processes, grouped
    # by parity, flushed in pairs; evaluator states merged across processes.
    ev = CountingEvaluator()
    records = [{"id": i, "parity": i % 2} for i in range(11)]

    def map_fn(rec):
        return None if rec["id"] == 7 else rec  # one mapper skip

    def flush_fn(items):
        assert len(items) <= 2
        ev.seen.extend(it["id"] for it in items)

    done = sharded_eval_loop(records, ev, map_fn,
                             key_fn=lambda it: it["parity"],
                             flush_fn=flush_fn, n_dev=2, max_records=10)

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "done": done,
                   "seen": sorted(ev.seen)}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
