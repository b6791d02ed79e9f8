"""Multi-process collectives for host-side objects.

The reference gathers per-rank evaluator predictions with torch.distributed
(`comm.gather` at train_net.py:84-86 and inside d2 evaluators). The JAX
equivalent for host objects: pickle, pad to the max length across processes,
and `multihost_utils.process_allgather` the bytes. Single-process calls are
the identity, so every code path stays testable on one host.
"""

from __future__ import annotations

import logging
import pickle
from typing import Any, List

import numpy as np


def resolve_eval_mesh(mesh):
    """Per-process view of an eval data mesh.

    A mesh spanning multiple processes cannot drive independent per-process
    batched eval: `device_put` of per-process-DIFFERENT host batches onto a
    global NamedSharding is undefined, differing per-process flush counts
    would deadlock the SPMD forward, and the sharded outputs would span
    non-addressable devices. Each process therefore batches its own record
    shard over its own addressable devices only; with fewer than 2 local
    devices, plain per-record eval (returns None)."""
    import jax

    if mesh is None or jax.process_count() == 1:
        return mesh
    pi = jax.process_index()
    local = [d for d in mesh.devices.flat if d.process_index == pi]
    if len(local) < 2:
        return None
    from jax.sharding import Mesh

    return Mesh(np.asarray(local), ("data",))


def sharded_eval_loop(records, evaluator, map_fn, key_fn, flush_fn,
                      n_dev: int, max_records=None) -> int:
    """Shape-grouped device-batched eval driver shared by the image and
    video loops (engine/eval_loop.py, video/eval_loop.py; reference d2
    inference_on_dataset rank sharding + comm.gather).

    - `max_records` caps the GLOBAL record list before process sharding, so
      the evaluated set is identical for any process count.
    - records are sharded round-robin over processes (d2 convention);
    - `map_fn(rec)` -> item or None (skip); items are grouped by
      `key_fn(item)` (a static canvas/clip shape) and `flush_fn(items)` is
      called with exactly n_dev items — or fewer for the final partial
      groups, which flush_fn pads (outputs of padding discarded);
    - evaluator states are all-gathered and `merge_from`-merged across
      processes at the end.

    Returns the number of records this process mapped successfully."""
    import jax

    if max_records is not None:
        records = records[:max_records]
    nproc = jax.process_count()
    if nproc > 1:
        records = records[jax.process_index()::nproc]

    done = 0
    groups = {}
    for rec in records:
        item = map_fn(rec)
        if item is None:
            continue
        done += 1
        key = key_fn(item)
        groups.setdefault(key, []).append(item)
        if len(groups[key]) == n_dev:
            flush_fn(groups.pop(key))
    for items in groups.values():
        flush_fn(items)

    if nproc > 1:
        for i, other in enumerate(all_gather_objects(evaluator)):
            if i != jax.process_index():
                evaluator.merge_from(other)
    if max_records is not None and done < len(records):
        # the cap applies to RAW records (cross-process determinism), so
        # mapper-skipped ones shrink the evaluated set below the cap —
        # say so instead of silently evaluating fewer
        logging.getLogger(__name__).warning(
            "evaluated %d of %d capped records (mapper skipped %d)",
            done, len(records), len(records) - done)
    return done


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather one picklable object per JAX process; returns the list indexed
    by process (every process receives all objects)."""
    import jax

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils as mhu

    buf = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = mhu.process_allgather(np.asarray([buf.size], np.int64))
    sizes = np.asarray(sizes).reshape(-1)
    padded = np.zeros((int(sizes.max()),), np.uint8)
    padded[: buf.size] = buf
    gathered = np.asarray(mhu.process_allgather(padded))
    return [pickle.loads(gathered[i, : int(sizes[i])].tobytes())
            for i in range(gathered.shape[0])]
