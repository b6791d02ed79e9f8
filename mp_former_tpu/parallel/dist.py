"""Multi-process collectives for host-side objects.

The reference gathers per-rank evaluator predictions with torch.distributed
(`comm.gather` at train_net.py:84-86 and inside d2 evaluators). The JAX
equivalent for host objects: pickle, pad to the max length across processes,
and `multihost_utils.process_allgather` the bytes. Single-process calls are
the identity, so every code path stays testable on one host.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np


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
