"""OOM-retry helper (reference mask2former_video/utils/memory.py:27-84
`retry_if_cuda_oom`: OOM -> empty_cache -> CPU retry).

On TPU there is no empty_cache; the analog clears jax's compilation/array
caches and retries once, then falls back to the CPU backend if available.
Used around inference post-processing for very high-res inputs (the
reference wraps sem_seg_postprocess/inference, maskformer_model.py:257-276).
"""

from __future__ import annotations

import functools
import logging

logger = logging.getLogger(__name__)


def _is_oom(err: Exception) -> bool:
    msg = str(err).lower()
    return "resource exhausted" in msg or "out of memory" in msg or "oom" in msg


def retry_if_oom(fn):
    """Decorator: retry after cache clear, then once more on CPU."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        import jax

        try:
            return fn(*args, **kwargs)
        except Exception as e:  # jaxlib.xla_extension.XlaRuntimeError etc.
            if not _is_oom(e):
                raise
            logger.warning("OOM in %s; clearing caches and retrying", fn.__name__)
            jax.clear_caches()
            try:
                return fn(*args, **kwargs)
            except Exception as e2:
                if not _is_oom(e2):
                    raise
                try:
                    cpu = jax.devices("cpu")[0]
                except Exception:
                    raise e2
                logger.warning("OOM again; retrying %s on CPU", fn.__name__)
                with jax.default_device(cpu):
                    return fn(*args, **kwargs)

    return wrapped


def pinned_lru_get(cache, key, anchor, build, max_size: int):
    """Identity-pinned LRU lookup shared by the jitted eval-forward caches
    (engine/eval_loop.py, video/eval_loop.py).

    `cache` is an OrderedDict whose values are (anchor, value) pairs; the
    anchor object (usually the model) is pinned in the value so its id()
    stays valid as a key component. A stale hit (same key, different
    anchor) is rebuilt. Oldest entries are evicted beyond max_size.
    """
    hit = cache.get(key)
    if hit is not None and hit[0] is anchor:
        cache.move_to_end(key)
        return hit[1]
    value = build()
    cache[key] = (anchor, value)
    while len(cache) > max_size:
        cache.popitem(last=False)
    return value
