"""Data loaders (replace d2 build_detection_train_loader/test_loader).

Host-side: a thread pool maps records through the dataset mapper while the
TPU computes the previous step (double-buffered prefetch). Batches are
static-shape (padded Targets) so jit never recompiles.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

from ..engine.train_step import Batch
from ..structures import Targets

logger = logging.getLogger(__name__)


def _collate(samples: List[Dict]) -> Batch:
    import jax.numpy as jnp

    from ..structures import pack_bool_masks

    # ship uint8 images + bit-packed masks; the jitted train step casts /
    # unpacks on device (structures.unpack_batch_masks) — 4-8x fewer
    # host-link bytes, and this runtime retains every transfer's host
    # staging buffer, so the volume is also leaked RSS
    images = np.stack([s["image"] for s in samples])
    targets = Targets(
        labels=jnp.asarray(np.stack([s["labels"] for s in samples])),
        masks=jnp.asarray(pack_bool_masks(
            np.stack([s["masks"] for s in samples]))),
        boxes=jnp.asarray(np.stack([s["boxes"] for s in samples])),
        valid=jnp.asarray(np.stack([s["valid"] for s in samples])),
    )
    return Batch(images=jnp.asarray(images), targets=targets)


class TrainLoader:
    """Infinite shuffled loader with worker threads + prefetch queue."""

    def __init__(self, records: List[dict], mapper: Callable, batch_size: int,
                 seed: int = 0, num_workers: int = 4, prefetch: int = 2,
                 filter_empty: bool = True, collate_fn: Callable = None):
        self.records = records
        self.mapper = mapper
        self.collate = collate_fn or _collate
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.filter_empty = filter_empty
        self._q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _sample_stream(self) -> Iterator[dict]:
        rng = np.random.RandomState(self.seed)
        order = np.arange(len(self.records))
        while True:
            rng.shuffle(order)
            for i in order:
                yield self.records[int(i)]

    def _produce(self):
        try:
            self._produce_loop()
        except BaseException as e:  # surface in __next__, don't hang
            self._q.put(e)

    def _produce_loop(self):
        from concurrent.futures import ThreadPoolExecutor

        rng_master = np.random.RandomState(self.seed + 1)
        stream = self._sample_stream()
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending: List = []
            # samples grouped by image shape (the analog of d2's
            # aspect-ratio-grouped batching): mixed orientations / canvas
            # sizes must not meet in one np.stack, and same-shape batches
            # keep jit from recompiling
            groups: Dict[tuple, List[Dict]] = {}
            while not self._stop.is_set():
                while len(pending) < self.batch_size * 2:
                    rec = next(stream)
                    seed = int(rng_master.randint(0, 2 ** 31 - 1))
                    pending.append(pool.submit(
                        self.mapper, rec, np.random.RandomState(seed)))
                ready: List[Dict] = []
                rest: List = []
                for f in pending:
                    if len(ready) >= self.batch_size:
                        rest.append(f)
                        continue
                    s = f.result()
                    if s is None:
                        continue
                    if self.filter_empty and not s["valid"].any():
                        continue
                    ready.append(s)
                pending = rest
                for s in ready:
                    key = tuple(np.asarray(s["image"]).shape)
                    groups.setdefault(key, []).append(s)
                    # last-append order: an actively filling group must not
                    # be the eviction victim below
                    groups[key] = groups.pop(key)
                    if len(groups[key]) == self.batch_size:
                        self._q.put(self.collate(groups.pop(key)))
                # rare canvas shapes must not pool samples forever (unbounded
                # memory + sampling skew): cap live groups, dropping the group
                # that went longest without receiving a sample (first in
                # last-append order). LSJ mappers emit one fixed shape, so
                # this is purely a safety valve for shortest-edge mappers.
                while len(groups) > 16:
                    stale = next(iter(groups))
                    dropped = groups.pop(stale)
                    logger.warning(
                        "dropping %d pooled samples of rare canvas shape %s "
                        "(more than 16 distinct shapes in flight)",
                        len(dropped), stale)

    def __iter__(self):
        return self

    def __next__(self) -> Batch:
        item = self._q.get()
        if isinstance(item, BaseException):
            raise RuntimeError(
                "TrainLoader producer thread died (mapper/collate error)"
            ) from item
        return item

    def close(self):
        self._stop.set()


def build_train_loader(cfg, dataset_name: Optional[str] = None):
    """Reference Trainer.build_train_loader (train_net.py:224-248): pick the
    mapper by cfg.INPUT.DATASET_MAPPER_NAME."""
    from ..utils.registry import DATASET_MAPPER_REGISTRY
    from . import dataset_mappers  # noqa: F401 — ensure registration
    from .dataset_mappers import coco_instance_new_baseline  # noqa: F401
    from .catalog import DatasetCatalog
    from .datasets import builtin  # noqa: F401 — ensure registration

    name = dataset_name or cfg.DATASETS.TRAIN[0]
    records = DatasetCatalog.get(name)
    mapper_cls = DATASET_MAPPER_REGISTRY.get(cfg.INPUT.DATASET_MAPPER_NAME)
    mapper = mapper_cls(cfg, is_train=True, max_instances=cfg.TPU.MAX_INSTANCES)
    return TrainLoader(
        records, mapper, cfg.SOLVER.IMS_PER_BATCH, seed=max(cfg.SEED, 0),
        num_workers=cfg.DATALOADER.NUM_WORKERS,
        filter_empty=cfg.DATALOADER.FILTER_EMPTY_ANNOTATIONS)
