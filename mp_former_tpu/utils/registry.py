"""Component registries (replacement for detectron2's Registry).

The reference wires its model graph through d2 registries
(`META_ARCH_REGISTRY`, `SEM_SEG_HEADS_REGISTRY`, `BACKBONE_REGISTRY`,
`TRANSFORMER_DECODER_REGISTRY` — reference maskformer_transformer_decoder.py:16-27).
We keep the same string-keyed indirection so config-driven component selection
(`MODEL.MASK_FORMER.TRANSFORMER_DECODER_NAME` etc.) works identically.
"""

from typing import Any, Callable, Dict, Iterator, Optional, Tuple


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._obj_map: Dict[str, Any] = {}

    def register(self, obj: Optional[Any] = None, name: Optional[str] = None):
        if obj is None:
            # used as a decorator
            def deco(fn_or_class: Any) -> Any:
                self._do_register(name or fn_or_class.__name__, fn_or_class)
                return fn_or_class

            return deco
        self._do_register(name or obj.__name__, obj)
        return obj

    def _do_register(self, name: str, obj: Any) -> None:
        if name in self._obj_map:
            raise ValueError(f"'{name}' already registered in '{self._name}' registry")
        self._obj_map[name] = obj

    def get(self, name: str) -> Any:
        if name not in self._obj_map:
            raise KeyError(
                f"No object named '{name}' in '{self._name}' registry. "
                f"Available: {sorted(self._obj_map)}"
            )
        return self._obj_map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._obj_map

    def __iter__(self) -> Iterator[Tuple[str, Any]]:
        return iter(self._obj_map.items())

    def keys(self):
        return self._obj_map.keys()


META_ARCH_REGISTRY = Registry("META_ARCH")
BACKBONE_REGISTRY = Registry("BACKBONE")
SEM_SEG_HEADS_REGISTRY = Registry("SEM_SEG_HEADS")
PIXEL_DECODER_REGISTRY = Registry("PIXEL_DECODER")
TRANSFORMER_DECODER_REGISTRY = Registry("TRANSFORMER_MODULE")
DATASET_MAPPER_REGISTRY = Registry("DATASET_MAPPER")
