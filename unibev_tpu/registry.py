"""String-keyed component registries.

The reference wires its whole model graph through mmcv registries keyed by
type-name strings (see e.g. /root/reference/projects/UniBEV/unibev_plugin/
models/detectors/unibev_detector.py:17, dense_heads/unibev_head.py:26).  We
keep the same public type names so reference configs stay readable, but the
registry itself is a ~60-line dict wrapper instead of mmcv's hierarchy.
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Optional


class Registry:
    """Minimal name -> class registry with mmcv-compatible build semantics."""

    def __init__(self, name: str):
        self.name = name
        self._module_dict: Dict[str, Any] = {}

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def __repr__(self) -> str:
        return f"Registry(name={self.name}, items={sorted(self._module_dict)})"

    def get(self, key: str) -> Optional[Any]:
        return self._module_dict.get(key)

    def register_module(self, name: Optional[str] = None, force: bool = False) -> Callable:
        def _register(cls):
            key = name or cls.__name__
            if not force and key in self._module_dict:
                raise KeyError(f"{key} already registered in {self.name}")
            self._module_dict[key] = cls
            return cls

        return _register

    def build(self, cfg: Dict[str, Any], **default_kwargs) -> Any:
        return build_from_cfg(cfg, self, **default_kwargs)


def build_from_cfg(cfg: Dict[str, Any], registry: Registry, **default_kwargs) -> Any:
    """Instantiate ``registry[cfg['type']](**cfg_without_type)``.

    Mirrors mmcv's ``build_from_cfg``: the config dict names a registered
    class via ``type`` and supplies constructor kwargs; defaults passed by
    the caller fill in missing keys.
    """
    if cfg is None:
        return None
    from collections.abc import Mapping
    if not isinstance(cfg, Mapping) or "type" not in cfg:
        raise TypeError(f"cfg must be a dict with a 'type' key, got {cfg!r}")
    args = dict(cfg)
    obj_type = args.pop("type")
    if isinstance(obj_type, str):
        obj_cls = registry.get(obj_type)
        if obj_cls is None:
            raise KeyError(f"{obj_type} is not registered in {registry.name}. "
                           f"Available: {sorted(registry._module_dict)}")
    elif inspect.isclass(obj_type):
        obj_cls = obj_type
    else:
        raise TypeError(f"type must be a str or class, got {obj_type!r}")
    for k, v in default_kwargs.items():
        args.setdefault(k, v)
    return obj_cls(**args)


# The registries mirroring the reference's public surface.
DETECTORS = Registry("detectors")
HEADS = Registry("heads")
BACKBONES = Registry("backbones")
NECKS = Registry("necks")
VOXEL_ENCODERS = Registry("voxel_encoders")
MIDDLE_ENCODERS = Registry("middle_encoders")
TRANSFORMERS = Registry("transformers")
TRANSFORMER_LAYER_SEQUENCES = Registry("transformer_layer_sequences")
ATTENTION = Registry("attention")
POSITIONAL_ENCODINGS = Registry("positional_encodings")
BBOX_ASSIGNERS = Registry("bbox_assigners")
BBOX_CODERS = Registry("bbox_coders")
MATCH_COSTS = Registry("match_costs")
LOSSES = Registry("losses")
PIPELINES = Registry("pipelines")
DATASETS = Registry("datasets")
HOOKS = Registry("hooks")
