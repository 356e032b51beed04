"""String-keyed registries for models and datasets.

Minimal equivalent of the reference's mmcv-style Registry
(reference utils/registry.py:6-290): classes/factories register under a NAME
and are built from a config dict whose ``NAME`` field selects the entry.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, name: str):
        self._name = name
        self._module_dict: Dict[str, Callable] = {}

    @property
    def name(self):
        return self._name

    def keys(self):
        return sorted(self._module_dict)

    def get(self, key: str):
        return self._module_dict.get(key)

    def __contains__(self, key: str):
        return key in self._module_dict

    def register_module(self, name: str | None = None, module: Callable | None = None):
        """Use as ``@REG.register_module()`` or ``REG.register_module(module=cls)``."""
        if module is not None:
            self._register(module, name)
            return module

        def deco(cls):
            self._register(cls, name)
            return cls

        return deco

    def _register(self, cls, name=None):
        key = name or cls.__name__
        if key in self._module_dict:
            raise KeyError(f"{key} is already registered in {self._name}")
        self._module_dict[key] = cls

    def build(self, cfg, **kwargs) -> Any:
        """Build ``self._module_dict[cfg.NAME](cfg, **kwargs)``."""
        name = cfg.get("NAME")
        if name is None:
            raise KeyError(f"config for registry '{self._name}' has no NAME: {cfg}")
        if name not in self._module_dict:
            raise KeyError(
                f"{name} is not in the {self._name} registry; "
                f"available: {self.keys()}"
            )
        return self._module_dict[name](cfg, **kwargs)


MODELS = Registry("model")
DATASETS = Registry("dataset")


def build_model_from_cfg(cfg, **kwargs):
    """Reference models/build.py:7."""
    return MODELS.build(cfg, **kwargs)


def build_dataset_from_cfg(cfg, default_args=None):
    """Reference datasets/build.py:7."""
    return DATASETS.build(cfg, **(default_args or {}))
