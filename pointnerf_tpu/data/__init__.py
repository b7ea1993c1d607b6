"""Dataset registry + loader.

Reference: data/__init__.py:10-50 — datasets found by naming convention
`{name}_dataset.py` → CamelCase class. Here the registry is explicit (no
importlib magic) and items are numpy host arrays ready for jax.device_put;
there is no torch DataLoader — batches are [1, R, ...] per camera and the
framework batches rays, not images (reference batch_size is 1 everywhere,
dev_scripts/w_n360/*.sh).
"""

from __future__ import annotations

from typing import Dict

_REGISTRY: Dict[str, type] = {}


def register_dataset(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls
    return deco


def find_dataset_class_by_name(name: str) -> type:
    # import side-effect registration; module names == registered names, so
    # an ImportError inside the module the caller actually asked for must
    # surface as its own traceback, not as "unknown dataset" — only sibling
    # datasets (e.g. missing optional deps) may be skipped
    import importlib
    for mod in ("nerf_synth360_ft", "nerf_synth_ft", "tt_ft", "scannet_ft",
                "llff_ft", "dtu", "dtu_ft"):
        try:
            importlib.import_module(f".{mod}", __package__)
        except ImportError:
            if mod == name:
                raise
    if name not in _REGISTRY:
        raise KeyError(f"unknown dataset {name}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def create_dataset(opt, split: str = None):
    cls = find_dataset_class_by_name(opt.dataset_name)
    ds = cls()
    ds.initialize(opt, split=split or opt.split)
    return ds
