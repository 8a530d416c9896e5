"""Dataset plugin base + filesystem-scanning registry.

Mirrors the reference plugin contract (hem/data/DataPlugin.py:24-84,
discovery in hem/util/data.py:11-35): a plugin declares CLI ``arguments()``,
knows how to ``check``/``download``/``convert_to_tfrecord`` its data, and
returns per-split sources via ``get_datasets(args)``.

``get_dataset_tensors`` is the assembly entry (hem/util/data.py:47-87): it
ensures the dataset is prepared (download -> convert if missing) and returns
``{split: Split}`` (each Split knows its own record count via ``.count``).
The reference's feedable string-handle
iterator switching is unnecessary in JAX — train/validate/test are just three
host iterators feeding the same jitted functions.
"""

from __future__ import annotations

import importlib
import os
import pkgutil
from typing import Optional

from hemx.summaries import proto
from hemx.utils import terminal as term

_REGISTRY: dict[str, type] = {}
_SCANNED = False


# protobuf feature helpers (reference: hem/data/DataPlugin.py:6-21)
def bytes_feature(value: bytes) -> bytes:
    return proto.feature_bytes([value])


def int64_feature(*values: int) -> bytes:
    return proto.feature_int64(values)


def float_feature(*values: float) -> bytes:
    return proto.feature_float(values)


class DataPlugin:
    """Base class for dataset plugins. Subclasses set ``name``."""

    name: str = ""

    @staticmethod
    def arguments() -> dict:
        """{'--flag': argparse-kwargs} contributed to the CLI."""
        return {}

    @staticmethod
    def check_prepared_datasets(storage_dir: str) -> bool:
        raise NotImplementedError

    @staticmethod
    def check_raw_datasets(storage_dir: str) -> bool:
        raise NotImplementedError

    @staticmethod
    def download(download_dir: str) -> bool:
        raise NotImplementedError

    @staticmethod
    def convert_to_tfrecord(download_dir: str, storage_dir: str) -> None:
        raise NotImplementedError

    @classmethod
    def get_datasets(cls, args) -> dict:
        """Return {split_name: hemx.data.pipeline.Split}."""
        raise NotImplementedError


def _scan() -> None:
    global _SCANNED
    if _SCANNED:
        return
    import hemx.data as pkg
    for modinfo in pkgutil.iter_modules(pkg.__path__):
        if modinfo.name.startswith("_") or modinfo.name in (
                "plugin", "pipeline", "tfrecord"):
            continue
        try:
            mod = importlib.import_module(f"hemx.data.{modinfo.name}")
        except Exception as e:  # plugin import failures must not kill the CLI
            term.message(f"WARNING: failed to import data plugin "
                         f"hemx.data.{modinfo.name}: {e}", term.WARNING)
            continue
        for obj in vars(mod).values():
            # walk the MRO like the model registry (plugin.py:97): a plugin
            # deriving from another plugin (the WganModel(GanModel) pattern)
            # must be discoverable too — direct-base-only silently skipped it
            if (isinstance(obj, type) and obj is not DataPlugin
                    and DataPlugin in obj.__mro__[1:] and obj.name):
                _REGISTRY[obj.name] = obj
    _SCANNED = True


def register(cls: type) -> type:
    """Decorator to register out-of-tree plugins."""
    _REGISTRY[cls.name] = cls
    return cls


def get_dataset(name: str) -> Optional[type]:
    _scan()
    return _REGISTRY.get(name)


def available_datasets() -> list[str]:
    _scan()
    return sorted(_REGISTRY)


def get_dataset_tensors(args) -> dict:
    """Ensure-prepared + per-split Split objects
    (reference: hem/util/data.py:47-87)."""
    cls = get_dataset(args.dataset)
    if cls is None:
        raise ValueError(f"unknown dataset '{args.dataset}'; "
                         f"available: {available_datasets()}")
    storage = os.path.join(args.dataset_dir, cls.name)
    if not cls.check_prepared_datasets(storage):
        if not cls.check_raw_datasets(args.raw_dataset_dir):
            term.message(f"Downloading raw dataset for '{cls.name}'...")
            cls.download(args.raw_dataset_dir)
        term.message(f"Converting '{cls.name}' to TFRecord...")
        cls.convert_to_tfrecord(args.raw_dataset_dir, storage)
    splits = cls.get_datasets(args)
    # reference input-layer order: resize, then grayscale (train.py:226-231)
    if getattr(args, "resize", None):
        from hemx.data.pipeline import resize_images
        splits = {k: resize_images(v, args.resize) for k, v in splits.items()}
    if getattr(args, "grayscale", False):
        from hemx.data.pipeline import to_grayscale
        splits = {k: to_grayscale(v) for k, v in splits.items()}
    return splits
