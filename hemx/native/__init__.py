"""Native (C++) runtime components with build-on-demand loading.

``load()`` returns the compiled `_native` extension (TFRecord IO + CRC32C),
compiling it with g++ on first use and caching the .so next to the sources.
All call sites have pure-Python fallbacks, so a missing toolchain degrades
gracefully.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

_ROOT = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_ROOT, "_native.so")
_SRC = os.path.join(_ROOT, "tfrecord.cc")
_cached = None
_failed = False


def _build() -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           f"-I{include}", _SRC, "-o", _SO_PATH]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load():
    """Return the _native module, building it if needed; None on failure."""
    global _cached, _failed
    if _cached is not None or _failed:
        return _cached
    try:
        # pip/wheel installs ship the extension prebuilt by setup.py (as
        # hemx.data._native, where site-packages has no tfrecord.cc to
        # compile from); the source-build path below is the dev-repo route.
        import hemx.data._native as mod
        _cached = mod
        return _cached
    except ImportError:
        pass
    try:
        if (not os.path.exists(_SO_PATH)
                or os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC)):
            if not _build():
                _failed = True
                return None
        import importlib.util
        spec = importlib.util.spec_from_file_location("hemx.data._native",
                                                      _SO_PATH)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _cached = mod
    except Exception:
        _failed = True
        _cached = None
    return _cached
