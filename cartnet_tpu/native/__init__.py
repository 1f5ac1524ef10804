"""Native (C++) host-side kernels, built on demand with g++.

``get_native()`` compiles `_cartnet_native` the first time it's needed and
caches the .so next to the source; returns None (with a one-time warning) if
the toolchain is unavailable, and callers fall back to the numpy paths.
"""

from __future__ import annotations

import importlib.util
import logging
import os
import subprocess
import sysconfig

_NATIVE = None
_TRIED = False


def _so_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(os.path.dirname(__file__), "_cartnet_native" + suffix)


def build(force: bool = False) -> str:
    """Compile the extension with g++; returns the .so path."""
    import numpy as np
    so = _so_path()
    src = os.path.join(os.path.dirname(__file__), "radius_graph.cpp")
    if not force and os.path.exists(so) and \
            os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        src, "-o", so,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return so


def get_native():
    """The compiled module, or None if unavailable."""
    global _NATIVE, _TRIED
    if _NATIVE is not None or _TRIED:
        return _NATIVE
    _TRIED = True
    try:
        so = build()
        spec = importlib.util.spec_from_file_location("_cartnet_native", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _NATIVE = mod
    except Exception as e:  # toolchain missing — numpy fallback
        logging.warning("native extension unavailable (%s); using numpy", e)
    return _NATIVE
