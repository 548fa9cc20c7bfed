"""Optional native helpers, compiled on first import and cached.

``populate_alloc`` routes every >= 1 MiB numpy data buffer to
``mmap(MAP_POPULATE)`` with free-list reuse (see populate_alloc.c for
the measured host pathology it fixes). The build is a single gcc
invocation cached under /tmp keyed by source hash + python version;
any failure (no gcc, non-Linux, old numpy) silently degrades to the
stock allocator — correctness never depends on this module.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import sysconfig

_installed: bool | None = None


def _build_so() -> str | None:
    src = os.path.join(os.path.dirname(__file__), "populate_alloc.c")
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    tag = f"cp{sys.version_info[0]}{sys.version_info[1]}"
    cache = os.path.join("/tmp", f"bge_m3_native_{tag}_{digest}")
    so = os.path.join(cache, "populate_alloc.so")
    if os.path.exists(so):
        return so
    os.makedirs(cache, exist_ok=True)
    import numpy as np
    cmd = [
        "gcc", "-O2", "-shared", "-fPIC", "-o", so + ".tmp", src,
        "-I", sysconfig.get_paths()["include"],
        "-I", np.get_include(),
        "-lpthread",
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if r.returncode != 0:
        return None
    os.replace(so + ".tmp", so)  # atomic: concurrent workers race here
    return so


def install_populate_alloc() -> bool:
    """Idempotent; True when the populated-mmap numpy allocator is
    active in this process."""
    global _installed
    if _installed is not None:
        return _installed
    _installed = False
    if os.environ.get("GRAFT_NO_POPULATE_ALLOC") == "1" \
            or not sys.platform.startswith("linux"):
        return False
    so = _build_so()
    if so is None:
        return False
    import importlib.util
    spec = importlib.util.spec_from_file_location("populate_alloc", so)
    if spec is None or spec.loader is None:
        return False
    try:
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _installed = bool(mod.install())
    except Exception:
        _installed = False
    return _installed
