"""Optional native helpers, compiled on first import and cached.

``populate_alloc`` routes every >= 1 MiB numpy data buffer to
``mmap(MAP_POPULATE)`` with free-list reuse (see populate_alloc.c for
the measured host pathology it fixes). The build is a single gcc
invocation cached under a user-owned 0700 directory
(``$XDG_CACHE_HOME/bge_m3_native``, ownership-checked before any load)
keyed by source hash + python version; any failure (no gcc, non-Linux,
old numpy, untrusted cache dir) silently degrades to the stock
allocator — correctness never depends on this module.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import sysconfig

_installed: bool | None = None


def _dir_is_trusted(path: str) -> bool:
    """Owned by this uid and not group/other-writable — the load-a-
    planted-.so guard: the cache path is predictable (source-hash keyed),
    so a directory anyone else could have created or written must never
    be trusted."""
    try:
        st = os.stat(path)
    except OSError:
        return False
    return st.st_uid == os.getuid() and not (st.st_mode & 0o022)


def _build_so() -> str | None:
    src = os.path.join(os.path.dirname(__file__), "populate_alloc.c")
    try:
        with open(src, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
    except OSError:
        return None
    tag = f"cp{sys.version_info[0]}{sys.version_info[1]}"
    # user-owned cache root (mode 0700), never the shared /tmp: on a
    # multi-user host a predictable world-writable path lets another
    # local user pre-plant a malicious .so that every importing process
    # would dlopen
    root = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    base = os.path.join(root, "bge_m3_native")
    cache = os.path.join(base, f"{tag}_{digest}")
    so = os.path.join(cache, "populate_alloc.so")
    try:
        os.makedirs(base, mode=0o700, exist_ok=True)
        os.makedirs(cache, mode=0o700, exist_ok=True)
    except OSError:
        return None
    if not (_dir_is_trusted(base) and _dir_is_trusted(cache)):
        return None          # pre-existing untrusted dir: refuse to load
    if os.path.exists(so):
        return so
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
