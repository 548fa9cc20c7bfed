"""Process-wide glibc malloc tuning for numpy-heavy batch kernels.

The hot stages allocate MB-scale numpy temporaries per batch. With
glibc's default dynamic thresholds every such temporary is serviced by
``mmap`` and returned with ``munmap``, so each batch pays first-touch
page faults for its whole working set again — measured here at ~0.35 ms
per 4 KiB page on this host (virtualized memory), turning a ~70 ms
encode kernel into seconds. Raising ``M_MMAP_THRESHOLD`` and
``M_TRIM_THRESHOLD`` keeps those blocks on the main heap, which grows to
the high-water mark once and is reused for every later batch (measured:
first encode_segments call 4.2 s → 0.2 s, steady state 0.10 → 0.07 s).

Worker heaps stay bounded: a batch's live temporaries are a few hundred
MB at the configured batch sizes, and the heap high-water mark tracks
the LARGEST batch, not the sum. Set ``GRAFT_NO_MALLOC_TUNE=1`` to opt
out (e.g. under a non-glibc libc).
"""

from __future__ import annotations

import os

_done = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def populated_array(n: int, dtype):
    """A writable 1-D numpy array of ``n`` elements backed by anonymous
    ``mmap(MAP_POPULATE)`` memory — all pages installed by ONE syscall.

    Large long-lived buffers allocated with ``np.empty`` are faulted
    trap-by-trap on first touch; on this virtualized host each 4 KiB
    fault costs ~0.35-2 ms under 32-way concurrency, so first-touching a
    250 MB buffer in 32 concurrent Ray actors measured 128 s — while
    MAP_POPULATE installs the same pages kernel-side in 0.24 s (530x).
    madvise(MADV_HUGEPAGE) is NOT the answer here: THP defrag=madvise
    makes faults attempt direct compaction, measured WORSE (66-211 s)
    once Ray has fragmented physical memory. Use this for any
    hundreds-of-MB buffer that will be filled soon after allocation."""
    import mmap as _mmap

    import numpy as np
    dt = np.dtype(dtype)
    if n <= 0 or not hasattr(_mmap, "MAP_POPULATE"):
        return np.empty(max(n, 0), dt)
    mm = _mmap.mmap(-1, n * dt.itemsize,
                    flags=_mmap.MAP_PRIVATE | _mmap.MAP_ANONYMOUS
                    | _mmap.MAP_POPULATE)
    return np.frombuffer(mm, dtype=dt, count=n)


def tune_malloc() -> bool:
    """Idempotent; returns True when the thresholds were (already) set."""
    global _done
    if _done:
        return True
    if os.environ.get("GRAFT_NO_MALLOC_TUNE") == "1":
        return False
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6")
        ok = bool(libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)) and \
            bool(libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30))
    except OSError:  # non-glibc platform: mallopt unavailable
        ok = False
    _done = ok
    return ok
