"""The populated-mmap numpy allocator (_native/populate_alloc.c) must be
transparent: every array lifecycle — alloc, copy, zero-init (calloc),
resize (realloc), free/reuse — behaves exactly like the stock allocator.
These tests run with whatever allocator is active; install_populate_alloc
degrades silently where the extension can't build, and the opt-out env
var must keep the stock allocator."""

import os
import subprocess
import sys

import numpy as np


def test_allocator_lifecycle():
    from bge_m3_onnx_ray._native import install_populate_alloc
    installed = install_populate_alloc()
    # on this container gcc exists, so the handler should be live
    name = np.core.multiarray.get_handler_name()
    if installed:
        assert name == "populate_alloc"
    big = np.empty(3_000_000, np.int64)          # > 1 MiB -> mmap path
    big[:] = np.arange(3_000_000)
    assert big[-1] == 2_999_999
    z = np.zeros(2_000_000, np.float64)          # calloc path
    assert not z.any()
    c = big.copy()
    del big
    # freelist reuse: same-size alloc after free must be clean to write
    again = np.empty(3_000_000, np.int64)
    again.fill(7)
    assert (again == 7).all() and c[1] == 1
    r = np.resize(np.arange(1_500_000), 2_500_000)   # realloc-ish path
    assert r[-1] == (2_500_000 - 1) % 1_500_000      # np.resize wraps input
    small = np.empty(64, np.uint8)               # stock malloc path
    small[:] = 1
    assert small.sum() == 64


def test_opt_out_env():
    code = ("import numpy as np, bge_m3_onnx_ray; "
            "print(np.core.multiarray.get_handler_name())")
    env = dict(os.environ, GRAFT_NO_POPULATE_ALLOC="1",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.stdout.strip() == "default_allocator", out.stderr[-500:]
