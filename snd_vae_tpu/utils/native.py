"""ctypes bindings for the native C++ data-path library.

The reference has no native code (SURVEY §2: 100% Python), but its host-side
data preparation — per-graph random spanning trees (input_data.py:18-38,
71-83) and O(G·N²) pairwise distances (input_data.py:145-151) — is the one
part of the pipeline that cannot ride the TPU.  ``native/sndkern.cpp``
implements both with a thread pool; this module loads the shared library and
falls back silently (callers check ``available()``).

Build: ``python -m snd_vae_tpu.utils.native`` or ``make -C native``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsndkern.so")

_lock = threading.Lock()
_lib = None
_load_failed = False


def build(verbose: bool = False) -> bool:
    """Compile the native library with g++. Returns True on success."""
    src = os.path.join(_NATIVE_DIR, "sndkern.cpp")
    if not os.path.exists(src):
        return False
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", src, "-o", _LIB_PATH,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        if verbose and res.stdout:
            print(res.stdout)
        if res.returncode != 0:
            if verbose:
                print(res.stderr, file=sys.stderr)
            return False
        return True
    except Exception:
        return False


def _load():
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            if not build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.snd_sample_spanning_trees.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # adj [G,N,N]
                ctypes.c_int64,  # G
                ctypes.c_int64,  # N
                ctypes.c_int64,  # S
                ctypes.c_uint64,  # seed
                ctypes.POINTER(ctypes.c_double),  # out [G,S,N,N]
            ]
            lib.snd_sample_spanning_trees.restype = ctypes.c_int
            lib.snd_pairwise_distances.argtypes = [
                ctypes.POINTER(ctypes.c_double),  # coords [G,N,D]
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),  # out [G,N,N]
            ]
            lib.snd_pairwise_distances.restype = ctypes.c_int
            _lib = lib
        except OSError:
            _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def sample_spanning_trees(adj: np.ndarray, num_samples: int, seed: int = 0) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    adj = np.ascontiguousarray(adj, dtype=np.float64)
    G, N = adj.shape[0], adj.shape[1]
    out = np.zeros((G, num_samples, N, N), dtype=np.float64)
    rc = lib.snd_sample_spanning_trees(
        adj.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        G, N, num_samples, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise RuntimeError(f"snd_sample_spanning_trees failed with code {rc}")
    return out


def pairwise_distances(coords: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native library unavailable"
    coords = np.ascontiguousarray(coords, dtype=np.float64)
    G, N, D = coords.shape
    out = np.zeros((G, N, N), dtype=np.float64)
    rc = lib.snd_pairwise_distances(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        G, N, D,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise RuntimeError(f"snd_pairwise_distances failed with code {rc}")
    return out


if __name__ == "__main__":
    ok = build(verbose=True)
    print("native build:", "ok" if ok else "FAILED")
