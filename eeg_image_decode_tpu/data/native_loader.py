"""ctypes binding for the native C++ loading engine (``native/eid_loader.cpp``).

Provides:

- :class:`GatherPool` — persistent worker-pool row gather. ``submit`` is
  asynchronous: the C++ threads copy ``src[idx]`` into a caller-owned staging
  buffer while Python keeps running (no GIL); ``wait`` blocks until done.
  This is what lets ``PrefetchLoader`` overlap batch assembly with device
  compute — numpy's fancy indexing is single-threaded *and* blocks the
  dispatch thread.
- :class:`NpyMmap` — dependency-free ``.npy`` reader over ``mmap`` with
  ``madvise(WILLNEED)`` readahead, exposed as a zero-copy numpy view.

The shared library builds on demand with ``g++`` (cached next to the
source); every entry point degrades to numpy when the toolchain or platform
is unavailable, so nothing above this module needs to care
(``native_available()`` reports which path is active).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "eid_loader.cpp",
)
_SO = os.path.join(os.path.dirname(_SRC), "build", "libeid_loader.so")

_lib = None
_lib_lock = threading.Lock()
_build_error: str | None = None


def _build() -> str | None:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=120
        )
    except (OSError, subprocess.TimeoutExpired) as e:
        return f"{type(e).__name__}: {e}"
    if proc.returncode != 0:
        return proc.stderr[-2000:]
    return None


def _load():
    """Build (if needed) and dlopen the library; None if unavailable."""
    global _lib, _build_error
    with _lib_lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            err = _build()
            if err is not None:
                _build_error = err
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            _build_error = str(e)
            return None
        lib.eid_pool_create.restype = ctypes.c_void_p
        lib.eid_pool_create.argtypes = [ctypes.c_int]
        lib.eid_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.eid_gather_submit.restype = ctypes.c_int64
        lib.eid_gather_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.eid_gather_wait.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.eid_gather_rows.argtypes = lib.eid_gather_submit.argtypes
        lib.eid_npy_map.restype = ctypes.c_void_p
        lib.eid_npy_map.argtypes = [ctypes.c_char_p]
        lib.eid_npy_ndim.restype = ctypes.c_int
        lib.eid_npy_ndim.argtypes = [ctypes.c_void_p]
        lib.eid_npy_shape.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.eid_npy_descr.restype = ctypes.c_char_p
        lib.eid_npy_descr.argtypes = [ctypes.c_void_p]
        lib.eid_npy_data.restype = ctypes.c_void_p
        lib.eid_npy_data.argtypes = [ctypes.c_void_p]
        lib.eid_npy_willneed.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.eid_npy_unmap.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    """The toolchain/platform error that disabled the native path, if any."""
    _load()
    return _build_error


class GatherPool:
    """Multithreaded row gather with async submit/wait.

    Falls back to synchronous numpy fancy indexing when the native library
    is unavailable (``submit`` then performs the copy immediately and
    ``wait`` is a no-op).
    """

    def __init__(self, n_threads: int = 0):
        self._lib = _load()
        self._pool = (
            self._lib.eid_pool_create(n_threads) if self._lib else None
        )
        # keep (src, idx, dst) alive until their ticket is waited on
        self._live: dict[int, tuple] = {}

    @property
    def is_native(self) -> bool:
        return self._pool is not None

    def submit(self, src: np.ndarray, idx: np.ndarray,
               dst: np.ndarray) -> int:
        """Start ``dst[:len(idx)] = src[idx]`` (first-axis gather)."""
        n = len(idx)
        if self._pool is None:
            dst[:n] = src[idx]  # faster than np.take(..., out=) (measured)
            return 0
        src = np.ascontiguousarray(src)
        idx64 = np.ascontiguousarray(idx, dtype=np.int64)
        # explicit checks, not asserts: these guard a raw native memcpy —
        # under `python -O` an assert would vanish and a mismatched dst
        # would silently corrupt training batches
        if not dst.flags["C_CONTIGUOUS"]:
            raise ValueError("gather dst must be C-contiguous")
        if dst.dtype != src.dtype:
            raise ValueError(
                f"gather dst dtype {dst.dtype} != src dtype {src.dtype}"
            )
        if dst.shape[1:] != src.shape[1:] or len(dst) < n:
            raise ValueError(
                f"gather dst shape {dst.shape} incompatible with src "
                f"{src.shape} for {n} rows"
            )
        row_bytes = src.dtype.itemsize * int(
            np.prod(src.shape[1:], dtype=np.int64)
        )
        ticket = self._lib.eid_gather_submit(
            self._pool,
            src.ctypes.data_as(ctypes.c_void_p),
            dst.ctypes.data_as(ctypes.c_void_p),
            idx64.ctypes.data_as(ctypes.c_void_p),
            n,
            row_bytes,
        )
        self._live[ticket] = (src, idx64, dst)
        return ticket

    def wait(self, ticket: int) -> None:
        if self._pool is None:
            return
        self._lib.eid_gather_wait(self._pool, ticket)
        self._live.pop(ticket, None)

    def gather(self, src: np.ndarray, idx: np.ndarray) -> np.ndarray:
        """Synchronous convenience: returns a fresh ``src[idx]``."""
        dst = np.empty((len(idx),) + src.shape[1:], src.dtype)
        self.wait(self.submit(src, idx, dst))
        return dst

    def close(self) -> None:
        if self._pool is not None:
            self._lib.eid_pool_destroy(self._pool)
            self._pool = None
            self._live.clear()

    def __del__(self):  # best-effort; close() is the real API
        try:
            self.close()
        except Exception:
            pass


_shared_pool: GatherPool | None = None
_shared_pool_lock = threading.Lock()


def shared_pool() -> GatherPool:
    """Process-wide gather pool. Loaders default to this so N loaders don't
    spawn N × hardware_concurrency worker threads; it is never closed."""
    global _shared_pool
    with _shared_pool_lock:
        if _shared_pool is None:
            _shared_pool = GatherPool()
        return _shared_pool


class NpyMmap:
    """A ``.npy`` file as a zero-copy numpy view over mmap.

    ``willneed(row0, n_rows)`` issues kernel readahead for a first-axis row
    range (e.g. the slice the next epoch touches). Falls back to
    ``np.load(mmap_mode="r")`` without the readahead hint.
    """

    def __init__(self, path: str):
        self._lib = _load()
        self._handle = None
        if self._lib is not None:
            h = self._lib.eid_npy_map(path.encode())
            if h:
                self._handle = ctypes.c_void_p(h)
        if self._handle is not None:
            ndim = self._lib.eid_npy_ndim(self._handle)
            shape = (ctypes.c_int64 * ndim)()
            self._lib.eid_npy_shape(self._handle, shape)
            descr = self._lib.eid_npy_descr(self._handle).decode()
            dtype = np.dtype(descr)
            n = int(np.prod(shape, dtype=np.int64)) if ndim else 1
            buf = (ctypes.c_char * (n * dtype.itemsize)).from_address(
                self._lib.eid_npy_data(self._handle)
            )
            self.array = np.frombuffer(buf, dtype=dtype).reshape(
                tuple(shape)
            )
            # the mapping is PROT_READ — a write through the view would
            # segfault instead of raising without this
            self.array.flags.writeable = False
        else:
            self.array = np.load(path, mmap_mode="r")

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def willneed(self, row0: int = 0, n_rows: int | None = None) -> None:
        if self._handle is None:
            return
        if n_rows is None:
            n_rows = self.array.shape[0] - row0
        row_bytes = self.array.dtype.itemsize * int(
            np.prod(self.array.shape[1:], dtype=np.int64)
        )
        self._lib.eid_npy_willneed(self._handle, row_bytes, row0, n_rows)

    def close(self) -> None:
        if self._handle is not None:
            self.array = None
            self._lib.eid_npy_unmap(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
