"""Python bindings for the native shared-memory IPC primitives.

API equivalent of the reference's ``SharedMemoryRingBuffer`` /
``SharedMemoryQueue`` (umi/shared_memory/*): structured numpy records move
between real-time device processes through a lock-free SPMC ring (camera
frames, robot state) and an SPSC command queue (waypoint commands). The data
plane is the C++ library in native/shm_ipc.cpp (built on demand with g++).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libshm_ipc.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "shm_ipc.cpp")

_lib = None


def _build() -> str:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC_PATH,
         "-o", _SO_PATH, "-lrt"],
        check=True,
    )
    return _SO_PATH


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(
        _SRC_PATH
    ):
        _build()
    lib = ctypes.CDLL(_SO_PATH)
    lib.uva_ring_create.restype = ctypes.c_void_p
    lib.uva_ring_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64]
    lib.uva_ring_open.restype = ctypes.c_void_p
    lib.uva_ring_open.argtypes = [ctypes.c_char_p]
    lib.uva_ring_put.restype = ctypes.c_int
    lib.uva_ring_put.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.uva_ring_count.restype = ctypes.c_uint64
    lib.uva_ring_count.argtypes = [ctypes.c_void_p]
    lib.uva_ring_get_last_k.restype = ctypes.c_int64
    lib.uva_ring_get_last_k.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
    ]
    lib.uva_ring_close.argtypes = [ctypes.c_void_p]
    lib.uva_shm_unlink.argtypes = [ctypes.c_char_p]
    lib.uva_queue_create.restype = ctypes.c_void_p
    lib.uva_queue_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64]
    lib.uva_queue_open.restype = ctypes.c_void_p
    lib.uva_queue_open.argtypes = [ctypes.c_char_p]
    lib.uva_queue_push.restype = ctypes.c_int
    lib.uva_queue_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
    lib.uva_queue_pop.restype = ctypes.c_int
    lib.uva_queue_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.uva_queue_size.restype = ctypes.c_uint64
    lib.uva_queue_size.argtypes = [ctypes.c_void_p]
    lib.uva_queue_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _record_dtype(examples: Dict[str, np.ndarray]) -> np.dtype:
    fields = []
    for k in sorted(examples):
        v = np.asarray(examples[k])
        fields.append((k, v.dtype, v.shape))
    return np.dtype(fields)


class SharedMemoryRingBuffer:
    """Single-writer / multi-reader ring of structured records."""

    def __init__(self, name: str, examples: Dict[str, np.ndarray],
                 get_max_k: int = 32, buffer_size: Optional[int] = None,
                 create: bool = True):
        self.name = name.encode()
        self.dtype = _record_dtype(examples)
        self.slot_bytes = self.dtype.itemsize
        self.n_slots = buffer_size or max(get_max_k * 4, 64)
        lib = get_lib()
        if create:
            self.handle = lib.uva_ring_create(self.name, self.slot_bytes, self.n_slots)
        else:
            self.handle = lib.uva_ring_open(self.name)
        assert self.handle, f"failed to map ring {name}"

    @classmethod
    def open(cls, name: str, examples: Dict[str, np.ndarray]) -> "SharedMemoryRingBuffer":
        return cls(name, examples, create=False)

    @property
    def count(self) -> int:
        return int(get_lib().uva_ring_count(self.handle))

    def put(self, data: Dict[str, np.ndarray]) -> None:
        rec = np.zeros(1, dtype=self.dtype)
        for k, v in data.items():
            rec[0][k] = v
        buf = rec.tobytes()
        r = get_lib().uva_ring_put(self.handle, buf, len(buf))
        assert r == 0, "record larger than slot"

    def get(self) -> Dict[str, np.ndarray]:
        return self.get_last_k(1)

    def get_last_k(self, k: int, retries: int = 8) -> Dict[str, np.ndarray]:
        lib = get_lib()
        out = np.zeros(k, dtype=self.dtype)
        for _ in range(retries):
            n = lib.uva_ring_get_last_k(
                self.handle, out.ctypes.data_as(ctypes.c_void_p), k
            )
            if n >= 0:
                got = out[:n]
                return {name: np.ascontiguousarray(got[name]) for name in self.dtype.names}
        raise RuntimeError("ring buffer read kept getting lapped by the writer")

    def close(self, unlink: bool = False) -> None:
        lib = get_lib()
        lib.uva_ring_close(self.handle)
        if unlink:
            lib.uva_shm_unlink(self.name)


class SharedMemoryQueue:
    """Single-producer / single-consumer queue of structured records."""

    def __init__(self, name: str, examples: Dict[str, np.ndarray],
                 buffer_size: int = 256, create: bool = True):
        self.name = name.encode()
        self.dtype = _record_dtype(examples)
        self.slot_bytes = self.dtype.itemsize
        lib = get_lib()
        if create:
            self.handle = lib.uva_queue_create(self.name, self.slot_bytes, buffer_size)
        else:
            self.handle = lib.uva_queue_open(self.name)
        assert self.handle, f"failed to map queue {name}"

    @classmethod
    def open(cls, name: str, examples: Dict[str, np.ndarray]) -> "SharedMemoryQueue":
        return cls(name, examples, create=False)

    def qsize(self) -> int:
        return int(get_lib().uva_queue_size(self.handle))

    def put(self, data: Dict[str, np.ndarray]) -> bool:
        rec = np.zeros(1, dtype=self.dtype)
        for k, v in data.items():
            rec[0][k] = v
        buf = rec.tobytes()
        return get_lib().uva_queue_push(self.handle, buf, len(buf)) == 0

    def get(self) -> Optional[Dict[str, np.ndarray]]:
        out = np.zeros(1, dtype=self.dtype)
        r = get_lib().uva_queue_pop(self.handle, out.ctypes.data_as(ctypes.c_void_p))
        if r != 0:
            return None
        return {name: np.ascontiguousarray(out[0][name]) for name in self.dtype.names}

    def close(self, unlink: bool = False) -> None:
        lib = get_lib()
        lib.uva_queue_close(self.handle)
        if unlink:
            lib.uva_shm_unlink(self.name)
