"""LZ4 frame codec via ctypes → system liblz4.

The reference stages UMI datasets as ``.zarr.tar.lz4`` archives produced and
consumed with the lz4 CLI (process_dataset/download_dataset.py:105-163,
extract_umi_data.py:9-63). Neither the CLI nor the python ``lz4`` package is
a dependency here; this binds the LZ4 *frame* API (the CLI's format) from the
system library, so staging works on any host with liblz4 installed.
"""

from __future__ import annotations

import ctypes
import io
import threading
from typing import BinaryIO, Optional

_LZ4F_VERSION = 100


class _Lib:
    _lib = None
    _lock = threading.Lock()

    @classmethod
    def get(cls):
        if cls._lib is None:
            with cls._lock:
                if cls._lib is None:
                    lib = None
                    for name in ("liblz4.so.1", "liblz4.so", "liblz4.dylib"):
                        try:
                            lib = ctypes.CDLL(name)
                            break
                        except OSError:
                            continue
                    if lib is None:  # pragma: no cover
                        raise RuntimeError("liblz4 not found")
                    lib.LZ4F_isError.restype = ctypes.c_uint
                    lib.LZ4F_isError.argtypes = [ctypes.c_size_t]
                    lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
                    lib.LZ4F_compressFrameBound.argtypes = [
                        ctypes.c_size_t, ctypes.c_void_p
                    ]
                    lib.LZ4F_compressFrame.restype = ctypes.c_size_t
                    lib.LZ4F_compressFrame.argtypes = [
                        ctypes.c_void_p, ctypes.c_size_t,
                        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
                    ]
                    lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
                    lib.LZ4F_createDecompressionContext.argtypes = [
                        ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint
                    ]
                    lib.LZ4F_freeDecompressionContext.restype = ctypes.c_size_t
                    lib.LZ4F_freeDecompressionContext.argtypes = [ctypes.c_void_p]
                    lib.LZ4F_decompress.restype = ctypes.c_size_t
                    lib.LZ4F_decompress.argtypes = [
                        ctypes.c_void_p,
                        ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
                        ctypes.c_void_p, ctypes.POINTER(ctypes.c_size_t),
                        ctypes.c_void_p,
                    ]
                    cls._lib = lib
        return cls._lib


def compress(data: bytes) -> bytes:
    """One-shot LZ4 frame compression (CLI-compatible output)."""
    lib = _Lib.get()
    src = ctypes.create_string_buffer(data, len(data))
    bound = lib.LZ4F_compressFrameBound(len(data), None)
    dst = ctypes.create_string_buffer(bound)
    rc = lib.LZ4F_compressFrame(dst, bound, src, len(data), None)
    if lib.LZ4F_isError(rc):
        raise ValueError("LZ4F_compressFrame failed")
    return dst.raw[:rc]


class FrameDecompressor(io.RawIOBase):
    """Streaming LZ4 frame reader usable as a file object (for tarfile)."""

    def __init__(
        self,
        fileobj: BinaryIO,
        chunk_size: int = 1 << 20,
        owns_fileobj: bool = False,
    ):
        self._f = fileobj
        self._owns_f = owns_fileobj
        self._chunk = chunk_size
        self._buf = b""
        self._src_rem = b""
        self._eof = False
        lib = _Lib.get()
        self._ctx = ctypes.c_void_p()
        rc = lib.LZ4F_createDecompressionContext(
            ctypes.byref(self._ctx), _LZ4F_VERSION
        )
        if lib.LZ4F_isError(rc):  # pragma: no cover
            raise ValueError("LZ4F context creation failed")

    def readable(self) -> bool:
        return True

    def _fill(self) -> None:
        """Decode source chunks into the buffer until bytes are produced or EOF.

        Always makes forward progress (consumes source) per call, so callers
        can loop on it safely even when the buffer is non-empty.
        """
        lib = _Lib.get()
        while not self._eof:
            if not self._src_rem:
                self._src_rem = self._f.read(self._chunk)
                if not self._src_rem:
                    self._eof = True
                    return
            src = ctypes.create_string_buffer(self._src_rem, len(self._src_rem))
            src_size = ctypes.c_size_t(len(self._src_rem))
            dst_cap = max(self._chunk, 4 * len(self._src_rem))
            dst = ctypes.create_string_buffer(dst_cap)
            dst_size = ctypes.c_size_t(dst_cap)
            rc = lib.LZ4F_decompress(
                self._ctx, dst, ctypes.byref(dst_size),
                src, ctypes.byref(src_size), None,
            )
            if lib.LZ4F_isError(rc):
                raise ValueError("LZ4F_decompress failed (corrupt frame?)")
            self._buf += dst.raw[: dst_size.value]
            self._src_rem = self._src_rem[src_size.value :]
            # rc == 0 marks a frame boundary, NOT end-of-stream: the lz4 CLI
            # produces concatenated frames (multi-part archives) and the
            # context decodes the next frame seamlessly. EOF only when the
            # underlying file is exhausted (empty read at the top).
            if dst_size.value:
                return

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            while not self._eof:
                self._fill()
            out, self._buf = self._buf, b""
            return out
        while len(self._buf) < n and not self._eof:
            self._fill()
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def close(self) -> None:
        lib = _Lib.get()
        if self._ctx:
            lib.LZ4F_freeDecompressionContext(self._ctx)
            self._ctx = ctypes.c_void_p()
        if self._owns_f:
            self._f.close()
        super().close()


def decompress(data: bytes) -> bytes:
    return FrameDecompressor(io.BytesIO(data)).read()


def open_frame(path_or_fileobj, mode: str = "rb") -> FrameDecompressor:
    if hasattr(path_or_fileobj, "read"):
        return FrameDecompressor(path_or_fileobj)
    return FrameDecompressor(open(path_or_fileobj, "rb"), owns_fileobj=True)
