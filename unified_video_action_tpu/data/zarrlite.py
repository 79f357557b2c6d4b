"""Minimal from-scratch zarr v2 reader/writer.

The reference stores every dataset and cache as zarr v2: UMI episode stores are
zarr directory trees read lazily per index (reference
dataset/umi_lazy_dataset.py:298-300), and robomimic/libero image caches are
``zarr.ZipStore`` files whose image arrays are compressed with the
``imagecodecs_jpeg2k`` numcodec at level=50
(reference dataset/robomimic_replay_image_dataset.py:80-87,367 and
codecs/imagecodecs_numcodecs.py:36-1367). Neither ``zarr`` nor ``imagecodecs``
is part of this framework's dependency set, so this module implements the v2
storage format directly:

- stores: directory trees, zip files, and in-memory dicts
- metadata: ``.zgroup`` / ``.zarray`` / ``.zattrs`` JSON documents
- codecs: blosc (ctypes → system libblosc), zstd (ctypes → libzstd),
  zlib/gzip/bz2/lzma (stdlib), and JPEG 2000 (PIL/OpenJPEG) under the
  reference's ``imagecodecs_jpeg2k`` codec id

Arrays are lazy: chunks decompress on access with a small LRU cache, which is
what makes the UMI multi-dataset path stream from disk instead of
materializing hundreds of GB (reference base_lazy_dataset.py:19-122 reads
per-index).

The subset implemented is exactly what the reference data layer exercises:
C-order arrays, basic int/slice indexing plus integer-array indexing on axis
0, ``.`` or ``/`` dimension separators, nested groups, and attrs.
"""

from __future__ import annotations

import bz2
import ctypes
import io
import json
import lzma
import os
import struct
import threading
import zipfile
import zlib
from collections import OrderedDict
from typing import Any, Dict, Iterator, List, Optional, Tuple, Union

import numpy as np

# ---------------------------------------------------------------------------
# Codecs
# ---------------------------------------------------------------------------


class _Blosc:
    """ctypes binding to the system libblosc (c-blosc1 format)."""

    _lib = None
    _lock = threading.Lock()

    @classmethod
    def lib(cls):
        if cls._lib is None:
            with cls._lock:
                if cls._lib is None:
                    lib = None
                    for name in ("libblosc.so.1", "libblosc.so", "libblosc.dylib"):
                        try:
                            lib = ctypes.CDLL(name)
                            break
                        except OSError:
                            continue
                    if lib is None:  # pragma: no cover - env always has it
                        raise RuntimeError(
                            "libblosc not found; blosc-compressed zarr chunks "
                            "cannot be read"
                        )
                    lib.blosc_compress_ctx.restype = ctypes.c_int
                    lib.blosc_compress_ctx.argtypes = [
                        ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
                        ctypes.c_size_t, ctypes.c_void_p, ctypes.c_void_p,
                        ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t,
                        ctypes.c_int,
                    ]
                    lib.blosc_decompress_ctx.restype = ctypes.c_int
                    lib.blosc_decompress_ctx.argtypes = [
                        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                        ctypes.c_int,
                    ]
                    lib.blosc_cbuffer_sizes.restype = None
                    lib.blosc_cbuffer_sizes.argtypes = [
                        ctypes.c_void_p,
                        ctypes.POINTER(ctypes.c_size_t),
                        ctypes.POINTER(ctypes.c_size_t),
                        ctypes.POINTER(ctypes.c_size_t),
                    ]
                    cls._lib = lib
        return cls._lib

    @classmethod
    def decompress(cls, buf: bytes) -> bytes:
        lib = cls.lib()
        nbytes = ctypes.c_size_t()
        cbytes = ctypes.c_size_t()
        blocksize = ctypes.c_size_t()
        src = ctypes.create_string_buffer(buf, len(buf))
        lib.blosc_cbuffer_sizes(
            src, ctypes.byref(nbytes), ctypes.byref(cbytes), ctypes.byref(blocksize)
        )
        out = ctypes.create_string_buffer(nbytes.value)
        rc = lib.blosc_decompress_ctx(src, out, nbytes.value, 1)
        if rc <= 0:
            raise ValueError(f"blosc decompress failed (rc={rc})")
        return out.raw[:rc]

    @classmethod
    def compress(
        cls,
        data: bytes,
        typesize: int = 1,
        cname: str = "lz4",
        clevel: int = 5,
        shuffle: int = 1,
        blocksize: int = 0,
    ) -> bytes:
        lib = cls.lib()
        src = ctypes.create_string_buffer(data, len(data))
        destsize = len(data) + 16  # BLOSC_MAX_OVERHEAD
        out = ctypes.create_string_buffer(destsize)
        rc = lib.blosc_compress_ctx(
            clevel, shuffle, max(typesize, 1), len(data), src, out, destsize,
            cname.encode(), blocksize, 1,
        )
        if rc <= 0:
            raise ValueError(f"blosc compress failed (rc={rc})")
        return out.raw[:rc]


class _Zstd:
    _lib = None
    _lock = threading.Lock()

    @classmethod
    def lib(cls):
        if cls._lib is None:
            with cls._lock:
                if cls._lib is None:
                    lib = None
                    for name in ("libzstd.so.1", "libzstd.so", "libzstd.dylib"):
                        try:
                            lib = ctypes.CDLL(name)
                            break
                        except OSError:
                            continue
                    if lib is None:  # pragma: no cover
                        raise RuntimeError("libzstd not found")
                    lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
                    lib.ZSTD_getFrameContentSize.argtypes = [
                        ctypes.c_void_p, ctypes.c_size_t
                    ]
                    lib.ZSTD_decompress.restype = ctypes.c_size_t
                    lib.ZSTD_decompress.argtypes = [
                        ctypes.c_void_p, ctypes.c_size_t,
                        ctypes.c_void_p, ctypes.c_size_t,
                    ]
                    lib.ZSTD_compressBound.restype = ctypes.c_size_t
                    lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
                    lib.ZSTD_compress.restype = ctypes.c_size_t
                    lib.ZSTD_compress.argtypes = [
                        ctypes.c_void_p, ctypes.c_size_t,
                        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
                    ]
                    lib.ZSTD_isError.restype = ctypes.c_uint
                    lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
                    cls._lib = lib
        return cls._lib

    @classmethod
    def decompress(cls, buf: bytes) -> bytes:
        lib = cls.lib()
        src = ctypes.create_string_buffer(buf, len(buf))
        size = lib.ZSTD_getFrameContentSize(src, len(buf))
        if size in (2**64 - 1, 2**64 - 2):  # ERROR / UNKNOWN
            raise ValueError("zstd frame with unknown content size")
        out = ctypes.create_string_buffer(int(size))
        rc = lib.ZSTD_decompress(out, int(size), src, len(buf))
        if lib.ZSTD_isError(rc):
            raise ValueError("zstd decompress failed")
        return out.raw[:rc]

    @classmethod
    def compress(cls, data: bytes, level: int = 1) -> bytes:
        lib = cls.lib()
        src = ctypes.create_string_buffer(data, len(data))
        bound = lib.ZSTD_compressBound(len(data))
        out = ctypes.create_string_buffer(bound)
        rc = lib.ZSTD_compress(out, bound, src, len(data), level)
        if lib.ZSTD_isError(rc):
            raise ValueError("zstd compress failed")
        return out.raw[:rc]


def _jpeg2k_decode(buf: bytes) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(bytes(buf)))
    return np.asarray(img)


def _jpeg2k_encode(arr: np.ndarray, level: Optional[int]) -> bytes:
    """Encode an image array as a raw JPEG 2000 codestream.

    Mirrors the reference codec's semantics (imagecodecs_numcodecs.py Jpeg2k):
    axes of size 1 are squeezed before encoding; ``level`` is a PSNR-style
    quality knob (level=50 in the reference caches → visually lossless).
    """
    from PIL import Image

    arr = np.asarray(arr)
    squeeze_axes = tuple(
        i for i, s in enumerate(arr.shape[:-2]) if s == 1 and arr.ndim > 2
    )
    if squeeze_axes:
        arr = arr.squeeze(axis=squeeze_axes)
    img = Image.fromarray(arr)
    bio = io.BytesIO()
    if level is None:
        img.save(bio, format="JPEG2000", irreversible=False)
    else:
        img.save(
            bio, format="JPEG2000", irreversible=True,
            quality_mode="dB", quality_layers=[float(level)],
        )
    return bio.getvalue()


class Codec:
    """A zarr v2 compressor: bytes <-> bytes (or ndarray for image codecs)."""

    def __init__(self, config: Dict[str, Any]):
        self.config = dict(config)

    def decode(self, buf: bytes):
        raise NotImplementedError

    def encode(self, data: bytes) -> bytes:
        raise NotImplementedError

    def get_config(self) -> Dict[str, Any]:
        return dict(self.config)


class BloscCodec(Codec):
    def decode(self, buf):
        return _Blosc.decompress(buf)

    def encode(self, data, typesize: int = 1):
        c = self.config
        return _Blosc.compress(
            data,
            typesize=typesize,
            cname=c.get("cname", "lz4"),
            clevel=int(c.get("clevel", 5)),
            shuffle=int(c.get("shuffle", 1)),
            blocksize=int(c.get("blocksize", 0) or 0),
        )


class ZstdCodec(Codec):
    def decode(self, buf):
        return _Zstd.decompress(buf)

    def encode(self, data, typesize: int = 1):
        return _Zstd.compress(data, level=int(self.config.get("level", 1)))


class ZlibCodec(Codec):
    def decode(self, buf):
        return zlib.decompress(bytes(buf))

    def encode(self, data, typesize: int = 1):
        return zlib.compress(bytes(data), int(self.config.get("level", 1)))


class GzipCodec(Codec):
    def decode(self, buf):
        return zlib.decompress(bytes(buf), wbits=31)

    def encode(self, data, typesize: int = 1):
        co = zlib.compressobj(int(self.config.get("level", 1)), wbits=31)
        return co.compress(bytes(data)) + co.flush()


class Bz2Codec(Codec):
    def decode(self, buf):
        return bz2.decompress(bytes(buf))

    def encode(self, data, typesize: int = 1):
        return bz2.compress(bytes(data), int(self.config.get("level", 1)))


class LzmaCodec(Codec):
    def decode(self, buf):
        return lzma.decompress(bytes(buf))

    def encode(self, data, typesize: int = 1):
        return lzma.compress(bytes(data))


class Jpeg2kCodec(Codec):
    """Reference ``imagecodecs_jpeg2k`` numcodec (level=50 in image caches)."""

    is_image_codec = True

    def decode(self, buf):
        return _jpeg2k_decode(buf)

    def encode(self, data, typesize: int = 1):
        return _jpeg2k_encode(data, self.config.get("level"))


_CODECS = {
    "blosc": BloscCodec,
    "zstd": ZstdCodec,
    "zlib": ZlibCodec,
    "gzip": GzipCodec,
    "bz2": Bz2Codec,
    "lzma": LzmaCodec,
    "imagecodecs_jpeg2k": Jpeg2kCodec,
    "imagecodecs_blosc": BloscCodec,
    "imagecodecs_zlib": ZlibCodec,
    "imagecodecs_zstd": ZstdCodec,
}


def get_codec(config: Optional[Dict[str, Any]]) -> Optional[Codec]:
    if config is None:
        return None
    cid = config.get("id")
    if cid not in _CODECS:
        raise ValueError(
            f"unsupported zarr compressor {cid!r}; supported: {sorted(_CODECS)}"
        )
    return _CODECS[cid](config)


# ---------------------------------------------------------------------------
# Stores
# ---------------------------------------------------------------------------


class Store:
    """bytes-keyed KV store; keys use '/' separators."""

    def get(self, key: str) -> Optional[bytes]:
        raise NotImplementedError

    def set(self, key: str, value: bytes) -> None:
        raise NotImplementedError

    def list_prefix(self, prefix: str) -> List[str]:
        raise NotImplementedError

    def delete(self, key: str) -> None:
        """Remove a key if present (no-op when absent). Append-only stores
        may refuse."""
        raise NotImplementedError

    def close(self) -> None:
        pass

    def __contains__(self, key: str) -> bool:
        return self.get(key) is not None


class MemoryStore(Store):
    def __init__(self):
        self._d: Dict[str, bytes] = {}

    def get(self, key):
        return self._d.get(key)

    def set(self, key, value):
        self._d[key] = bytes(value)

    def delete(self, key):
        self._d.pop(key, None)

    def list_prefix(self, prefix):
        return [k for k in self._d if k.startswith(prefix)]


class DirectoryStore(Store):
    def __init__(self, root: str):
        self.root = os.path.abspath(root)

    def _path(self, key: str) -> str:
        return os.path.join(self.root, *key.split("/"))

    def get(self, key):
        p = self._path(key)
        if not os.path.isfile(p):
            return None
        with open(p, "rb") as f:
            return f.read()

    def set(self, key, value):
        p = self._path(key)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(value)

    def delete(self, key):
        p = self._path(key)
        if os.path.isfile(p):
            os.remove(p)

    def list_prefix(self, prefix):
        base = self._path(prefix) if prefix else self.root
        out = []
        for dirpath, _dirnames, filenames in os.walk(base):
            rel = os.path.relpath(dirpath, self.root)
            rel = "" if rel == "." else rel.replace(os.sep, "/") + "/"
            for fn in filenames:
                out.append(rel + fn)
        return out


class ZipStore(Store):
    """Read/write zarr-in-a-zip (reference cache format, ``*.zarr.zip``)."""

    def __init__(self, path: str, mode: str = "r"):
        self.path = path
        self.mode = mode
        self._zf = zipfile.ZipFile(
            path, mode=mode,
            compression=zipfile.ZIP_STORED,  # chunks are already compressed
        )
        # "a" on an existing archive must see its entries (mode "w" truncates,
        # so only there is the listing empty by construction)
        self._names = set(self._zf.namelist()) if mode != "w" else set()
        self._lock = threading.Lock()
        self._pid = os.getpid()

    def _handle(self) -> zipfile.ZipFile:
        # Fork safety: a child inherits the parent's file descriptor, and
        # concurrent seek+read through a shared fd races across processes
        # (the in-process lock can't help). Reopen per process.
        if os.getpid() != self._pid:
            self._zf = zipfile.ZipFile(self.path, mode="r")
            self._pid = os.getpid()
            self._lock = threading.Lock()
        return self._zf

    def get(self, key):
        if key not in self._names:
            return None
        zf = self._handle()
        with self._lock:
            try:
                return zf.read(key)
            except KeyError:
                return None

    def set(self, key, value):
        assert self.mode != "r", "store opened read-only"
        with self._lock:
            self._zf.writestr(key, bytes(value))
            self._names.add(key)

    def list_prefix(self, prefix):
        return [k for k in self._names if k.startswith(prefix)]

    def close(self):
        self._zf.close()


# ---------------------------------------------------------------------------
# Arrays and groups
# ---------------------------------------------------------------------------


def _norm_path(*parts: str) -> str:
    segs = [s for p in parts for s in p.split("/") if s]
    return "/".join(segs)


class Attrs:
    def __init__(self, store: Store, path: str):
        self._store = store
        self._key = _norm_path(path, ".zattrs") if path else ".zattrs"
        self._cache: Optional[Dict[str, Any]] = None

    def asdict(self) -> Dict[str, Any]:
        if self._cache is None:
            raw = self._store.get(self._key)
            self._cache = json.loads(raw) if raw else {}
        return self._cache

    def __getitem__(self, k):
        return self.asdict()[k]

    def get(self, k, default=None):
        return self.asdict().get(k, default)

    def __contains__(self, k):
        return k in self.asdict()

    def __setitem__(self, k, v):
        d = self.asdict()
        d[k] = v
        self._store.set(self._key, json.dumps(d).encode())

    def update(self, other: Dict[str, Any]):
        d = self.asdict()
        d.update(other)
        self._store.set(self._key, json.dumps(d).encode())


class ZarrArray:
    """Lazy chunked zarr v2 array with an LRU decoded-chunk cache."""

    def __init__(self, store: Store, path: str, cache_chunks: int = 64):
        self.store = store
        self.path = path
        meta_raw = store.get(_norm_path(path, ".zarray"))
        if meta_raw is None:
            raise KeyError(f"no .zarray at {path!r}")
        meta = json.loads(meta_raw)
        if meta.get("zarr_format") != 2:
            raise ValueError(f"only zarr v2 supported, got {meta.get('zarr_format')}")
        self.shape: Tuple[int, ...] = tuple(meta["shape"])
        self.chunks: Tuple[int, ...] = tuple(meta["chunks"])
        self.dtype = np.dtype(meta["dtype"])
        if meta.get("order", "C") != "C":
            raise ValueError("only C-order zarr arrays supported")
        if meta.get("filters"):
            raise ValueError(f"zarr filters unsupported: {meta['filters']}")
        self.fill_value = meta.get("fill_value")
        self._sep = meta.get("dimension_separator", ".")
        self.compressor = get_codec(meta.get("compressor"))
        self.attrs = Attrs(store, path)
        self._cache: "OrderedDict[Tuple[int, ...], np.ndarray]" = OrderedDict()
        self._cache_max = cache_chunks
        self._lock = threading.Lock()

    @property
    def ndim(self) -> int:
        return len(self.shape)

    @property
    def size(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1

    @property
    def nbytes(self) -> int:
        return self.size * self.dtype.itemsize

    def __len__(self) -> int:
        return self.shape[0]

    # -- chunk access --------------------------------------------------------

    def _chunk_key(self, cidx: Tuple[int, ...]) -> str:
        name = self._sep.join(str(i) for i in cidx) if cidx else "0"
        return _norm_path(self.path, name)

    def _fill_chunk(self) -> np.ndarray:
        fv = self.fill_value
        if fv is None:
            fv = 0
        elif isinstance(fv, str) and fv.lower() == "nan":
            fv = np.nan
        return np.full(self.chunks, fv, dtype=self.dtype)

    def _read_chunk(self, cidx: Tuple[int, ...]) -> np.ndarray:
        with self._lock:
            hit = self._cache.get(cidx)
            if hit is not None:
                self._cache.move_to_end(cidx)
                return hit
        raw = self.store.get(self._chunk_key(cidx))
        if raw is None:
            chunk = self._fill_chunk()
        else:
            if self.compressor is None:
                decoded: Union[bytes, np.ndarray] = raw
            else:
                decoded = self.compressor.decode(raw)
            if isinstance(decoded, np.ndarray):
                # image codec: squeezed shape back to chunk shape
                chunk = decoded.astype(self.dtype, copy=False).reshape(self.chunks)
            else:
                chunk = np.frombuffer(decoded, dtype=self.dtype).reshape(self.chunks)
        with self._lock:
            self._cache[cidx] = chunk
            while len(self._cache) > self._cache_max:
                self._cache.popitem(last=False)
        return chunk

    # -- indexing -------------------------------------------------------------

    def __getitem__(self, key) -> np.ndarray:
        if not isinstance(key, tuple):
            key = (key,)
        if any(k is Ellipsis for k in key):
            i = key.index(Ellipsis)
            key = key[:i] + (slice(None),) * (self.ndim - len(key) + 1) + key[i + 1:]
        key = key + (slice(None),) * (self.ndim - len(key))

        # integer-array indexing on axis 0 (UMI per-index gather)
        if len(key) >= 1 and isinstance(key[0], (list, np.ndarray)):
            idx0 = np.asarray(key[0])
            assert idx0.ndim == 1, "only 1-D integer-array indexing on axis 0"
            rest = key[1:]
            return np.stack([self[(int(i),) + rest] for i in idx0])

        sel: List[Tuple[int, int]] = []  # (start, stop) per dim
        drop_axes: List[int] = []
        for d, k in enumerate(key):
            n = self.shape[d]
            if isinstance(k, (int, np.integer)):
                i = int(k)
                if i < 0:
                    i += n
                if not 0 <= i < n:
                    raise IndexError(f"index {k} out of bounds for axis {d} ({n})")
                sel.append((i, i + 1))
                drop_axes.append(d)
            elif isinstance(k, slice):
                start, stop, step = k.indices(n)
                if step != 1:
                    # rare path: materialize the covered contiguous range,
                    # then apply the stepped slice re-based onto it (for a
                    # negative step the range is [stop+1, start+1) walked
                    # backwards from its last element)
                    if step > 0:
                        lo, hi = start, stop
                        sub = slice(None, None, step)
                    else:
                        lo, hi = stop + 1, start + 1
                        sub = slice(start - lo, None, step)
                    base = self[
                        tuple(key[:d])
                        + (slice(lo, max(hi, lo)),)
                        + tuple(key[d + 1:])
                    ]
                    return base[
                        (slice(None),) * (d - len(drop_axes)) + (sub,)
                    ]
                sel.append((start, stop))
            else:
                raise TypeError(f"unsupported index {k!r}")

        out_shape = [stop - start for start, stop in sel]
        out = np.empty(out_shape, dtype=self.dtype)
        if out.size:
            first = [start // c for (start, _), c in zip(sel, self.chunks)]
            last = [
                max((stop - 1) // c, start // c)
                for (start, stop), c in zip(sel, self.chunks)
            ]
            for cidx in np.ndindex(*[l - f + 1 for f, l in zip(first, last)]):
                cidx = tuple(f + i for f, i in zip(first, cidx))
                chunk = self._read_chunk(cidx)
                src, dst = [], []
                for d, ((start, stop), c) in enumerate(zip(sel, self.chunks)):
                    c0 = cidx[d] * c
                    s0 = max(start, c0)
                    s1 = min(stop, c0 + c)
                    src.append(slice(s0 - c0, s1 - c0))
                    dst.append(slice(s0 - start, s1 - start))
                out[tuple(dst)] = chunk[tuple(src)]
        if drop_axes:
            out = out.reshape(
                [s for d, s in enumerate(out_shape) if d not in drop_axes]
            )
        return out

    def __array__(self, dtype=None, copy=None):
        arr = self[(slice(None),) * self.ndim] if self.ndim else self[()]
        if dtype is not None:
            arr = arr.astype(dtype)
        return arr

    # -- writing ---------------------------------------------------------------

    def _normalize_write_key(self, key):
        """Basic-index write selection -> ([(start, stop)]*ndim, squeeze_dims).

        Supports ints, unit-step slices and Ellipsis — the shapes episode /
        chunk streaming needs. Fancy indexing stays read-only."""
        if key is Ellipsis:
            key = ()
        if not isinstance(key, tuple):
            key = (key,)
        if Ellipsis in key:
            i = key.index(Ellipsis)
            key = (
                key[:i]
                + (slice(None),) * (self.ndim - (len(key) - 1))
                + key[i + 1:]
            )
        key = key + (slice(None),) * (self.ndim - len(key))
        if len(key) != self.ndim:
            raise IndexError(f"too many indices for {self.ndim}-d array")
        sel, squeeze = [], []
        for d, (k, s) in enumerate(zip(key, self.shape)):
            if isinstance(k, (int, np.integer)):
                k = int(k) + (s if k < 0 else 0)
                if not 0 <= k < s:
                    raise IndexError(f"index {k} out of bounds for dim {d}")
                sel.append((k, k + 1))
                squeeze.append(d)
            elif isinstance(k, slice):
                if k.step not in (None, 1):
                    raise NotImplementedError("strided writes unsupported")
                start, stop, _ = k.indices(s)
                sel.append((start, max(stop, start)))
            else:
                raise NotImplementedError(
                    f"unsupported write index {type(k).__name__}"
                )
        return sel, squeeze

    def __setitem__(self, key, value) -> None:
        """Region writes on any basic-index selection: chunks fully covered by
        the region are written directly; partially covered chunks are
        read-modified-written. This is what makes chunk-incremental
        conversion/recording of larger-than-RAM stores possible (reference
        behavior: zarr-python writers in
        robomimic_replay_image_dataset.py:262-380)."""
        sel, squeeze = self._normalize_write_key(key)
        sel_shape = tuple(stop - start for start, stop in sel)
        value = np.asarray(value, dtype=self.dtype)
        vshape = tuple(
            s for d, s in enumerate(sel_shape) if d not in squeeze
        )
        value = np.broadcast_to(value, vshape).reshape(sel_shape)
        if 0 in sel_shape:
            return
        first = [start // c for (start, _), c in zip(sel, self.chunks)]
        last = [
            (stop - 1) // c for (start, stop), c in zip(sel, self.chunks)
        ]
        for cidx in np.ndindex(*[l - f + 1 for f, l in zip(first, last)]):
            cidx = tuple(f + i for f, i in zip(first, cidx))
            src, dst, covered = [], [], True
            for d, ((start, stop), c, s) in enumerate(
                zip(sel, self.chunks, self.shape)
            ):
                c0 = cidx[d] * c
                c1 = min(c0 + c, s)
                s0, s1 = max(start, c0), min(stop, c1)
                dst.append(slice(s0 - c0, s1 - c0))
                src.append(slice(s0 - start, s1 - start))
                if s0 > c0 or s1 < c1:
                    covered = False
            if covered:
                # whole live extent of the chunk covered: no read needed
                chunk = self._fill_chunk()
            else:
                chunk = self._read_chunk(cidx).copy()
            chunk[tuple(dst)] = value[tuple(src)]
            self._write_chunk(cidx, chunk)

    def resize(self, *new_shape) -> None:
        """Grow/shrink the array (zarr-python ``Array.resize`` semantics,
        tightened): regions newly exposed by a later re-grow read as
        fill_value — on shrink, chunks wholly outside the new shape are
        deleted and boundary chunks have their out-of-bounds tails
        overwritten with fill_value (zarr-python deletes but leaves stale
        edge-chunk tails). Chunk grids must be rewritable, so zip stores
        (append-only) refuse."""
        if isinstance(self.store, ZipStore):
            raise NotImplementedError("resize on append-only zip stores")
        if len(new_shape) == 1 and isinstance(new_shape[0], (tuple, list)):
            new_shape = tuple(new_shape[0])
        new_shape = tuple(int(s) for s in new_shape)
        if len(new_shape) != self.ndim:
            raise ValueError(f"resize must keep ndim={self.ndim}")
        old_shape = self.shape
        if any(n < o for n, o in zip(new_shape, old_shape)):
            old_grid = [-(-o // c) for o, c in zip(old_shape, self.chunks)]
            new_grid = [-(-n // c) for n, c in zip(new_shape, self.chunks)]
            for cidx in np.ndindex(*old_grid):
                if any(i >= g for i, g in zip(cidx, new_grid)):
                    self.store.delete(self._chunk_key(cidx))
                    continue
                # boundary chunk: blank the tail that falls outside new_shape
                straddles = any(
                    i * c < n < min(i * c + c, o)
                    for i, c, n, o in zip(
                        cidx, self.chunks, new_shape, old_shape
                    )
                )
                if straddles and self.store.get(self._chunk_key(cidx)) is not None:
                    chunk = self._read_chunk(cidx).copy()
                    fill = self._fill_chunk()
                    for d, (i, c, n) in enumerate(
                        zip(cidx, self.chunks, new_shape)
                    ):
                        lo = max(n - i * c, 0)
                        if lo < c:
                            sl = [slice(None)] * self.ndim
                            sl[d] = slice(lo, None)
                            chunk[tuple(sl)] = fill[tuple(sl)]
                    self._write_chunk(cidx, chunk)
        meta = json.loads(self.store.get(_norm_path(self.path, ".zarray")))
        meta["shape"] = list(new_shape)
        self.store.set(
            _norm_path(self.path, ".zarray"), json.dumps(meta).encode()
        )
        self.shape = new_shape
        with self._lock:
            self._cache.clear()

    def append(self, value: np.ndarray, axis: int = 0) -> None:
        """Extend along ``axis`` and write the new region (streaming episode
        recording)."""
        value = np.asarray(value, dtype=self.dtype)
        old = self.shape[axis]
        new_shape = list(self.shape)
        new_shape[axis] += value.shape[axis]
        self.resize(new_shape)
        key = [slice(None)] * self.ndim
        key[axis] = slice(old, new_shape[axis])
        self[tuple(key)] = value

    def _write_chunk(self, cidx: Tuple[int, ...], chunk: np.ndarray) -> None:
        chunk = np.ascontiguousarray(chunk)
        if self.compressor is None:
            raw = chunk.tobytes()
        elif getattr(self.compressor, "is_image_codec", False):
            raw = self.compressor.encode(chunk)
        else:
            raw = self.compressor.encode(
                chunk.tobytes(), typesize=self.dtype.itemsize
            )
        self.store.set(self._chunk_key(cidx), raw)
        with self._lock:
            self._cache.pop(cidx, None)


_DEFAULT_COMPRESSOR = {
    "id": "blosc", "cname": "lz4", "clevel": 5, "shuffle": 1, "blocksize": 0,
}


class ZarrGroup:
    def __init__(self, store: Store, path: str = ""):
        self.store = store
        self.path = path
        self.attrs = Attrs(store, path)

    # -- traversal -------------------------------------------------------------

    def __getitem__(self, key: str) -> Union["ZarrGroup", ZarrArray]:
        p = _norm_path(self.path, key)
        if self.store.get(_norm_path(p, ".zarray")) is not None:
            return ZarrArray(self.store, p)
        if self.store.get(_norm_path(p, ".zgroup")) is not None:
            return ZarrGroup(self.store, p)
        raise KeyError(key)

    def __contains__(self, key: str) -> bool:
        p = _norm_path(self.path, key)
        return (
            self.store.get(_norm_path(p, ".zarray")) is not None
            or self.store.get(_norm_path(p, ".zgroup")) is not None
        )

    def keys(self) -> List[str]:
        prefix = self.path + "/" if self.path else ""
        candidates = set()
        for k in self.store.list_prefix(prefix):
            rest = k[len(prefix):]
            if "/" in rest:
                candidates.add(rest.split("/", 1)[0])
        return sorted(n for n in candidates if n in self)

    def __iter__(self) -> Iterator[str]:
        return iter(self.keys())

    def arrays(self) -> Iterator[Tuple[str, ZarrArray]]:
        for k in self.keys():
            v = self[k]
            if isinstance(v, ZarrArray):
                yield k, v

    # -- creation ---------------------------------------------------------------

    def require_group(self, key: str) -> "ZarrGroup":
        p = _norm_path(self.path, key)
        if self.store.get(_norm_path(p, ".zgroup")) is None:
            self.store.set(
                _norm_path(p, ".zgroup"), json.dumps({"zarr_format": 2}).encode()
            )
        return ZarrGroup(self.store, p)

    def create_dataset(
        self,
        key: str,
        data: Optional[np.ndarray] = None,
        shape: Optional[Tuple[int, ...]] = None,
        chunks: Optional[Tuple[int, ...]] = None,
        dtype=None,
        compressor: Union[None, str, Dict[str, Any]] = "default",
        fill_value: Any = 0,
        dimension_separator: str = ".",
    ) -> ZarrArray:
        if data is not None:
            data = np.asarray(data)
            shape = data.shape
            dtype = dtype or data.dtype
        assert shape is not None and dtype is not None
        dtype = np.dtype(dtype)
        if chunks is None:
            chunks = _default_chunks(shape, dtype)
        chunks = tuple(min(c, s) if s else c for c, s in zip(chunks, shape))
        if compressor == "default":
            compressor = dict(_DEFAULT_COMPRESSOR)
        elif isinstance(compressor, str):
            compressor = {"id": compressor}
        meta = {
            "zarr_format": 2,
            "shape": list(shape),
            "chunks": list(chunks),
            "dtype": dtype.str,
            "compressor": compressor,
            "fill_value": fill_value,
            "filters": None,
            "order": "C",
            "dimension_separator": dimension_separator,
        }
        p = _norm_path(self.path, key)
        self.store.set(_norm_path(p, ".zarray"), json.dumps(meta).encode())
        arr = ZarrArray(self.store, p)
        if data is not None:
            arr[...] = data
        return arr


def _default_chunks(
    shape: Tuple[int, ...], dtype: np.dtype, target_bytes: int = 2 << 20
) -> Tuple[int, ...]:
    """Chunk along time (axis 0) only — the reference's get_optimal_chunks
    convention (common/replay_buffer.py:51-85)."""
    if not shape:
        return ()
    item = dtype.itemsize * int(np.prod(shape[1:])) if len(shape) > 1 else dtype.itemsize
    t = max(1, min(shape[0], target_bytes // max(item, 1)))
    return (t,) + tuple(shape[1:])


# ---------------------------------------------------------------------------
# open()
# ---------------------------------------------------------------------------


def open_store(path: str, mode: str = "r") -> Store:
    if path.endswith(".zip") or (os.path.isfile(path) and zipfile.is_zipfile(path)):
        return ZipStore(path, mode=mode)
    return DirectoryStore(path)


def open_group(path_or_store: Union[str, Store], mode: str = "r") -> ZarrGroup:
    """Open a zarr v2 hierarchy rooted at ``path`` (directory or zip)."""
    store = (
        path_or_store
        if isinstance(path_or_store, Store)
        else open_store(path_or_store, mode=mode)
    )
    g = ZarrGroup(store, "")
    if mode != "r" and store.get(".zgroup") is None:
        store.set(".zgroup", json.dumps({"zarr_format": 2}).encode())
    return g
