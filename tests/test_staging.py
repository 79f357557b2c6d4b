"""Dataset staging pipeline (scripts/stage_datasets.py + utils/lz4f.py).

The reference ships UMI data as .zarr.zip downloads repacked into
.zarr.tar.lz4 archives extracted per node at training time
(process_dataset/download_dataset.py:105-163, extract_umi_data.py:9-63).
These tests fabricate real archives of each format and extract them through
the staging entry points — including the LZ4 frame path through the ctypes
liblz4 binding (no lz4 CLI in this environment).
"""

import io
import os
import subprocess
import sys
import tarfile
import zipfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.stage_datasets import extract_one, fetch_one
from unified_video_action_tpu.utils import lz4f


def test_lz4_frame_roundtrip():
    rng = np.random.RandomState(0)
    data = rng.bytes(300_000) + b"\x00" * 100_000  # mixed entropy
    comp = lz4f.compress(data)
    assert len(comp) < len(data)
    assert lz4f.decompress(comp) == data


def test_lz4_streaming_small_chunks():
    data = b"umi episode payload " * 5000
    comp = lz4f.compress(data)
    stream = lz4f.FrameDecompressor(io.BytesIO(comp), chunk_size=512)
    out = b""
    while True:
        piece = stream.read(1000)
        if not piece:
            break
        out += piece
    assert out == data


def _make_tree(root):
    os.makedirs(os.path.join(root, "umi.zarr", "data"), exist_ok=True)
    with open(os.path.join(root, "umi.zarr", ".zgroup"), "w") as f:
        f.write('{"zarr_format": 2}')
    with open(os.path.join(root, "umi.zarr", "data", "chunk.bin"), "wb") as f:
        f.write(b"\x01\x02\x03" * 1000)


def test_extract_zip(tmp_path):
    src = tmp_path / "src"
    _make_tree(str(src))
    archive = str(tmp_path / "umi.zarr.zip")
    with zipfile.ZipFile(archive, "w") as z:
        for dirpath, _, files in os.walk(src):
            for fn in files:
                p = os.path.join(dirpath, fn)
                z.write(p, os.path.relpath(p, src))
    out = str(tmp_path / "out_zip")
    extract_one(archive, out)
    assert open(os.path.join(out, "umi.zarr", "data", "chunk.bin"), "rb").read() == (
        b"\x01\x02\x03" * 1000
    )


def test_extract_tar_lz4(tmp_path):
    """The reference's .zarr.tar.lz4 staging format, end-to-end."""
    src = tmp_path / "src"
    _make_tree(str(src))
    tar_bytes = io.BytesIO()
    with tarfile.open(fileobj=tar_bytes, mode="w") as t:
        t.add(str(src / "umi.zarr"), arcname="umi.zarr")
    archive = str(tmp_path / "umi.zarr.tar.lz4")
    with open(archive, "wb") as f:
        f.write(lz4f.compress(tar_bytes.getvalue()))

    out = str(tmp_path / "out_lz4")
    extract_one(archive, out)
    assert os.path.exists(os.path.join(out, "umi.zarr", ".zgroup"))
    assert open(os.path.join(out, "umi.zarr", "data", "chunk.bin"), "rb").read() == (
        b"\x01\x02\x03" * 1000
    )


def test_fetch_cached_short_circuit(tmp_path):
    dst = tmp_path / "raw" / "x.zip"
    os.makedirs(dst.parent, exist_ok=True)
    dst.write_bytes(b"data")
    out = fetch_one("https://example.com/x.zip", str(tmp_path / "raw"))
    assert out.endswith("(cached)")


def test_lz4_concatenated_frames():
    """The lz4 CLI concatenates frames for multi-part archives; the reader
    must decode across frame boundaries (regression: EOF was declared at the
    first frame end when it aligned with a read chunk)."""
    a = b"first frame " * 500
    b = b"second frame " * 500
    blob = lz4f.compress(a) + lz4f.compress(b)
    assert lz4f.decompress(blob) == a + b
    # ...even when the source chunking lands exactly on the boundary
    stream = lz4f.FrameDecompressor(io.BytesIO(blob), chunk_size=len(lz4f.compress(a)))
    assert stream.read(-1) == a + b


def test_open_frame_closes_file(tmp_path):
    p = tmp_path / "x.lz4"
    p.write_bytes(lz4f.compress(b"payload"))
    with lz4f.open_frame(str(p)) as s:
        assert s.read(-1) == b"payload"
        inner = s._f
    assert inner.closed
