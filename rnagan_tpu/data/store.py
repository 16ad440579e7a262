"""Tile store: LMDB/LZ4 data plane over the native library.

The reference reads per-slide single-file LMDB databases whose values are
LZ4-frame-compressed pickles of ``(tile_name, raw_bytes, shape)`` in BGR
(reference ``read_data.py:195-253``), written by the offline tiler
(``patch_gen_grid.py:115-131``): keys are ascii integers plus a ``__keys__``
index entry. Neither the ``lmdb`` nor ``lz4`` python packages exist here, so
both the codec and the database format are implemented natively
(``native/tilestore.cc``) and bound via ctypes.

Differences from the reference's access pattern (intentional): the reference
re-opens the LMDB environment in every ``__getitem__`` (``read_data.py:248-253``)
— here a store is opened once (mmap) and tiles are decoded in bulk into
contiguous arrays for the batcher.
"""

from __future__ import annotations

import ctypes
import os
import pickle
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtilestore.so")
_lib = None


def _build_native() -> None:
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)


def native_lib() -> ctypes.CDLL:
    """Load (building on first use) the native tilestore library."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_NATIVE_DIR, "tilestore.cc")
    ):
        _build_native()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ts_lz4f_decompress.restype = ctypes.c_int64
    lib.ts_lz4f_decompress.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
    lib.ts_lz4f_compress_bound.restype = ctypes.c_int64
    lib.ts_lz4f_compress_bound.argtypes = [ctypes.c_int64]
    lib.ts_lz4f_compress.restype = ctypes.c_int64
    lib.ts_lz4f_compress.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
    lib.ts_lmdb_open.restype = ctypes.c_void_p
    lib.ts_lmdb_open.argtypes = [ctypes.c_char_p]
    lib.ts_lmdb_close.argtypes = [ctypes.c_void_p]
    lib.ts_lmdb_entries.restype = ctypes.c_int64
    lib.ts_lmdb_entries.argtypes = [ctypes.c_void_p]
    lib.ts_lmdb_get.restype = ctypes.c_int64
    lib.ts_lmdb_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
    lib.ts_lmdb_keys.restype = ctypes.c_int64
    lib.ts_lmdb_keys.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.ts_lmdb_writer_create.restype = ctypes.c_void_p
    lib.ts_lmdb_writer_create.argtypes = [ctypes.c_char_p]
    lib.ts_lmdb_writer_put.restype = ctypes.c_int
    lib.ts_lmdb_writer_put.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64]
    lib.ts_lmdb_writer_close.restype = ctypes.c_int64
    lib.ts_lmdb_writer_close.argtypes = [ctypes.c_void_p]
    lib.ts_lmdb_load_batch.restype = ctypes.c_int64
    lib.ts_lmdb_load_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    _lib = lib
    return lib


# ------------------------------------------------------------------- LZ4


def lz4f_compress(data: bytes) -> bytes:
    lib = native_lib()
    cap = lib.ts_lz4f_compress_bound(len(data))
    out = ctypes.create_string_buffer(cap)
    n = lib.ts_lz4f_compress(data, len(data), out, cap)
    if n < 0:
        raise RuntimeError(f"lz4f_compress failed: {n}")
    return out.raw[:n]


def lz4f_decompress(data: bytes, hint: Optional[int] = None) -> bytes:
    lib = native_lib()
    cap = hint or max(4 * len(data), 1 << 16)
    for _ in range(8):
        out = ctypes.create_string_buffer(cap)
        n = lib.ts_lz4f_decompress(data, len(data), out, cap)
        if n >= 0:
            return out.raw[:n]
        if n == -2:  # capacity too small
            cap *= 4
            continue
        raise RuntimeError("lz4f_decompress: malformed frame")
    raise RuntimeError("lz4f_decompress: output too large")


# ------------------------------------------------------------------- store


def serialize_tile(name: str, image: np.ndarray) -> bytes:
    """Reference value format (``patch_gen_grid.py:117,141``): lz4-framed
    pickle of (name, raw bytes, shape). The array is stored as produced by
    the tiler; the read path applies the reference's BGR->RGB swap
    (``read_data.py:241``) — see the color-channel note in data/tiler.py."""
    image = np.ascontiguousarray(image, np.uint8)
    return lz4f_compress(pickle.dumps((name, image.tobytes(), image.shape)))


def deserialize_tile(value: bytes) -> Optional[np.ndarray]:
    """Inverse incl. the BGR->RGB flip the reference applies at read time
    (``read_data.py:233-242``). Returns None on corrupt entries (the
    reference's defensive contract)."""
    try:
        name, raw, shape = pickle.loads(lz4f_decompress(bytes(value)))
        img = np.frombuffer(raw, dtype=np.uint8).reshape(shape)
        return img[..., ::-1].copy()  # BGR -> RGB
    except Exception:
        return None


class LMDBTileStore:
    """Read-only per-slide tile database (the data behind PatchDataset,
    reference ``read_data.py:195-253``)."""

    def __init__(self, path: str):
        self._lib = native_lib()
        self._h = self._lib.ts_lmdb_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open LMDB file: {path}")
        self.path = path

    def close(self):
        if self._h:
            self._lib.ts_lmdb_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __len__(self) -> int:
        return int(self._lib.ts_lmdb_entries(self._h))

    def get_raw(self, key: bytes) -> Optional[bytes]:
        cap = 1 << 20
        for _ in range(6):
            buf = ctypes.create_string_buffer(cap)
            n = self._lib.ts_lmdb_get(self._h, key, len(key), buf, cap)
            if n < 0:
                return None
            if n <= cap:
                return buf.raw[:n]
            cap = int(n)
        return None

    def keys(self) -> List[bytes]:
        """Tile keys. Prefers the reference's ``__keys__`` index entry
        (``patch_gen_grid.py:129-131``); falls back to a full tree walk."""
        raw = self.get_raw(b"__keys__")
        if raw is not None:
            try:
                return list(pickle.loads(lz4f_decompress(raw)))
            except Exception:
                pass
        need = self._lib.ts_lmdb_keys(self._h, None, 0)
        buf = ctypes.create_string_buffer(int(need))
        self._lib.ts_lmdb_keys(self._h, buf, need)
        out, off = [], 0
        raw_bytes = buf.raw
        while off < need:
            (l,) = np.frombuffer(raw_bytes, np.uint32, 1, off)
            off += 4
            k = raw_bytes[off : off + int(l)]
            off += int(l)
            if k != b"__keys__":
                out.append(k)
        return out

    def get_tile(self, key: bytes) -> Optional[np.ndarray]:
        raw = self.get_raw(key)
        return None if raw is None else deserialize_tile(raw)

    def prewarm(self) -> int:
        """Sequentially fault the backing file into the OS page cache.

        The training access pattern is random ~100-300 KB reads across a
        multi-GB corpus; cold, every tile pays a disk seek (measured on the
        reference-scale corpus: 5.6 ms/tile cold vs 0.16 ms/tile warm), so
        the first epoch runs disk-seek-bound. One sequential pass moves the
        corpus into cache at disk streaming bandwidth instead. Returns the
        number of bytes touched."""
        total = 0
        with open(self.path, "rb", buffering=0) as f:
            while True:
                chunk = f.read(8 << 20)
                if not chunk:
                    break
                total += len(chunk)
        return total

    def load_tiles_fixed(
        self, keys: Sequence[bytes], height: int, width: int, nthreads: int = 0
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Native bulk decode for a known tile shape: the whole batch —
        B+tree lookup, LZ4-frame decompress, pickle payload extract, BGR->RGB
        — runs threaded in C++ straight into one contiguous (N, H, W, 3)
        uint8 array (``ts_lmdb_load_batch``). Entries the native pickle
        scanner rejects (exotic protocols) fall back to Python
        ``pickle.loads`` per entry. Returns (array, ok_mask); rows with
        ``ok_mask == False`` are corrupt/missing/mis-shaped (the reference's
        collate-filter contract, ``histopathology_gan.py:26-48``)."""
        n = len(keys)
        out = np.empty((n, height, width, 3), np.uint8)
        if n == 0:
            return out, np.zeros(0, bool)
        packed = b"".join(
            len(k).to_bytes(4, "little") + bytes(k) for k in keys
        )
        status = np.empty(n, np.uint8)
        rc = self._lib.ts_lmdb_load_batch(
            self._h, packed, len(packed), n, height, width,
            out.ctypes.data_as(ctypes.c_void_p), status.ctypes.data_as(ctypes.c_void_p),
            nthreads,
        )
        if rc < 0:
            raise RuntimeError("ts_lmdb_load_batch: malformed key packing")
        # status 3 = native pickle scanner gave up -> full Python unpickle
        for i in np.flatnonzero(status == 3):
            img = self.get_tile(keys[i])
            if img is not None and img.shape == (height, width, 3):
                out[i] = img
                status[i] = 0
        return out, status == 0

    def load_tiles(self, keys: Sequence[bytes]) -> Tuple[np.ndarray, List[bytes]]:
        """Bulk-decode tiles into one contiguous uint8 NHWC array, skipping
        corrupt entries (the collate-filter contract, reference
        ``histopathology_gan.py:26-48``). Returns (array, kept_keys).

        The tile shape is sniffed from the first decodable entry, then the
        whole batch goes through the native threaded path
        (:meth:`load_tiles_fixed`)."""
        keys = list(keys)
        shape = None
        for k in keys:
            img = self.get_tile(k)
            if img is not None:
                shape = img.shape
                break
        if shape is None:
            return np.zeros((0, 0, 0, 3), np.uint8), []
        tiles, ok = self.load_tiles_fixed(keys, shape[0], shape[1])
        kept = [k for k, good in zip(keys, ok) if good]
        return tiles[ok], kept


class LMDBTileWriter:
    """Bulk writer producing reference-format tile databases
    (``patch_gen_grid.py:92-133``): ascii-int keys + ``__keys__`` index."""

    def __init__(self, path: str):
        self._lib = native_lib()
        self._h = self._lib.ts_lmdb_writer_create(path.encode())
        self._count = 0
        self.path = path

    def put_tile(self, name: str, image: np.ndarray) -> int:
        key = str(self._count).encode("ascii")
        val = serialize_tile(name, image)
        rc = self._lib.ts_lmdb_writer_put(self._h, key, len(key), val, len(val))
        if rc != 0:
            raise RuntimeError("writer_put failed")
        self._count += 1
        return self._count - 1

    def put_raw(self, key: bytes, value: bytes) -> None:
        rc = self._lib.ts_lmdb_writer_put(self._h, key, len(key), value, len(value))
        if rc != 0:
            raise RuntimeError("writer_put failed")

    def close(self) -> int:
        keys = [str(i).encode("ascii") for i in range(self._count)]
        self.put_raw(b"__keys__", lz4f_compress(pickle.dumps(keys)))
        n = int(self._lib.ts_lmdb_writer_close(self._h))
        self._h = None
        if n < 0:
            raise IOError(f"failed writing {self.path}")
        return self._count

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        if self._h:
            self.close()
