"""Cross-validation against the REAL lz4 C library (liblz4.so.1, present on
this image even though the python bindings aren't): proves byte-level format
interop with the reference toolchain in both directions —

* frames produced by our native compressor decode with real LZ4F;
* frames produced by real LZ4F (including the LINKED-block mode that
  py-lz4framed emits by default, with content checksums) decode with our
  native decoder.
"""

import ctypes
import ctypes.util

import numpy as np
import pytest

from rnagan_tpu.data.store import lz4f_compress, lz4f_decompress


def _liblz4():
    path = ctypes.util.find_library("lz4") or "liblz4.so.1"
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        pytest.skip("system liblz4 not available")
    lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
    lib.LZ4F_compressFrameBound.argtypes = [ctypes.c_size_t, ctypes.c_void_p]
    lib.LZ4F_compressFrame.restype = ctypes.c_size_t
    lib.LZ4F_compressFrame.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
    ]
    lib.LZ4F_isError.restype = ctypes.c_uint
    lib.LZ4F_isError.argtypes = [ctypes.c_size_t]
    return lib


class _Prefs(ctypes.Structure):
    """LZ4F_preferences_t (lz4frame.h, stable layout)."""

    _fields_ = [
        ("blockSizeID", ctypes.c_int),
        ("blockMode", ctypes.c_int),          # 0 = linked (py-lz4framed default)
        ("contentChecksumFlag", ctypes.c_int),
        ("frameType", ctypes.c_int),
        ("contentSize", ctypes.c_ulonglong),
        ("dictID", ctypes.c_uint),
        ("blockChecksumFlag", ctypes.c_int),
        ("compressionLevel", ctypes.c_int),
        ("autoFlush", ctypes.c_uint),
        ("favorDecSpeed", ctypes.c_uint),
        ("reserved", ctypes.c_uint * 3),
    ]


def _real_compress(lib, payload: bytes, *, linked: bool, content_checksum: bool) -> bytes:
    prefs = _Prefs()
    prefs.blockMode = 0 if linked else 1
    prefs.contentChecksumFlag = 1 if content_checksum else 0
    cap = lib.LZ4F_compressFrameBound(len(payload), ctypes.byref(prefs))
    out = ctypes.create_string_buffer(cap)
    n = lib.LZ4F_compressFrame(out, cap, payload, len(payload), ctypes.byref(prefs))
    assert not lib.LZ4F_isError(n)
    return out.raw[:n]


def _real_decompress(lib, frame: bytes, expected_size: int) -> bytes:
    lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
    ctx = ctypes.c_void_p()
    rc = lib.LZ4F_createDecompressionContext(ctypes.byref(ctx), ctypes.c_uint(100))
    assert not lib.LZ4F_isError(rc)
    try:
        lib.LZ4F_decompress.restype = ctypes.c_size_t
        dst = ctypes.create_string_buffer(max(expected_size, 1))
        out = bytearray()
        src_off = 0
        for _ in range(1000):
            dst_size = ctypes.c_size_t(len(dst))
            src_size = ctypes.c_size_t(len(frame) - src_off)
            rc = lib.LZ4F_decompress(
                ctx, dst, ctypes.byref(dst_size),
                frame[src_off:], ctypes.byref(src_size), None,
            )
            assert not lib.LZ4F_isError(rc), f"LZ4F_decompress error {rc}"
            out += dst.raw[: dst_size.value]
            src_off += src_size.value
            if rc == 0 or src_off >= len(frame):
                break
        return bytes(out)
    finally:
        lib.LZ4F_freeDecompressionContext(ctx)


PAYLOADS = [
    b"",
    b"histology tile " * 4000,            # highly compressible, > 1 block linked
    bytes(np.random.RandomState(0).bytes(200_000)),  # incompressible, tile-sized
]


@pytest.mark.parametrize("idx", range(len(PAYLOADS)))
def test_real_lz4_reads_our_frames(idx):
    lib = _liblz4()
    payload = PAYLOADS[idx]
    frame = lz4f_compress(payload)
    assert _real_decompress(lib, frame, len(payload) + 64) == payload


@pytest.mark.parametrize("linked", [True, False])
@pytest.mark.parametrize("checksum", [True, False])
def test_our_decoder_reads_real_lz4_frames(linked, checksum):
    """Covers py-lz4framed's default output shape: linked blocks (matches can
    cross block boundaries) and optional content checksum."""
    lib = _liblz4()
    for payload in PAYLOADS:
        frame = _real_compress(lib, payload, linked=linked, content_checksum=checksum)
        assert lz4f_decompress(frame, hint=max(len(payload), 64)) == payload
