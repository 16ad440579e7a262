"""Independent cross-validation of the native LZ4 codec: a from-the-spec
pure-Python LZ4 frame decoder (written separately from the C++ one) must
decode frames the native compressor produces. Catches systematic
encoder+decoder-agree-but-both-wrong bugs that round-trip tests can't."""

import struct

import numpy as np
import pytest

from rnagan_tpu.data.store import lz4f_compress, lz4f_decompress


def py_lz4_block_decompress(src: bytes, out: bytearray) -> None:
    """LZ4 block format, per the published spec."""
    i = 0
    n = len(src)
    while i < n:
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        out.extend(src[i : i + lit])
        i += lit
        if i >= n:
            break
        offset = struct.unpack_from("<H", src, i)[0]
        i += 2
        assert 0 < offset <= len(out), "bad match offset"
        mlen = (token & 15) + 4
        if (token & 15) == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        start = len(out) - offset
        for k in range(mlen):  # overlap-safe
            out.append(out[start + k])


def py_lz4f_decompress(frame: bytes) -> bytes:
    """LZ4 frame format, per the published spec."""
    assert struct.unpack_from("<I", frame, 0)[0] == 0x184D2204, "magic"
    flg, bd = frame[4], frame[5]
    assert flg >> 6 == 1, "version"
    i = 6
    content_size = None
    if flg & 0x08:
        content_size = struct.unpack_from("<Q", frame, i)[0]
        i += 8
    if flg & 0x01:
        i += 4  # dict id
    i += 1  # header checksum byte
    out = bytearray()
    while True:
        bsize = struct.unpack_from("<I", frame, i)[0]
        i += 4
        if bsize == 0:
            break
        data = frame[i : i + (bsize & 0x7FFFFFFF)]
        i += bsize & 0x7FFFFFFF
        if bsize & 0x80000000:
            out.extend(data)
        else:
            py_lz4_block_decompress(data, out)
        if flg & 0x10:
            i += 4  # block checksum
    if content_size is not None:
        assert len(out) == content_size, "content size mismatch"
    return bytes(out)


@pytest.mark.parametrize("payload", [
    b"",
    b"hello world",
    b"histopathology-" * 5000,
    bytes(np.random.RandomState(0).bytes(100_000)),
    bytes(np.random.RandomState(1).randint(0, 8, 250_000, dtype=np.uint8)),
])
def test_python_decoder_reads_native_frames(payload):
    frame = lz4f_compress(payload)
    assert py_lz4f_decompress(frame) == payload
    # and the native decoder agrees with itself
    assert lz4f_decompress(frame) == payload


def test_native_decoder_reads_handcrafted_frame():
    """Frame assembled by hand per spec (stored block + header checksum)."""
    payload = b"The quick brown fox."
    flg = (1 << 6) | 0x20 | 0x08  # v01, B.Indep, C.Size
    bd = 4 << 4
    desc = bytes([flg, bd]) + struct.pack("<Q", len(payload))
    from rnagan_tpu.data.store import native_lib
    import ctypes

    lib = native_lib()
    lib.ts_xxh32.restype = ctypes.c_uint32
    hc = (lib.ts_xxh32(desc, len(desc), 0) >> 8) & 0xFF
    frame = (
        struct.pack("<I", 0x184D2204) + desc + bytes([hc])
        + struct.pack("<I", 0x80000000 | len(payload)) + payload
        + struct.pack("<I", 0)
    )
    assert lz4f_decompress(frame) == payload
