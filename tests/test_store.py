"""Native tile store: LZ4 frame codec correctness (incl. cross-checks against
reference-style payloads), LMDB-format write/read round-trips, B+tree behavior
at scale, corrupt-entry handling."""

import os
import pickle

import numpy as np
import pytest

from rnagan_tpu.data.store import (
    LMDBTileStore,
    LMDBTileWriter,
    deserialize_tile,
    lz4f_compress,
    lz4f_decompress,
    native_lib,
    serialize_tile,
)


def test_native_builds():
    lib = native_lib()
    assert lib is not None


def test_xxh32_known_vectors():
    """xxHash32 reference vectors (from the published xxHash spec)."""
    import ctypes

    lib = native_lib()
    lib.ts_xxh32.restype = ctypes.c_uint32
    lib.ts_xxh32.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_uint32]
    assert lib.ts_xxh32(b"", 0, 0) == 0x02CC5D05
    assert lib.ts_xxh32(b"", 0, 1) == 0x0B2CB792
    assert lib.ts_xxh32(b"a", 1, 0) == 0x550D7456
    assert lib.ts_xxh32(b"abc", 3, 0) == 0x32D153FF
    assert lib.ts_xxh32(b"Nobody inspects the spammish repetition", 39, 0) == 0xE2293B2F


@pytest.mark.parametrize("size", [0, 1, 100, 65536, 300_000])
def test_lz4_roundtrip_sizes(size, rng):
    data = rng.bytes(size)
    comp = lz4f_compress(data)
    assert lz4f_decompress(comp) == data


def test_lz4_compresses_redundant_data(rng):
    data = (b"histopathology-tile-" * 10_000)[:200_000]
    comp = lz4f_compress(data)
    assert len(comp) < len(data) // 10
    assert lz4f_decompress(comp) == data


def test_tile_serialization_roundtrip(rng):
    img_bgr = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    value = serialize_tile("slide_patch_0", img_bgr)
    back = deserialize_tile(value)
    np.testing.assert_array_equal(back, img_bgr[..., ::-1])  # BGR->RGB applied
    assert deserialize_tile(b"garbage") is None


def test_lmdb_write_read_roundtrip(tmp_path, rng):
    path = str(tmp_path / "slide.db")
    tiles = [rng.randint(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(20)]
    with LMDBTileWriter(path) as w:
        for i, t in enumerate(tiles):
            w.put_tile(f"slide_patch_{i}", t)
    with LMDBTileStore(path) as store:
        assert len(store) == 21  # 20 tiles + __keys__
        keys = store.keys()
        assert keys == [str(i).encode() for i in range(20)]
        for i in (0, 7, 19):
            np.testing.assert_array_equal(store.get_tile(keys[i]), tiles[i][..., ::-1])
        assert store.get_raw(b"missing") is None
        arr, kept = store.load_tiles(keys[:5])
        assert arr.shape == (5, 32, 32, 3)
        assert kept == keys[:5]


def test_lmdb_many_entries_builds_branches(tmp_path, rng):
    """Enough entries to require branch pages (multi-level B+tree)."""
    path = str(tmp_path / "big.db")
    w = LMDBTileWriter(path)
    values = {}
    for i in range(3000):
        key = str(i).encode()
        val = bytes(rng.bytes(rng.randint(5, 50)))
        w.put_raw(key, val)
        values[key] = val
    w._count = 0  # no tile keys; close writes empty __keys__
    w.close()
    with LMDBTileStore(path) as store:
        probe = list(values.items())
        for key, val in probe[::97]:
            assert store.get_raw(key) == val
        assert store.get_raw(b"nope") is None


def test_lmdb_overflow_values(tmp_path, rng):
    """256x256x3 tiles exercise the overflow-page path (values ~200 KB)."""
    path = str(tmp_path / "ov.db")
    tiles = [rng.randint(0, 256, (256, 256, 3), dtype=np.uint8) for _ in range(3)]
    with LMDBTileWriter(path) as w:
        for i, t in enumerate(tiles):
            w.put_tile(f"t{i}", t)
    with LMDBTileStore(path) as store:
        for i in range(3):
            np.testing.assert_array_equal(store.get_tile(str(i).encode()), tiles[i][..., ::-1])


def test_lmdb_file_is_page_structured(tmp_path):
    """Structural sanity of the produced LMDB file: magic, version, meta
    txnid selection."""
    path = str(tmp_path / "meta.db")
    with LMDBTileWriter(path) as w:
        w.put_raw(b"k", b"v")
    raw = open(path, "rb").read()
    assert len(raw) % 4096 == 0
    for pg in (0, 1):
        meta = raw[pg * 4096 + 16 :]
        assert int.from_bytes(meta[0:4], "little") == 0xBEEFC0DE
        assert int.from_bytes(meta[4:8], "little") == 1
    # page 1 holds the committed txn
    assert int.from_bytes(raw[4096 + 16 + 128 :][:8], "little") == 1


def test_lmdb_duplicate_key_last_wins(tmp_path):
    path = str(tmp_path / "dup.db")
    w = LMDBTileWriter(path)
    w.put_raw(b"k", b"first")
    w.put_raw(b"other", b"x")
    w.put_raw(b"k", b"second")
    w._count = 0
    w.close()
    with LMDBTileStore(path) as store:
        assert store.get_raw(b"k") == b"second"
        assert store.get_raw(b"other") == b"x"


def test_lmdb_meta_psize_written(tmp_path):
    """liblmdb locates meta page 1 via mm_psize (aliased to the free-db md_pad
    slot) and divides by it at open — it must be 4096, not 0."""
    path = str(tmp_path / "ps.db")
    with LMDBTileWriter(path) as w:
        w.put_raw(b"k", b"v")
    raw = open(path, "rb").read()
    for pg in (0, 1):
        psize = int.from_bytes(raw[pg * 4096 + 16 + 24 :][:4], "little")
        assert psize == 4096


def test_lmdb_reader_survives_truncation(tmp_path, rng):
    """A DB truncated mid-overflow-chain must fail lookups cleanly, not crash."""
    path = str(tmp_path / "trunc.db")
    with LMDBTileWriter(path) as w:
        w.put_tile("big", rng.randint(0, 255, (256, 256, 3), dtype=np.uint8))
    raw = open(path, "rb").read()
    open(path, "wb").write(raw[: len(raw) // 2])
    try:
        with LMDBTileStore(path) as store:
            assert store.get_tile(b"0") is None or True  # no crash is the contract
    except IOError:
        pass  # refusing to open a torn file is also acceptable


# --------------------------------------------------------------- bulk decode


def _write_store(path, tiles, extra_raw=None):
    with LMDBTileWriter(path) as w:
        for i, t in enumerate(tiles):
            w.put_tile(f"s_patch_{i}", t)
        for k, v in (extra_raw or {}).items():
            w.put_raw(k, v)


def test_load_tiles_fixed_native_batch(tmp_path, rng):
    """The threaded native path must reproduce the per-tile Python decode
    bit-for-bit (incl. the BGR->RGB swap) for every pickle our writer emits."""
    path = str(tmp_path / "bulk.db")
    tiles = [rng.randint(0, 256, (48, 48, 3), dtype=np.uint8) for _ in range(40)]
    _write_store(path, tiles)
    with LMDBTileStore(path) as store:
        keys = store.keys()
        arr, ok = store.load_tiles_fixed(keys, 48, 48)
        assert ok.all() and arr.shape == (40, 48, 48, 3)
        for i in (0, 13, 39):
            np.testing.assert_array_equal(arr[i], tiles[i][..., ::-1])
            np.testing.assert_array_equal(arr[i], store.get_tile(keys[i]))


def test_load_tiles_fixed_statuses(tmp_path, rng):
    """Missing keys, undecompressable values, and shape mismatches must be
    flagged per entry, not poison the batch."""
    path = str(tmp_path / "mixed.db")
    good = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    small = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
    _write_store(path, [good, small], extra_raw={b"corrupt": b"not lz4 at all"})
    with LMDBTileStore(path) as store:
        keys = [b"0", b"1", b"corrupt", b"absent"]
        arr, ok = store.load_tiles_fixed(keys, 16, 16)
        assert list(ok) == [True, False, False, False]
        np.testing.assert_array_equal(arr[0], good[..., ::-1])


def test_load_tiles_fixed_protocol_fallback(tmp_path, rng):
    """Pickle protocols the native scanner does not parse (e.g. protocol 0
    text pickles) must fall back to Python pickle.loads and still decode."""
    from rnagan_tpu.data.store import lz4f_compress

    path = str(tmp_path / "proto.db")
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    legacy = lz4f_compress(
        pickle.dumps(("name", img.tobytes(), img.shape), protocol=0)
    )
    _write_store(path, [img], extra_raw={b"legacy": legacy})
    with LMDBTileStore(path) as store:
        arr, ok = store.load_tiles_fixed([b"0", b"legacy"], 16, 16)
        assert ok.all()
        np.testing.assert_array_equal(arr[0], img[..., ::-1])
        np.testing.assert_array_equal(arr[1], img[..., ::-1])


def test_load_tiles_fixed_all_pickle_protocols(tmp_path, rng):
    """Every binary pickle protocol (2-5) should parse natively; the
    native scanner and the Python decoder must agree."""
    from rnagan_tpu.data.store import lz4f_compress

    path = str(tmp_path / "protocols.db")
    img = rng.randint(0, 256, (300, 300, 3), dtype=np.uint8)  # dims need BININT2
    extra = {
        f"p{p}".encode(): lz4f_compress(
            pickle.dumps((f"tile_{p}", img.tobytes(), img.shape), protocol=p)
        )
        for p in (2, 3, 4, 5)
    }
    _write_store(path, [], extra_raw=extra)
    with LMDBTileStore(path) as store:
        keys = sorted(extra)
        arr, ok = store.load_tiles_fixed(keys, 300, 300)
        assert ok.all()
        for i in range(len(keys)):
            np.testing.assert_array_equal(arr[i], img[..., ::-1])


def test_prewarm_touches_whole_file(tmp_path, rng):
    """prewarm must fault the entire backing file (returns its byte size)
    and leave the store fully readable afterwards."""
    path = str(tmp_path / "warm.db")
    tiles = [rng.randint(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(8)]
    _write_store(path, tiles)
    with LMDBTileStore(path) as store:
        assert store.prewarm() == os.path.getsize(path)
        keys = store.keys()
        arr, ok = store.load_tiles_fixed(keys, 16, 16)
        assert ok.all()
        np.testing.assert_array_equal(arr[0], tiles[0][..., ::-1])
