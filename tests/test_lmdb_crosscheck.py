"""Independent cross-validation of the native LMDB 0.9 codec (the liblmdb
data format the reference's tile databases use, reference
``src/preprocess/patch_gen_grid.py:92-133`` writes / ``src/read_data.py:195-253``
reads via py-lmdb).

This image has no liblmdb to test against, so — exactly like the LZ4
cross-check (tests/test_lz4_crosscheck.py) — this file carries a pure-Python
reader written strictly from the PUBLISHED on-disk format (mdb.c's MDB_page /
MDB_meta / MDB_node layouts), independent of the C++ implementation in
native/tilestore.cc:

* files produced by our native writer must parse correctly through the
  spec reader (writer validation: catches encoder+decoder-agree-but-both-
  wrong format bugs);
* a minimal database hand-assembled here per the spec must read correctly
  through our native reader (reader validation against an independent
  producer).
"""

import os
import struct

import numpy as np
import pytest

from rnagan_tpu.data.store import LMDBTileStore, LMDBTileWriter

# ---------------------------------------------------------------- spec reader
# LMDB 0.9 on-disk format constants (mdb.c / lmdb.h, published):
MDB_MAGIC = 0xBEEFC0DE
MDB_DATA_VERSION = 1
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
PAGE_HDR = 16


class SpecReader:
    """LMDB data file reader written from the published format only."""

    def __init__(self, path):
        with open(path, "rb") as f:
            self.buf = f.read()
        # meta pages live in pages 0 and 1; page size comes from
        # mm_dbs[FREE_DBI].md_pad (mm_psize aliases it)
        m0 = self._parse_meta(0, 4096)
        psize = m0["psize"] if m0 and 512 <= m0["psize"] <= 65536 else 4096
        self.psize = psize
        m0 = self._parse_meta(0, psize)
        m1 = self._parse_meta(1, psize)
        metas = [m for m in (m0, m1) if m is not None]
        assert metas, "no valid meta page"
        self.meta = max(metas, key=lambda m: m["txnid"])

    def _page(self, pgno):
        off = pgno * self.psize
        assert off + self.psize <= len(self.buf), f"page {pgno} out of range"
        return self.buf[off : off + self.psize]

    def _parse_meta(self, pgno, psize):
        off = pgno * psize
        if off + psize > len(self.buf):
            return None
        page = self.buf[off : off + psize]
        # MDB_page header: pgno u64, pad u16, flags u16, lower u16, upper u16
        flags = struct.unpack_from("<H", page, 10)[0]
        if not flags & P_META:
            return None
        # MDB_meta: magic u32, version u32, address u64, mapsize u64,
        #           mm_dbs[2] (48 bytes each), last_pg u64, txnid u64
        magic, version = struct.unpack_from("<II", page, PAGE_HDR)
        if magic != MDB_MAGIC or version != MDB_DATA_VERSION:
            return None
        mapsize = struct.unpack_from("<Q", page, PAGE_HDR + 16)[0]
        db_off = PAGE_HDR + 24

        def parse_db(o):
            pad, dflags, depth = struct.unpack_from("<IHH", page, o)
            branch, leaf, overflow, entries, root = struct.unpack_from("<5Q", page, o + 8)
            return {"pad": pad, "flags": dflags, "depth": depth, "branch": branch,
                    "leaf": leaf, "overflow": overflow, "entries": entries,
                    "root": struct.unpack_from("<q", page, o + 40)[0]}

        free_db = parse_db(db_off)
        main_db = parse_db(db_off + 48)
        last_pg, txnid = struct.unpack_from("<QQ", page, db_off + 96)
        return {"psize": free_db["pad"], "mapsize": mapsize, "main": main_db,
                "last_pg": last_pg, "txnid": txnid}

    def _nodes(self, page):
        lower = struct.unpack_from("<H", page, 12)[0]
        n = (lower - PAGE_HDR) // 2
        return [struct.unpack_from("<H", page, PAGE_HDR + 2 * i)[0] for i in range(n)]

    def _node(self, page, off):
        # MDB_node: lo u16, hi u16, flags u16, ksize u16, then key bytes
        lo, hi, nflags, ksize = struct.unpack_from("<4H", page, off)
        key = page[off + 8 : off + 8 + ksize]
        return lo, hi, nflags, ksize, key

    def _leaf_value(self, page, off):
        lo, hi, nflags, ksize, key = self._node(page, off)
        dsize = lo | (hi << 16)
        if nflags & F_BIGDATA:
            (ovpgno,) = struct.unpack_from("<Q", page, off + 8 + ksize)
            ovpage = self._page(ovpgno)
            ovflags = struct.unpack_from("<H", ovpage, 10)[0]
            assert ovflags & P_OVERFLOW, "bigdata node must point at an overflow page"
            start = ovpgno * self.psize + PAGE_HDR
            return key, self.buf[start : start + dsize]
        data_off = off + 8 + ksize
        return key, page[data_off : data_off + dsize]

    def items(self):
        """All (key, value) pairs by full B+tree walk, in key order."""
        root = self.meta["main"]["root"]
        if root < 0:
            return []
        out = []
        self._walk(root, out)
        return out

    def _walk(self, pgno, out):
        page = self._page(pgno)
        flags = struct.unpack_from("<H", page, 10)[0]
        if flags & P_LEAF:
            for off in self._nodes(page):
                out.append(self._leaf_value(page, off))
        elif flags & P_BRANCH:
            for off in self._nodes(page):
                # branch node: child pgno = lo | hi<<16 | flags<<32 (64-bit)
                lo, hi, nflags, ksize, _ = self._node(page, off)
                child = lo | (hi << 16) | (nflags << 32)
                self._walk(child, out)
        else:
            raise AssertionError(f"unexpected page flags {flags:#x} at pgno {pgno}")

    def get(self, key):
        """Point lookup by binary search descent (validates key ordering)."""
        root = self.meta["main"]["root"]
        if root < 0:
            return None
        pgno = root
        while True:
            page = self._page(pgno)
            flags = struct.unpack_from("<H", page, 10)[0]
            offs = self._nodes(page)
            if flags & P_LEAF:
                for off in offs:
                    k, v = self._leaf_value(page, off)
                    if k == key:
                        return v
                return None
            # branch: last child whose key <= target (node 0 key is empty)
            chosen = offs[0]
            for off in offs[1:]:
                _, _, _, ksize, k = self._node(page, off)
                if _mdb_cmp(key, k) >= 0:
                    chosen = off
                else:
                    break
            lo, hi, nflags, _, _ = self._node(page, chosen)
            pgno = lo | (hi << 16) | (nflags << 32)


def _mdb_cmp(a, b):
    """Default LMDB compare: lexicographic memcmp, shorter first on ties."""
    if a[: len(b)] != b[: len(a)]:
        return -1 if a[: len(b)] < b[: len(a)] else 1
    return len(a) - len(b)


# ------------------------------------------------------- spec writer (minimal)
def assemble_minimal_db(path, entries):
    """Hand-assemble a single-leaf LMDB database per the published format
    (entries must fit one 4096-byte leaf page; values < ~1900B inline)."""
    psize = 4096
    leaf = bytearray(psize)
    struct.pack_into("<Q", leaf, 0, 2)        # pgno
    struct.pack_into("<H", leaf, 10, P_LEAF)  # flags
    lower, upper = PAGE_HDR, psize
    for key, val in sorted(entries.items(), key=lambda kv: (kv[0], len(kv[0]))):
        node = struct.pack("<4H", len(val) & 0xFFFF, len(val) >> 16, 0, len(key)) + key + val
        upper -= len(node) + (len(node) & 1)  # 2-byte node alignment
        leaf[upper : upper + len(node)] = node
        struct.pack_into("<H", leaf, lower, upper)
        lower += 2
    struct.pack_into("<HH", leaf, 12, lower, upper)

    def meta(pgno, txnid):
        m = bytearray(psize)
        struct.pack_into("<Q", m, 0, pgno)
        struct.pack_into("<H", m, 10, P_META)
        struct.pack_into("<II", m, PAGE_HDR, MDB_MAGIC, MDB_DATA_VERSION)
        struct.pack_into("<Q", m, PAGE_HDR + 16, 1 << 20)          # mapsize
        struct.pack_into("<I", m, PAGE_HDR + 24, psize)            # free_db.pad = mm_psize
        struct.pack_into("<q", m, PAGE_HDR + 24 + 40, -1)          # free_db.root = none
        main = PAGE_HDR + 24 + 48
        struct.pack_into("<HH", m, main + 4, 0, 1)                 # flags, depth=1
        struct.pack_into("<5q", m, main + 8, 0, 1, 0, len(entries), 2)
        struct.pack_into("<QQ", m, main + 48, 2, txnid)            # last_pg, txnid
        return m

    with open(path, "wb") as f:
        f.write(meta(0, 0))
        f.write(meta(1, 1))
        f.write(leaf)


# -------------------------------------------------------------------- tests
def _write_store(path, n, tile_hw=24, seed=0, big_every=0):
    rng = np.random.RandomState(seed)
    raw = {}
    with LMDBTileWriter(path) as w:
        for i in range(n):
            key = f"slide_patch_{i:05d}".encode()
            size = 3000 if (big_every and i % big_every == 0) else 120
            val = rng.bytes(size)
            w.put_raw(key, val)
            raw[key] = val
    return raw


def test_spec_reader_parses_native_writer_single_leaf(tmp_path):
    path = str(tmp_path / "small.db")
    raw = _write_store(path, 8)
    r = SpecReader(path)
    items = dict(r.items())
    items.pop(b"__keys__")  # the writer always appends the index entry
    assert items == raw
    assert r.meta["main"]["entries"] == len(raw) + 1


def test_spec_reader_parses_native_writer_multilevel_and_overflow(tmp_path):
    """Enough entries to force branch pages, plus >page-size values to force
    overflow chains."""
    path = str(tmp_path / "big.db")
    rng = np.random.RandomState(1)
    raw = {}
    with LMDBTileWriter(path) as w:
        for i in range(600):
            key = f"k{i:06d}".encode()
            val = rng.bytes(9000 if i % 37 == 0 else 200)  # 9000 > 2 pages
            w.put_raw(key, val)
            raw[key] = val
    r = SpecReader(path)
    assert r.meta["main"]["depth"] >= 2, "test must exercise branch pages"
    assert r.meta["main"]["overflow"] > 0, "test must exercise overflow pages"
    items = dict(r.items())
    items.pop(b"__keys__")
    assert items == raw
    # spot point-lookups through the branch descent
    for i in (0, 36, 37, 599):
        assert r.get(f"k{i:06d}".encode()) == raw[f"k{i:06d}".encode()]


def test_spec_reader_agrees_with_native_reader_on_tiles(tmp_path):
    """Full tile pipeline: serialized+compressed tiles via the writer; the
    spec reader's raw bytes equal the native reader's."""
    path = str(tmp_path / "tiles.db")
    rng = np.random.RandomState(2)
    with LMDBTileWriter(path) as w:
        for i in range(20):
            w.put_tile(f"t_{i}", rng.randint(0, 255, (32, 32, 3), dtype=np.uint8))
    r = SpecReader(path)
    spec_items = dict(r.items())
    with LMDBTileStore(path) as store:
        keys = store.keys()
        assert set(spec_items) == set(keys) | {b"__keys__"}
        for k in keys:
            assert store.get_raw(k) == spec_items[k]


def test_native_reader_reads_hand_assembled_db(tmp_path):
    """Reader validation: a file assembled from the spec alone (independent
    of the C++ writer) must read through the native store."""
    path = str(tmp_path / "handmade.db")
    entries = {
        b"__keys__": b"placeholder-index",
        b"alpha": b"A" * 100,
        b"beta": b"B" * 7,
        b"gamma": bytes(range(64)),
    }
    assemble_minimal_db(path, entries)
    with LMDBTileStore(path) as store:
        for k, v in entries.items():
            assert store.get_raw(k) == v, k
