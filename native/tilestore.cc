// tilestore — native data-plane for rnagan_tpu.
//
// The reference's tile databases are single-file LMDB environments holding
// LZ4-frame-compressed pickled tiles (reference src/preprocess/
// patch_gen_grid.py:115-131, src/read_data.py:233-253). Neither the lmdb nor
// the lz4 python packages exist in this image, so this library implements,
// from the published formats:
//
//   * an LZ4 block + frame codec (decompresses linked- or independent-block
//     frames, emits independent-block frames any conformant decoder reads);
//   * a read-only LMDB 0.9 data-format reader (meta page selection, B+tree
//     descent, overflow-page values, full-tree key iteration) over mmap;
//   * an LMDB-format bulk writer (sorted leaves built bottom-up, overflow
//     chains, branch levels, dual meta pages) for producing tile databases
//     the reference toolchain can open.
//
// Exposed as a C ABI consumed via ctypes (rnagan_tpu/data/store.py).
// Assumes little-endian 64-bit hosts (the TPU-VM fleet) and 4096-byte pages.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

// ===========================================================================
// xxHash32 (needed for the LZ4 frame descriptor checksum)
// ===========================================================================

constexpr uint32_t kXxPrime1 = 2654435761U;
constexpr uint32_t kXxPrime2 = 2246822519U;
constexpr uint32_t kXxPrime3 = 3266489917U;
constexpr uint32_t kXxPrime4 = 668265263U;
constexpr uint32_t kXxPrime5 = 374761393U;

inline uint32_t rotl32(uint32_t x, int r) { return (x << r) | (x >> (32 - r)); }

inline uint32_t read_u32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

inline uint16_t read_u16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

inline uint64_t read_u64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

uint32_t xxh32(const uint8_t* input, size_t len, uint32_t seed) {
  const uint8_t* p = input;
  const uint8_t* end = input + len;
  uint32_t h;
  if (len >= 16) {
    uint32_t v1 = seed + kXxPrime1 + kXxPrime2;
    uint32_t v2 = seed + kXxPrime2;
    uint32_t v3 = seed;
    uint32_t v4 = seed - kXxPrime1;
    while (p + 16 <= end) {
      v1 = rotl32(v1 + read_u32(p) * kXxPrime2, 13) * kXxPrime1;
      v2 = rotl32(v2 + read_u32(p + 4) * kXxPrime2, 13) * kXxPrime1;
      v3 = rotl32(v3 + read_u32(p + 8) * kXxPrime2, 13) * kXxPrime1;
      v4 = rotl32(v4 + read_u32(p + 12) * kXxPrime2, 13) * kXxPrime1;
      p += 16;
    }
    h = rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18);
  } else {
    h = seed + kXxPrime5;
  }
  h += (uint32_t)len;
  while (p + 4 <= end) {
    h = rotl32(h + read_u32(p) * kXxPrime3, 17) * kXxPrime4;
    p += 4;
  }
  while (p < end) {
    h = rotl32(h + (*p) * kXxPrime5, 11) * kXxPrime1;
    ++p;
  }
  h ^= h >> 15;
  h *= kXxPrime2;
  h ^= h >> 13;
  h *= kXxPrime3;
  h ^= h >> 16;
  return h;
}

// ===========================================================================
// LZ4 block codec
// ===========================================================================

// Decompress one block appending into dst at offset dst_len (history before
// that offset is reachable for matches — this is what makes linked-block
// frames work: the whole frame decodes into one contiguous buffer).
int64_t lz4_block_decompress(const uint8_t* src, int64_t src_len, uint8_t* dst,
                             int64_t dst_off, int64_t dst_cap) {
  const uint8_t* ip = src;
  const uint8_t* iend = src + src_len;
  int64_t op = dst_off;
  while (ip < iend) {
    uint8_t token = *ip++;
    // literals
    int64_t lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do {
        if (ip >= iend) return -1;
        b = *ip++;
        lit += b;
      } while (b == 255);
    }
    if (ip + lit > iend || op + lit > dst_cap) return (op + lit > dst_cap) ? -2 : -1;
    std::memcpy(dst + op, ip, lit);
    ip += lit;
    op += lit;
    if (ip >= iend) break;  // last sequence has no match
    // match
    if (ip + 2 > iend) return -1;
    int64_t offset = read_u16(ip);
    ip += 2;
    if (offset == 0 || offset > op) return -1;
    int64_t mlen = (token & 15) + 4;
    if ((token & 15) == 15) {
      uint8_t b;
      do {
        if (ip >= iend) return -1;
        b = *ip++;
        mlen += b;
      } while (b == 255);
    }
    if (op + mlen > dst_cap) return -2;
    // overlap-safe copy
    const uint8_t* m = dst + op - offset;
    for (int64_t i = 0; i < mlen; ++i) dst[op + i] = m[i];
    op += mlen;
  }
  return op - dst_off;
}

// Fast greedy LZ4 block compressor (hash-table matcher, format-conformant).
int64_t lz4_block_compress(const uint8_t* src, int64_t n, uint8_t* dst, int64_t cap) {
  constexpr int kHashLog = 16;
  constexpr int64_t kMfLimit = 12;   // last 12 bytes are always literals
  // reusable scratch: zero-filling 64K entries per ~200KB tile would cost
  // more memory traffic than the payload (positions fit int32 per-block)
  thread_local std::vector<int32_t> table;
  table.assign(1 << kHashLog, -1);
  auto hash = [](uint32_t v) { return (v * 2654435761U) >> (32 - kHashLog); };

  const uint8_t* anchor = src;
  int64_t ip = 0, op = 0;
  const int64_t mflimit = n - kMfLimit;

  auto emit = [&](int64_t lit_len, const uint8_t* lits, int64_t match_len,
                  int64_t offset) -> bool {
    int64_t need = 1 + lit_len + lit_len / 255 + 1 + 2 + match_len / 255 + 1;
    if (op + need > cap) return false;
    uint8_t* token = dst + op++;
    // literal length
    if (lit_len >= 15) {
      *token = 15 << 4;
      int64_t rest = lit_len - 15;
      while (rest >= 255) { dst[op++] = 255; rest -= 255; }
      dst[op++] = (uint8_t)rest;
    } else {
      *token = (uint8_t)(lit_len << 4);
    }
    std::memcpy(dst + op, lits, lit_len);
    op += lit_len;
    if (match_len == 0) return true;  // final literal run
    dst[op++] = (uint8_t)(offset & 0xff);
    dst[op++] = (uint8_t)(offset >> 8);
    int64_t ml = match_len - 4;
    if (ml >= 15) {
      *token |= 15;
      ml -= 15;
      while (ml >= 255) { dst[op++] = 255; ml -= 255; }
      dst[op++] = (uint8_t)ml;
    } else {
      *token |= (uint8_t)ml;
    }
    return true;
  };

  if (n >= kMfLimit + 1) {
    while (ip < mflimit) {
      uint32_t seq = read_u32(src + ip);
      uint32_t h = hash(seq);
      int64_t cand = table[h];
      table[h] = (int32_t)ip;
      if (cand >= 0 && ip - cand <= 65535 && read_u32(src + cand) == seq) {
        // extend match
        int64_t mlen = 4;
        while (ip + mlen < mflimit + kMfLimit - 5 &&
               src[cand + mlen] == src[ip + mlen])
          ++mlen;
        int64_t lit_len = (src + ip) - anchor;
        if (!emit(lit_len, anchor, mlen, ip - cand)) return -2;
        ip += mlen;
        anchor = src + ip;
      } else {
        ++ip;
      }
    }
  }
  // trailing literals
  int64_t lit_len = (src + n) - anchor;
  if (!emit(lit_len, anchor, 0, 0)) return -2;
  return op;
}

// ===========================================================================
// LZ4 frame codec
// ===========================================================================

constexpr uint32_t kLz4Magic = 0x184D2204U;

// Decompress a full LZ4 frame. Returns decompressed size, -2 if dst_cap is
// insufficient, -1 on malformed input.
int64_t lz4f_decompress(const uint8_t* src, int64_t n, uint8_t* dst, int64_t dst_cap) {
  if (n < 7 || read_u32(src) != kLz4Magic) return -1;
  int64_t ip = 4;
  uint8_t flg = src[ip];
  // uint8_t bd = src[ip + 1];  // block-size bound: not needed for decode
  ip += 2;
  if ((flg >> 6) != 1) return -1;  // version
  bool block_checksum = flg & 0x10;
  bool content_size = flg & 0x08;
  bool content_checksum = flg & 0x04;
  bool dict_id = flg & 0x01;
  if (content_size) ip += 8;
  if (dict_id) ip += 4;
  ip += 1;  // header checksum byte
  if (ip > n) return -1;

  int64_t op = 0;
  while (true) {
    if (ip + 4 > n) return -1;
    uint32_t bsize = read_u32(src + ip);
    ip += 4;
    if (bsize == 0) break;  // end mark
    bool uncompressed = bsize & 0x80000000U;
    int64_t len = bsize & 0x7fffffffU;
    if (ip + len > n) return -1;
    if (uncompressed) {
      if (op + len > dst_cap) return -2;
      std::memcpy(dst + op, src + ip, len);
      op += len;
    } else {
      int64_t out = lz4_block_decompress(src + ip, len, dst, op, dst_cap);
      if (out < 0) return out;
      op += out;
    }
    ip += len;
    if (block_checksum) ip += 4;
  }
  if (content_checksum) {
    if (ip + 4 > n) return -1;
    if (read_u32(src + ip) != xxh32(dst, (size_t)op, 0)) return -1;
  }
  return op;
}

int64_t lz4f_compress_bound(int64_t n) {
  // worst case: one stored block per 4 MiB + header/trailer slack
  int64_t blocks = n / (4 << 20) + 1;
  return n + blocks * 8 + 64;
}

// Emit an independent-block frame (content size present, no checksums beyond
// the mandatory header checksum byte).
int64_t lz4f_compress(const uint8_t* src, int64_t n, uint8_t* dst, int64_t cap) {
  constexpr int64_t kBlock = 4 << 20;  // 4 MiB blocks (BD id 7)
  if (cap < 19) return -2;
  int64_t op = 0;
  std::memcpy(dst + op, &kLz4Magic, 4);
  op += 4;
  int64_t desc = op;
  dst[op++] = (1 << 6) | 0x20 | 0x08;  // v01, B.Indep, C.Size
  dst[op++] = 7 << 4;                  // 4 MiB max block
  std::memcpy(dst + op, &n, 8);
  op += 8;
  dst[op] = (uint8_t)((xxh32(dst + desc, (size_t)(op - desc), 0) >> 8) & 0xff);
  ++op;

  if (n == 0) {  // empty payload: one empty stored block
    uint32_t bsize = 0x80000000U;
    std::memcpy(dst + op, &bsize, 4);
    op += 4;
  }
  for (int64_t pos = 0; pos < n; pos += kBlock) {
    int64_t len = std::min(kBlock, n - pos);
    if (op + 4 > cap) return -2;
    int64_t size_at = op;
    op += 4;
    int64_t out = lz4_block_compress(src + pos, len, dst + op, std::min(cap - op, len - 1));
    uint32_t bsize;
    if (out <= 0 || out >= len) {  // incompressible -> stored block
      if (op + len > cap) return -2;
      std::memcpy(dst + op, src + pos, len);
      bsize = (uint32_t)len | 0x80000000U;
      op += len;
    } else {
      bsize = (uint32_t)out;
      op += out;
    }
    std::memcpy(dst + size_at, &bsize, 4);
  }
  if (op + 4 > cap) return -2;
  std::memset(dst + op, 0, 4);  // end mark
  op += 4;
  return op;
}

// ===========================================================================
// LMDB data format (v0.9, 4096-byte pages, 64-bit little-endian)
// ===========================================================================

constexpr uint32_t kMdbMagic = 0xBEEFC0DE;
constexpr uint32_t kMdbDataVersion = 1;
constexpr int64_t kPage = 4096;
constexpr int64_t kPageHdr = 16;
constexpr uint16_t P_BRANCH = 0x01, P_LEAF = 0x02, P_OVERFLOW = 0x04, P_META = 0x08;
constexpr uint16_t F_BIGDATA = 0x01;
constexpr uint64_t P_INVALID = ~(uint64_t)0;

// default LMDB key compare: memcmp, shorter string first on ties
int key_cmp(const uint8_t* a, int64_t alen, const uint8_t* b, int64_t blen) {
  int64_t m = std::min(alen, blen);
  int c = m ? std::memcmp(a, b, (size_t)m) : 0;
  if (c) return c;
  return alen < blen ? -1 : (alen > blen ? 1 : 0);
}

struct MetaInfo {
  uint64_t main_root = P_INVALID;
  uint64_t entries = 0;
  uint64_t last_pg = 0;
  uint64_t txnid = 0;
  uint32_t psize = 0;  // mm_psize aliases mm_dbs[FREE_DBI].md_pad in liblmdb
  bool valid = false;
};

MetaInfo parse_meta(const uint8_t* page) {
  MetaInfo m;
  const uint8_t* meta = page + kPageHdr;
  if (read_u32(meta) != kMdbMagic) return m;
  if (read_u32(meta + 4) != kMdbDataVersion) return m;
  m.psize = read_u32(meta + 24);  // mm_psize (free-db md_pad slot)
  const uint8_t* main_db = meta + 24 + 48;  // mm_dbs[1]
  m.entries = read_u64(main_db + 32);
  m.main_root = read_u64(main_db + 40);
  m.last_pg = read_u64(meta + 120);
  m.txnid = read_u64(meta + 128);
  m.valid = true;
  return m;
}

struct Reader {
  int fd = -1;
  const uint8_t* map = nullptr;
  int64_t size = 0;
  int64_t psize = kPage;
  MetaInfo meta;

  const uint8_t* page(uint64_t pgno) const {
    // guard against garbage pgnos from corrupt files (incl. mul overflow)
    if (pgno >= (uint64_t)(size / psize)) return nullptr;
    return map + (int64_t)pgno * psize;
  }
};

Reader* reader_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 2 * kPage) {
    ::close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, (size_t)st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* r = new Reader;
  r->fd = fd;
  r->map = (const uint8_t*)map;
  r->size = st.st_size;
  MetaInfo m0 = parse_meta(r->map);
  // real LMDB locates meta page 1 at offset mm_psize (may differ from 4096)
  int64_t psize = (m0.valid && m0.psize >= 512 && m0.psize <= 65536) ? (int64_t)m0.psize : kPage;
  r->psize = psize;
  MetaInfo m1 = (2 * psize <= st.st_size) ? parse_meta(r->map + psize) : MetaInfo{};
  if (!m0.valid && !m1.valid) {
    munmap(map, (size_t)st.st_size);
    ::close(fd);
    delete r;
    return nullptr;
  }
  r->meta = (!m1.valid || (m0.valid && m0.txnid >= m1.txnid)) ? m0 : m1;
  return r;
}

void reader_close(Reader* r) {
  if (!r) return;
  if (r->map) munmap((void*)r->map, (size_t)r->size);
  if (r->fd >= 0) ::close(r->fd);
  delete r;
}

struct NodeView {
  const uint8_t* key;
  int64_t klen;
  const uint8_t* data;   // inline data or 8-byte overflow pgno
  int64_t dlen;          // inline size (valid when !bigdata)
  uint16_t flags;
  uint64_t child_pgno;   // branch only
};

inline int num_keys(const uint8_t* page) {
  uint16_t lower = read_u16(page + 12);
  if (lower < kPageHdr) return 0;
  return (int)((lower - kPageHdr) / 2);
}

// Returns an invalid view (key == nullptr) when on-disk offsets point outside
// the page — corrupt files must surface as lookup failures, not wild reads.
NodeView node_at(const uint8_t* page, int idx, int64_t psize) {
  NodeView v;
  v.key = nullptr;
  v.klen = 0;
  uint16_t off = read_u16(page + kPageHdr + 2 * idx);
  if (off < kPageHdr || (int64_t)off + 8 > psize) return v;
  const uint8_t* n = page + off;
  uint16_t lo = read_u16(n), hi = read_u16(n + 2), fl = read_u16(n + 4);
  v.flags = fl;
  v.klen = read_u16(n + 6);
  if ((int64_t)off + 8 + v.klen > psize) {
    v.key = nullptr;
    return v;
  }
  v.key = n + 8;
  v.data = n + 8 + v.klen;
  v.dlen = (int64_t)lo | ((int64_t)hi << 16);
  v.child_pgno = (uint64_t)lo | ((uint64_t)hi << 16) | ((uint64_t)fl << 32);
  return v;
}

// value of a leaf node, following overflow chains
bool leaf_value(const Reader* r, const NodeView& v, const uint8_t** data, int64_t* len) {
  if (!v.key) return false;
  if (v.flags & F_BIGDATA) {
    uint64_t ovpg = read_u64(v.data);
    const uint8_t* p = r->page(ovpg);
    if (!p || !(read_u16(p + 10) & P_OVERFLOW)) return false;
    // the whole chain (header + value) must lie inside the mapping — a
    // truncated file must fail the lookup, not SIGBUS during memcpy
    if (v.dlen < 0 || (int64_t)ovpg * r->psize + kPageHdr + v.dlen > r->size) return false;
    *data = p + kPageHdr;
    *len = v.dlen;
    return true;
  }
  *data = v.data;
  *len = v.dlen;
  return true;
}

// B+tree point lookup
bool lmdb_get(const Reader* r, const uint8_t* key, int64_t klen, const uint8_t** data, int64_t* len) {
  uint64_t pgno = r->meta.main_root;
  if (pgno == P_INVALID) return false;
  for (int depth = 0; depth < 32; ++depth) {
    const uint8_t* p = r->page(pgno);
    if (!p) return false;
    uint16_t flags = read_u16(p + 10);
    int nk = num_keys(p);
    if (flags & P_LEAF) {
      int lo = 0, hi = nk - 1;
      while (lo <= hi) {
        int mid = (lo + hi) / 2;
        NodeView v = node_at(p, mid, r->psize);
        if (!v.key) return false;
        int c = key_cmp(key, klen, v.key, v.klen);
        if (c == 0) return leaf_value(r, v, data, len);
        if (c < 0)
          hi = mid - 1;
        else
          lo = mid + 1;
      }
      return false;
    } else if (flags & P_BRANCH) {
      // find last child whose separator <= key (node 0 has empty key)
      int lo = 1, hi = nk - 1, best = 0;
      while (lo <= hi) {
        int mid = (lo + hi) / 2;
        NodeView v = node_at(p, mid, r->psize);
        if (!v.key) return false;
        if (key_cmp(v.key, v.klen, key, klen) <= 0) {
          best = mid;
          lo = mid + 1;
        } else {
          hi = mid - 1;
        }
      }
      NodeView b = node_at(p, best, r->psize);
      if (!b.key && b.klen) return false;
      pgno = b.child_pgno;
    } else {
      return false;
    }
  }
  return false;
}

// depth-first in-order walk collecting keys
void lmdb_walk(const Reader* r, uint64_t pgno, std::vector<std::string>* out, int depth = 0) {
  if (pgno == P_INVALID || depth > 32) return;
  const uint8_t* p = r->page(pgno);
  if (!p) return;
  uint16_t flags = read_u16(p + 10);
  int nk = num_keys(p);
  if (flags & P_LEAF) {
    for (int i = 0; i < nk; ++i) {
      NodeView v = node_at(p, i, r->psize);
      if (v.key) out->emplace_back((const char*)v.key, (size_t)v.klen);
    }
  } else if (flags & P_BRANCH) {
    for (int i = 0; i < nk; ++i) {
      NodeView v = node_at(p, i, r->psize);
      if (v.key || v.klen == 0) lmdb_walk(r, v.child_pgno, out, depth + 1);
    }
  }
}

// ---------------------------------------------------------------- writer

struct Writer {
  std::string path;
  std::vector<std::pair<std::string, std::string>> items;
};

struct BuiltPages {
  std::vector<uint8_t> data;   // pages from pgno 2 upward
  uint64_t next_pgno = 2;
  uint64_t n_leaf = 0, n_branch = 0, n_overflow = 0;

  uint8_t* add_page(uint64_t* pgno, uint16_t flags, uint32_t ovpages = 1) {
    *pgno = next_pgno;
    size_t base = data.size();
    data.resize(base + (size_t)kPage * (flags == P_OVERFLOW ? ovpages : 1), 0);
    uint8_t* p = data.data() + base;
    std::memcpy(p, pgno, 8);
    uint16_t pad = 0;
    std::memcpy(p + 8, &pad, 2);
    std::memcpy(p + 10, &flags, 2);
    if (flags == P_OVERFLOW) {
      std::memcpy(p + 12, &ovpages, 4);
      next_pgno += ovpages;
    } else {
      uint16_t lower = kPageHdr, upper = (uint16_t)kPage;
      std::memcpy(p + 12, &lower, 2);
      std::memcpy(p + 14, &upper, 2);
      next_pgno += 1;
    }
    return p;
  }
};

// append one node to a page under construction; returns false if it no longer fits
bool page_add_node(uint8_t* p, const std::string& key, const uint8_t* data, int64_t dlen,
                   uint16_t nflags, uint64_t branch_child) {
  uint16_t lower = read_u16(p + 12), upper = read_u16(p + 14);
  int64_t payload = (nflags & F_BIGDATA) ? 8 : dlen;
  bool is_branch = branch_child != P_INVALID;
  if (is_branch) payload = 0;
  int64_t nsize = 8 + (int64_t)key.size() + payload;
  nsize = (nsize + 1) & ~1LL;  // even alignment
  if (lower + 2 + nsize > upper) return false;
  uint16_t off = (uint16_t)(upper - nsize);
  uint8_t* n = p + off;
  uint16_t lo, hi, fl;
  if (is_branch) {
    lo = (uint16_t)(branch_child & 0xffff);
    hi = (uint16_t)((branch_child >> 16) & 0xffff);
    fl = (uint16_t)((branch_child >> 32) & 0xffff);
  } else {
    lo = (uint16_t)(dlen & 0xffff);
    hi = (uint16_t)((dlen >> 16) & 0xffff);
    fl = nflags;
  }
  std::memcpy(n, &lo, 2);
  std::memcpy(n + 2, &hi, 2);
  std::memcpy(n + 4, &fl, 2);
  uint16_t ks = (uint16_t)key.size();
  std::memcpy(n + 6, &ks, 2);
  std::memcpy(n + 8, key.data(), key.size());
  if (!is_branch && payload > 0) std::memcpy(n + 8 + key.size(), data, (size_t)payload);
  int nk = (lower - kPageHdr) / 2;
  std::memcpy(p + kPageHdr + 2 * nk, &off, 2);
  lower += 2;
  upper = off;
  std::memcpy(p + 12, &lower, 2);
  std::memcpy(p + 14, &upper, 2);
  return true;
}

void write_meta(uint8_t* page, uint64_t pgno, uint64_t main_root, uint64_t entries,
                uint16_t depth, uint64_t branch_pages, uint64_t leaf_pages,
                uint64_t overflow_pages, uint64_t last_pg, uint64_t txnid, uint64_t mapsize) {
  std::memset(page, 0, kPage);
  std::memcpy(page, &pgno, 8);
  uint16_t flags = P_META;
  std::memcpy(page + 10, &flags, 2);
  uint8_t* m = page + kPageHdr;
  std::memcpy(m, &kMdbMagic, 4);
  std::memcpy(m + 4, &kMdbDataVersion, 4);
  // mm_address = 0
  std::memcpy(m + 16, &mapsize, 8);
  // mm_dbs[0] — FREE db, empty. Its md_pad slot aliases mm_psize in liblmdb;
  // real LMDB uses it to locate meta page 1 and size the map — leaving it 0
  // makes liblmdb divide by zero at open.
  uint8_t* freedb = m + 24;
  uint32_t psize = (uint32_t)kPage;
  std::memcpy(freedb, &psize, 4);
  uint16_t fdepth = 0;
  std::memcpy(freedb + 6, &fdepth, 2);
  uint64_t inval = P_INVALID;
  std::memcpy(freedb + 40, &inval, 8);
  // mm_dbs[1] — MAIN db
  uint8_t* maindb = m + 72;
  std::memcpy(maindb + 6, &depth, 2);
  std::memcpy(maindb + 8, &branch_pages, 8);
  std::memcpy(maindb + 16, &leaf_pages, 8);
  std::memcpy(maindb + 24, &overflow_pages, 8);
  std::memcpy(maindb + 32, &entries, 8);
  std::memcpy(maindb + 40, &main_root, 8);
  std::memcpy(m + 120, &last_pg, 8);
  std::memcpy(m + 128, &txnid, 8);
}

int64_t writer_close(Writer* w) {
  auto& items = w->items;
  std::stable_sort(items.begin(), items.end(), [](const auto& a, const auto& b) {
    return key_cmp((const uint8_t*)a.first.data(), (int64_t)a.first.size(),
                   (const uint8_t*)b.first.data(), (int64_t)b.first.size()) < 0;
  });
  // duplicate keys: keep the LAST put (LMDB put-overwrite semantics)
  std::vector<std::pair<std::string, std::string>> dedup;
  dedup.reserve(items.size());
  for (size_t i = 0; i < items.size(); ++i) {
    if (i + 1 < items.size() && items[i + 1].first == items[i].first) continue;
    dedup.push_back(std::move(items[i]));
  }
  items = std::move(dedup);

  BuiltPages bp;
  constexpr int64_t kInlineMax = 1024;  // larger values go to overflow pages

  struct Entry {
    std::string key;
    uint64_t pgno;
  };
  std::vector<Entry> level;  // (first key, leaf pgno)

  uint64_t cur_pgno = 0;
  uint8_t* cur = nullptr;
  size_t cur_off = 0;  // offset of current page in bp.data (pointers may move)
  std::string cur_first;

  auto flush_leaf = [&]() {
    if (cur) level.push_back({cur_first, cur_pgno});
    cur = nullptr;
  };

  for (auto& [key, val] : items) {
    uint16_t nflags = 0;
    uint64_t ovpg = 0;
    const uint8_t* payload = (const uint8_t*)val.data();
    int64_t plen = (int64_t)val.size();
    if (plen > kInlineMax) {
      uint32_t ovpages = (uint32_t)((kPageHdr + plen + kPage - 1) / kPage);
      uint8_t* op = bp.add_page(&ovpg, P_OVERFLOW, ovpages);
      std::memcpy(op + kPageHdr, val.data(), val.size());
      bp.n_overflow += ovpages;
      nflags = F_BIGDATA;
      payload = (const uint8_t*)&ovpg;
      // dlen stays the data size; node payload is the 8-byte pgno
    }
    for (int attempt = 0; attempt < 2; ++attempt) {
      if (!cur) {
        cur = bp.add_page(&cur_pgno, P_LEAF);
        cur_off = (size_t)(cur - bp.data.data());
        cur_first = key;
        bp.n_leaf += 1;
      }
      cur = bp.data.data() + cur_off;  // re-anchor after any reallocation
      if (page_add_node(cur, key, payload, plen, nflags, P_INVALID)) break;
      flush_leaf();
    }
  }
  flush_leaf();

  uint16_t depth = 1;
  uint64_t root = level.empty() ? P_INVALID : level[0].pgno;
  while (level.size() > 1) {
    std::vector<Entry> next;
    uint64_t bpg = 0;
    uint8_t* bpage = nullptr;
    size_t bpage_off = 0;
    std::string bfirst;
    int idx_in_page = 0;
    for (auto& e : level) {
      for (int attempt = 0; attempt < 2; ++attempt) {
        if (!bpage) {
          bpage = bp.add_page(&bpg, P_BRANCH);
          bpage_off = (size_t)(bpage - bp.data.data());
          bfirst = e.key;
          idx_in_page = 0;
          bp.n_branch += 1;
        }
        bpage = bp.data.data() + bpage_off;
        std::string k = idx_in_page == 0 ? std::string() : e.key;  // leftmost: empty key
        if (page_add_node(bpage, k, nullptr, 0, 0, e.pgno)) {
          ++idx_in_page;
          break;
        }
        next.push_back({bfirst, bpg});
        bpage = nullptr;
      }
    }
    if (bpage) next.push_back({bfirst, bpg});
    level = std::move(next);
    ++depth;
    root = level[0].pgno;
  }
  if (items.empty()) depth = 0;

  uint64_t last_pg = bp.next_pgno - 1;
  uint64_t mapsize = (uint64_t)(last_pg + 1) * kPage;
  if (mapsize < (uint64_t)1048576) mapsize = 1048576;
  std::vector<uint8_t> meta(2 * kPage);
  // meta page 1 carries the committed txn (txnid 1); page 0 is the older state
  write_meta(meta.data(), 0, P_INVALID, 0, 0, 0, 0, 0, 1, 0, mapsize);
  write_meta(meta.data() + kPage, 1, root, items.size(), depth, bp.n_branch, bp.n_leaf,
             bp.n_overflow, last_pg, 1, mapsize);

  FILE* f = fopen(w->path.c_str(), "wb");
  if (!f) return -1;
  bool ok = fwrite(meta.data(), 1, meta.size(), f) == meta.size() &&
            (bp.data.empty() || fwrite(bp.data.data(), 1, bp.data.size(), f) == bp.data.size());
  if (fclose(f) != 0) ok = false;
  return ok ? (int64_t)items.size() : -1;
}

// ===========================================================================
// Bulk tile decode
// ===========================================================================
// Tile values are pickle.dumps((name, raw_bytes, shape)) (reference
// patch_gen_grid.py:117,141). A general unpickler is not needed: scan the
// binary opcode stream (protocols 2-5) for the one large bytes payload and
// the trailing small ints (the shape tuple). Unknown opcodes fail the parse
// and the Python caller falls back to pickle.loads for that entry.

struct TilePickle {
  const uint8_t* payload = nullptr;
  int64_t payload_len = 0;
  int64_t shape[4] = {0, 0, 0, 0};
  int n_shape = 0;
};

bool parse_tile_pickle(const uint8_t* p, int64_t n, TilePickle* out) {
  int64_t i = 0;
  int64_t ints[8];
  int n_ints = 0;
  auto need = [&](int64_t k) { return i + k <= n; };
  while (i < n) {
    uint8_t op = p[i++];
    switch (op) {
      case 0x80:  // PROTO
        if (!need(1)) return false;
        i += 1;
        break;
      case 0x95:  // FRAME (protocol 4+)
        if (!need(8)) return false;
        i += 8;
        break;
      case 0x8c: {  // SHORT_BINUNICODE
        if (!need(1)) return false;
        uint8_t l = p[i];
        i += 1;
        if (!need(l)) return false;
        i += l;
        break;
      }
      case 'X': {  // BINUNICODE
        if (!need(4)) return false;
        uint32_t l = read_u32(p + i);
        i += 4;
        if (!need((int64_t)l)) return false;
        i += (int64_t)l;
        break;
      }
      case 0x8d: {  // BINUNICODE8
        if (!need(8)) return false;
        uint64_t l = read_u64(p + i);
        i += 8;
        if (!need((int64_t)l)) return false;
        i += (int64_t)l;
        break;
      }
      case 'C': {  // SHORT_BINBYTES
        if (!need(1)) return false;
        uint8_t l = p[i];
        i += 1;
        if (!need(l)) return false;
        out->payload = p + i;
        out->payload_len = l;
        i += l;
        n_ints = 0;
        break;
      }
      case 'B': {  // BINBYTES
        if (!need(4)) return false;
        uint32_t l = read_u32(p + i);
        i += 4;
        if (!need((int64_t)l)) return false;
        out->payload = p + i;
        out->payload_len = (int64_t)l;
        i += (int64_t)l;
        n_ints = 0;
        break;
      }
      case 0x8e: {  // BINBYTES8
        if (!need(8)) return false;
        uint64_t l = read_u64(p + i);
        i += 8;
        if (!need((int64_t)l)) return false;
        out->payload = p + i;
        out->payload_len = (int64_t)l;
        i += (int64_t)l;
        n_ints = 0;
        break;
      }
      case 'K':  // BININT1
        if (!need(1)) return false;
        if (n_ints < 8) ints[n_ints++] = p[i];
        i += 1;
        break;
      case 'M':  // BININT2
        if (!need(2)) return false;
        if (n_ints < 8) ints[n_ints++] = read_u16(p + i);
        i += 2;
        break;
      case 'J':  // BININT (signed 4 bytes)
        if (!need(4)) return false;
        if (n_ints < 8) ints[n_ints++] = (int32_t)read_u32(p + i);
        i += 4;
        break;
      case 'q':  // BINPUT (protocols 2-3 memo writes)
        if (!need(1)) return false;
        i += 1;
        break;
      case 'r':  // LONG_BINPUT
        if (!need(4)) return false;
        i += 4;
        break;
      case 0x94:  // MEMOIZE
      case 0x85:  // TUPLE1
      case 0x86:  // TUPLE2
      case 0x87:  // TUPLE3
      case '(':   // MARK
      case 't':   // TUPLE
        break;
      case '.':  // STOP: expect payload + a 2-4 int shape tuple
        if (!out->payload || n_ints < 2 || n_ints > 4) return false;
        out->n_shape = n_ints;
        for (int k = 0; k < n_ints; ++k) out->shape[k] = ints[k];
        return true;
      default:
        return false;  // unsupported opcode
    }
  }
  return false;
}

enum TileStatus : uint8_t {
  TILE_OK = 0,
  TILE_MISSING = 1,
  TILE_DECOMPRESS_FAIL = 2,
  TILE_PARSE_FAIL = 3,
  TILE_SHAPE_MISMATCH = 4,
};

// One tile: lookup -> decompress -> parse -> BGR->RGB into dst.
TileStatus load_one_tile(const Reader* r, const uint8_t* key, int64_t klen,
                         int64_t h, int64_t w, std::vector<uint8_t>& scratch,
                         uint8_t* dst) {
  const uint8_t* val;
  int64_t vlen;
  if (!lmdb_get(r, key, klen, &val, &vlen)) return TILE_MISSING;
  const int64_t tile_bytes = h * w * 3;
  if ((int64_t)scratch.size() < tile_bytes + 65536) scratch.resize(tile_bytes + 65536);
  int64_t n = lz4f_decompress(val, vlen, scratch.data(), (int64_t)scratch.size());
  if (n == -2) {  // oversized pickle (long name / padding): one growth retry
    scratch.resize(2 * scratch.size() + (size_t)tile_bytes);
    n = lz4f_decompress(val, vlen, scratch.data(), (int64_t)scratch.size());
  }
  if (n < 0) return TILE_DECOMPRESS_FAIL;
  TilePickle t;
  if (!parse_tile_pickle(scratch.data(), n, &t)) return TILE_PARSE_FAIL;
  if (t.n_shape != 3 || t.shape[0] != h || t.shape[1] != w || t.shape[2] != 3 ||
      t.payload_len != tile_bytes)
    return TILE_SHAPE_MISMATCH;
  const uint8_t* src = t.payload;
  for (int64_t px = 0; px < tile_bytes; px += 3) {  // stored BGR -> RGB
    dst[px] = src[px + 2];
    dst[px + 1] = src[px + 1];
    dst[px + 2] = src[px];
  }
  return TILE_OK;
}

}  // namespace

// ===========================================================================
// C ABI
// ===========================================================================

extern "C" {

int64_t ts_lz4f_decompress(const uint8_t* src, int64_t n, uint8_t* dst, int64_t cap) {
  return lz4f_decompress(src, n, dst, cap);
}

int64_t ts_lz4f_compress_bound(int64_t n) { return lz4f_compress_bound(n); }

int64_t ts_lz4f_compress(const uint8_t* src, int64_t n, uint8_t* dst, int64_t cap) {
  return lz4f_compress(src, n, dst, cap);
}

uint32_t ts_xxh32(const uint8_t* src, int64_t n, uint32_t seed) {
  return xxh32(src, (size_t)n, seed);
}

void* ts_lmdb_open(const char* path) { return reader_open(path); }

void ts_lmdb_close(void* h) { reader_close((Reader*)h); }

int64_t ts_lmdb_entries(void* h) { return (int64_t)((Reader*)h)->meta.entries; }

// Returns value size; copies into dst if it fits. -1 if key absent.
int64_t ts_lmdb_get(void* h, const uint8_t* key, int64_t klen, uint8_t* dst, int64_t cap) {
  const uint8_t* data;
  int64_t len;
  if (!lmdb_get((Reader*)h, key, klen, &data, &len)) return -1;
  if (len <= cap) std::memcpy(dst, data, (size_t)len);
  return len;
}

// Serialize all keys as [u32 len][bytes]...; returns bytes needed (call twice).
int64_t ts_lmdb_keys(void* h, uint8_t* dst, int64_t cap) {
  auto* r = (Reader*)h;
  std::vector<std::string> entries;
  lmdb_walk(r, r->meta.main_root, &entries);
  int64_t need = 0;
  for (auto& k : entries) need += 4 + (int64_t)k.size();
  if (need > cap) return need;
  int64_t op = 0;
  for (auto& k : entries) {
    uint32_t l = (uint32_t)k.size();
    std::memcpy(dst + op, &l, 4);
    op += 4;
    std::memcpy(dst + op, k.data(), k.size());
    op += (int64_t)k.size();
  }
  return need;
}

void* ts_lmdb_writer_create(const char* path) {
  auto* w = new Writer;
  w->path = path;
  return w;
}

int ts_lmdb_writer_put(void* h, const uint8_t* key, int64_t klen, const uint8_t* val, int64_t vlen) {
  auto* w = (Writer*)h;
  if (klen <= 0 || klen > 511) return -1;  // LMDB default max key size
  w->items.emplace_back(std::string((const char*)key, (size_t)klen),
                        std::string((const char*)val, (size_t)vlen));
  return 0;
}

// Bulk tile decode (the data-plane hot path): for each key, B+tree lookup ->
// LZ4-frame decompress -> pickle payload/shape extract -> BGR->RGB into
// dst[i] (h*w*3 bytes per tile), threaded across keys. keys are packed as
// [u32 len][bytes]... (the ts_lmdb_keys wire format). status[i] gets a
// TileStatus; returns the number of OK tiles, or -1 on malformed key packing.
int64_t ts_lmdb_load_batch(void* h, const uint8_t* keys, int64_t keys_bytes,
                           int64_t n_keys, int64_t height, int64_t width,
                           uint8_t* dst, uint8_t* status, int nthreads) {
  auto* r = (Reader*)h;
  std::vector<std::pair<const uint8_t*, int64_t>> kv;
  kv.reserve((size_t)n_keys);
  int64_t off = 0;
  for (int64_t i = 0; i < n_keys; ++i) {
    if (off + 4 > keys_bytes) return -1;
    uint32_t l = read_u32(keys + off);
    off += 4;
    if (off + (int64_t)l > keys_bytes) return -1;
    kv.emplace_back(keys + off, (int64_t)l);
    off += (int64_t)l;
  }
  const int64_t tile_bytes = height * width * 3;
  int hw = (int)std::thread::hardware_concurrency();
  int T = nthreads > 0 ? nthreads : (hw > 0 ? hw : 4);
  if ((int64_t)T > n_keys) T = (int)n_keys;
  if (T < 1) T = 1;
  std::atomic<int64_t> n_ok{0};

  auto worker = [&](int t) {
    std::vector<uint8_t> scratch;
    int64_t ok = 0;
    for (int64_t i = t; i < n_keys; i += T) {
      TileStatus s = load_one_tile(r, kv[(size_t)i].first, kv[(size_t)i].second,
                                   height, width, scratch, dst + i * tile_bytes);
      status[i] = (uint8_t)s;
      if (s == TILE_OK) ++ok;
    }
    n_ok.fetch_add(ok, std::memory_order_relaxed);
  };
  if (T == 1) {
    worker(0);
  } else {
    std::vector<std::thread> threads;
    threads.reserve((size_t)T);
    for (int t = 0; t < T; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();
  }
  return n_ok.load();
}

int64_t ts_lmdb_writer_close(void* h) {
  auto* w = (Writer*)h;
  int64_t rc = writer_close(w);
  delete w;
  return rc;
}

}  // extern "C"
