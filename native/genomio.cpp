// libgenomio: native genomics-file runtime for the TPU pipeline.
//
// Re-provides the htslib capabilities the reference consumes via
// rust-htslib (/root/reference/src/main.rs:260-264,822-896), redesigned
// for batch processing: instead of a per-record iterator API, the whole
// BAM is decoded in one parallel pass into COLUMNAR arrays (structure of
// arrays) that Python wraps as zero-copy NumPy views and the pipeline
// consumes with vectorized operations.
//
//   * BGZF: block boundaries scanned serially (cheap), blocks inflated in
//     parallel with zlib raw-deflate.
//   * BAM records: offsets indexed serially (block_size hops), then
//     decoded in parallel: positions/flags/mapq, decoded sequence chars,
//     CIGAR-derived ref_end, aligned-reference intervals (M/=/X/D merged,
//     N splits — the useful_alignment semantics of src/main.rs:790-806),
//     and the CB-configurable / UB aux Z-tags.
//
// C ABI for ctypes; buffers are owned by the handle and freed with it.
//
// Build: native/build.sh -> vartrix_tpu/_native/libgenomio.so

#include <unistd.h>
#include <zlib.h>

#include <array>
#include <atomic>
#include <charconv>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <string>
#include <string_view>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

const char SEQ_NT16[17] = "=ACMGRSVTWYHKDBN";

struct RefInfo {
  std::string name;
  int32_t len;
};

template <typename F>
void parallel_chunks(int64_t n, int n_threads, F&& body) {
  if (n_threads <= 1 || n < 2) {
    body(0, n);
    return;
  }
  std::vector<std::thread> pool;
  int64_t per = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * per, hi = std::min(n, lo + per);
    if (lo >= hi) break;
    pool.emplace_back([&, lo, hi] { body(lo, hi); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

struct GioBam {
  std::vector<RefInfo> refs;
  int64_t n = 0;
  // columnar record data
  std::vector<int32_t> tid, pos, ref_end;
  std::vector<uint8_t> mapq;
  std::vector<uint16_t> flag;
  std::vector<int64_t> seq_off;   // n+1
  std::vector<uint8_t> seq_pool;  // decoded chars
  std::vector<int64_t> itv_off;   // n+1, into itv_pool (pairs)
  std::vector<int32_t> itv_pool;  // [start, end) aligned-ref intervals
  std::vector<int64_t> cb_off;    // n+1
  std::vector<uint8_t> cb_pool;
  std::vector<int64_t> ub_off;    // n+1
  std::vector<uint8_t> ub_pool;
  std::string error;
};

namespace {

bool inflate_block(const uint8_t* src, size_t src_len, uint8_t* dst,
                   size_t dst_len) {
  z_stream zs{};
  if (inflateInit2(&zs, -15) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(src);
  zs.avail_in = (uInt)src_len;
  zs.next_out = dst;
  zs.avail_out = (uInt)dst_len;
  int ret = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return ret == Z_STREAM_END && zs.avail_out == 0;
}

// scan a record's aux fields for two Z-tags
void scan_aux(const uint8_t* p, const uint8_t* end, const char* tag1,
              const char* tag2, const uint8_t** v1, int32_t* l1,
              const uint8_t** v2, int32_t* l2) {
  *v1 = *v2 = nullptr;
  *l1 = *l2 = 0;
  while (p + 3 <= end) {
    char t0 = (char)p[0], t1 = (char)p[1], typ = (char)p[2];
    p += 3;
    switch (typ) {
      case 'Z':
      case 'H': {
        const uint8_t* s = p;
        while (p < end && *p) ++p;
        if (typ == 'Z') {
          if (t0 == tag1[0] && t1 == tag1[1]) { *v1 = s; *l1 = (int32_t)(p - s); }
          if (t0 == tag2[0] && t1 == tag2[1]) { *v2 = s; *l2 = (int32_t)(p - s); }
        }
        ++p;  // NUL
        break;
      }
      case 'A': case 'c': case 'C': p += 1; break;
      case 's': case 'S': p += 2; break;
      case 'i': case 'I': case 'f': p += 4; break;
      case 'B': {
        if (p + 5 > end) return;
        char sub = (char)p[0];
        int32_t cnt;
        memcpy(&cnt, p + 1, 4);
        int sz = (sub == 'c' || sub == 'C') ? 1 : (sub == 's' || sub == 'S') ? 2 : 4;
        p += 5 + (int64_t)cnt * sz;
        break;
      }
      default:
        return;  // unknown tag type: stop scanning this record
    }
  }
}

// CG:B,I long-CIGAR tag: records with > 65535 ops carry a kSmN
// placeholder cigar and the true ops in aux (htslib convention). Returns
// a pointer to the packed uint32 ops + count, or nullptr.
static const uint8_t* find_cg(const uint8_t* p, const uint8_t* end,
                              int32_t* n_ops) {
  while (p + 3 <= end) {
    char t0 = (char)p[0], t1 = (char)p[1], typ = (char)p[2];
    p += 3;
    switch (typ) {
      case 'Z':
      case 'H':
        while (p < end && *p) ++p;
        ++p;
        break;
      case 'A': case 'c': case 'C': p += 1; break;
      case 's': case 'S': p += 2; break;
      case 'i': case 'I': case 'f': p += 4; break;
      case 'B': {
        if (p + 5 > end) return nullptr;
        char sub = (char)p[0];
        int32_t cnt;
        memcpy(&cnt, p + 1, 4);
        if (t0 == 'C' && t1 == 'G' && sub == 'I') {
          *n_ops = cnt;
          return p + 5;
        }
        int sz = (sub == 'c' || sub == 'C') ? 1 : (sub == 's' || sub == 'S') ? 2 : 4;
        p += 5 + (int64_t)cnt * sz;
        break;
      }
      default:
        return nullptr;
    }
  }
  return nullptr;
}

// Resolve a record's effective CIGAR: the in-record ops, or the CG tag's
// when the in-record cigar is the kSmN placeholder.
static void effective_cigar(const uint8_t* cig, uint16_t n_cigar,
                            int32_t l_seq, const uint8_t* aux,
                            const uint8_t* bend, const uint8_t** ops_out,
                            int32_t* n_out) {
  *ops_out = cig;
  *n_out = n_cigar;
  if (n_cigar != 2 || l_seq == 0) return;
  uint32_t v0, v1;
  memcpy(&v0, cig, 4);
  memcpy(&v1, cig + 4, 4);
  if ((v0 & 0xF) == 4 && (int32_t)(v0 >> 4) == l_seq && (v1 & 0xF) == 3) {
    int32_t cnt = 0;
    const uint8_t* cg = find_cg(aux, bend, &cnt);
    if (cg) {
      *ops_out = cg;
      *n_out = cnt;
    }
  }
}

// Decode passes shared by the whole-file and region loaders: rec_ptr[i]
// points at record i's 4-byte block_size prefix in some inflated buffer.
static void decode_records(GioBam* h, const uint8_t* const* rec_ptr,
                           int64_t n, const char* cb_tag, int n_threads) {
  h->n = n;
  h->tid.resize(n);
  h->pos.resize(n);
  h->ref_end.resize(n);
  h->mapq.resize(n);
  h->flag.resize(n);
  h->seq_off.resize(n + 1);
  h->itv_off.resize(n + 1);
  h->cb_off.resize(n + 1);
  h->ub_off.resize(n + 1);

  // --- pass A: per-record sizes (parallel) for pool offsets ---
  std::vector<int32_t> seq_len(n), itv_cnt(n), cb_len(n), ub_len(n);
  const char* ub_tag = "UB";
  parallel_chunks(n, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const uint8_t* r = rec_ptr[i];
      int32_t bs;
      memcpy(&bs, r, 4);
      const uint8_t* body = r + 4;
      const uint8_t* bend = body + bs;
      int32_t l_seq;
      uint8_t l_read_name = body[8];
      uint16_t n_cigar;
      memcpy(&n_cigar, body + 12, 2);
      memcpy(&l_seq, body + 16, 4);
      seq_len[i] = l_seq;
      const uint8_t* cig = body + 32 + l_read_name;
      const uint8_t* aux = cig + 4 * n_cigar + (l_seq + 1) / 2 + l_seq;
      const uint8_t* ops;
      int32_t n_ops;
      effective_cigar(cig, n_cigar, l_seq, aux, bend, &ops, &n_ops);
      // count aligned intervals: runs of M/=/X/D separated by N
      int cnt = 0;
      bool open = false;
      for (int32_t c = 0; c < n_ops; ++c) {
        uint32_t v;
        memcpy(&v, ops + 4 * c, 4);
        uint32_t op = v & 0xF;
        if (op == 0 || op == 7 || op == 8 || op == 2) {
          if (!open) { ++cnt; open = true; }
        } else if (op == 3) {
          open = false;
        }
      }
      itv_cnt[i] = cnt;
      const uint8_t *v1, *v2;
      int32_t l1, l2;
      scan_aux(aux, bend, cb_tag, ub_tag, &v1, &l1, &v2, &l2);
      cb_len[i] = l1;
      ub_len[i] = l2;
    }
  });
  h->seq_off[0] = h->itv_off[0] = h->cb_off[0] = h->ub_off[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    h->seq_off[i + 1] = h->seq_off[i] + seq_len[i];
    h->itv_off[i + 1] = h->itv_off[i] + itv_cnt[i];
    h->cb_off[i + 1] = h->cb_off[i] + cb_len[i];
    h->ub_off[i + 1] = h->ub_off[i] + ub_len[i];
  }
  h->seq_pool.resize((size_t)h->seq_off[n]);
  h->itv_pool.resize((size_t)h->itv_off[n] * 2);
  h->cb_pool.resize((size_t)h->cb_off[n]);
  h->ub_pool.resize((size_t)h->ub_off[n]);

  // --- pass B: full decode (parallel) ---
  parallel_chunks(n, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      const uint8_t* r = rec_ptr[i];
      int32_t bs;
      memcpy(&bs, r, 4);
      const uint8_t* body = r + 4;
      const uint8_t* bend = body + bs;
      int32_t refid, p0, l_seq;
      memcpy(&refid, body, 4);
      memcpy(&p0, body + 4, 4);
      uint8_t l_read_name = body[8];
      h->mapq[i] = body[9];
      uint16_t n_cigar, flg;
      memcpy(&n_cigar, body + 12, 2);
      memcpy(&flg, body + 14, 2);
      memcpy(&l_seq, body + 16, 4);
      h->tid[i] = refid;
      h->pos[i] = p0;
      h->flag[i] = flg;
      const uint8_t* cig = body + 32 + l_read_name;
      const uint8_t* aux0 = cig + 4 * n_cigar + (l_seq + 1) / 2 + l_seq;
      const uint8_t* ops;
      int32_t n_ops;
      effective_cigar(cig, n_cigar, l_seq, aux0, bend, &ops, &n_ops);
      // ref_end + aligned intervals
      int32_t rp = p0;
      int64_t iv = h->itv_off[i] * 2;
      bool open = false;
      int32_t ref_len = 0;
      for (int32_t c = 0; c < n_ops; ++c) {
        uint32_t v;
        memcpy(&v, ops + 4 * c, 4);
        uint32_t op = v & 0xF;
        int32_t l = (int32_t)(v >> 4);
        bool consumes_ref = (op == 0 || op == 2 || op == 3 || op == 7 || op == 8);
        bool aligned = (op == 0 || op == 2 || op == 7 || op == 8);
        if (aligned) {
          if (!open) {
            h->itv_pool[iv] = rp;
            h->itv_pool[iv + 1] = rp + l;
            open = true;
          } else {
            h->itv_pool[iv + 1] = rp + l;
          }
        } else if (op == 3 && open) {
          iv += 2;
          open = false;
        }
        if (consumes_ref) {
          rp += l;
          ref_len += l;
        }
      }
      h->ref_end[i] = ref_len > 0 ? p0 + ref_len : p0 + 1;
      // sequence decode
      const uint8_t* sq = cig + 4 * n_cigar;
      uint8_t* out = h->seq_pool.data() + h->seq_off[i];
      for (int32_t s = 0; s < l_seq; ++s) {
        uint8_t b = sq[s >> 1];
        out[s] = (uint8_t)SEQ_NT16[(s & 1) ? (b & 0xF) : (b >> 4)];
      }
      // aux tags
      const uint8_t* aux = sq + (l_seq + 1) / 2 + l_seq;
      const uint8_t *v1, *v2;
      int32_t l1, l2;
      scan_aux(aux, bend, cb_tag, "UB", &v1, &l1, &v2, &l2);
      if (l1) memcpy(h->cb_pool.data() + h->cb_off[i], v1, (size_t)l1);
      if (l2) memcpy(h->ub_pool.data() + h->ub_off[i], v2, (size_t)l2);
    }
  });
}

}  // namespace

extern "C" {

GioBam* gio_bam_load(const char* path, const char* cb_tag, int n_threads) {
  auto* h = new GioBam();
  FILE* f = fopen(path, "rb");
  if (!f) { h->error = "cannot open file"; return h; }
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> raw((size_t)fsize);
  if (fread(raw.data(), 1, (size_t)fsize, f) != (size_t)fsize) {
    fclose(f);
    h->error = "short read";
    return h;
  }
  fclose(f);

  // --- pass 1: BGZF block boundaries ---
  struct Block { size_t src_off, src_len, dst_off, dst_len; };
  std::vector<Block> blocks;
  size_t pos = 0, total = 0;
  while (pos + 28 <= raw.size()) {
    if (!(raw[pos] == 0x1f && raw[pos + 1] == 0x8b && raw[pos + 2] == 8 &&
          (raw[pos + 3] & 4))) {
      h->error = "not BGZF at offset " + std::to_string(pos);
      return h;
    }
    uint16_t xlen;
    memcpy(&xlen, raw.data() + pos + 10, 2);
    size_t xoff = pos + 12, xend = xoff + xlen;
    uint32_t bsize = 0;
    while (xoff + 4 <= xend) {
      uint16_t slen;
      memcpy(&slen, raw.data() + xoff + 2, 2);
      if (raw[xoff] == 'B' && raw[xoff + 1] == 'C' && slen == 2) {
        uint16_t bs;
        memcpy(&bs, raw.data() + xoff + 4, 2);
        bsize = (uint32_t)bs + 1;
      }
      xoff += 4 + slen;
    }
    if (!bsize) { h->error = "missing BC subfield"; return h; }
    uint32_t isize;
    memcpy(&isize, raw.data() + pos + bsize - 4, 4);
    blocks.push_back({xend, bsize - (xend - pos) - 8, total, isize});
    total += isize;
    pos += bsize;
  }

  // --- pass 2: parallel inflate ---
  std::vector<uint8_t> data(total);
  std::atomic<bool> ok(true);
  parallel_chunks((int64_t)blocks.size(), n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t b = lo; b < hi; ++b) {
      const Block& bl = blocks[b];
      if (bl.dst_len == 0) continue;
      if (!inflate_block(raw.data() + bl.src_off, bl.src_len,
                         data.data() + bl.dst_off, bl.dst_len))
        ok = false;
    }
  });
  if (!ok) { h->error = "BGZF inflate failure"; return h; }
  raw.clear();
  raw.shrink_to_fit();

  // --- header ---
  if (data.size() < 12 || memcmp(data.data(), "BAM\x01", 4) != 0) {
    h->error = "not a BAM stream";
    return h;
  }
  int32_t l_text;
  memcpy(&l_text, data.data() + 4, 4);
  size_t off = 8 + (size_t)l_text;
  int32_t n_ref;
  memcpy(&n_ref, data.data() + off, 4);
  off += 4;
  for (int32_t i = 0; i < n_ref; ++i) {
    int32_t l_name;
    memcpy(&l_name, data.data() + off, 4);
    std::string name((const char*)data.data() + off + 4, (size_t)l_name - 1);
    int32_t l_ref;
    memcpy(&l_ref, data.data() + off + 4 + l_name, 4);
    h->refs.push_back({name, l_ref});
    off += 8 + l_name;
  }

  // --- pass 3: index record offsets ---
  std::vector<size_t> rec_off;
  {
    size_t p = off;
    while (p + 4 <= data.size()) {
      int32_t bs;
      memcpy(&bs, data.data() + p, 4);
      if (bs <= 0 || p + 4 + (size_t)bs > data.size()) break;
      rec_off.push_back(p);
      p += 4 + (size_t)bs;
    }
  }
  int64_t n = (int64_t)rec_off.size();
  std::vector<const uint8_t*> rec_ptr(n);
  for (int64_t i = 0; i < n; ++i) rec_ptr[i] = data.data() + rec_off[i];
  decode_records(h, rec_ptr.data(), n, cb_tag, n_threads);
  return h;
}

// Decode a RAW (non-BGZF) BAM byte stream from memory into the columnar
// arrays — consumed by the native CRAM decoder (libcramio emits exactly
// this layout), avoiding any temp-file round trip.
GioBam* gio_bam_load_bytes(const uint8_t* data, int64_t len,
                           const char* cb_tag, int n_threads) {
  auto* h = new GioBam();
  if (len < 12 || memcmp(data, "BAM\x01", 4) != 0) {
    h->error = "not a BAM stream";
    return h;
  }
  int32_t l_text;
  memcpy(&l_text, data + 4, 4);
  size_t off = 8 + (size_t)l_text;
  int32_t n_ref;
  memcpy(&n_ref, data + off, 4);
  off += 4;
  for (int32_t i = 0; i < n_ref; ++i) {
    int32_t l_name;
    memcpy(&l_name, data + off, 4);
    std::string name((const char*)data + off + 4, (size_t)l_name - 1);
    int32_t l_ref;
    memcpy(&l_ref, data + off + 4 + l_name, 4);
    h->refs.push_back({name, l_ref});
    off += 8 + l_name;
  }
  std::vector<const uint8_t*> rec_ptr;
  {
    size_t p = off;
    while (p + 4 <= (size_t)len) {
      int32_t bs;
      memcpy(&bs, data + p, 4);
      if (bs <= 0 || p + 4 + (size_t)bs > (size_t)len) break;
      rec_ptr.push_back(data + p);
      p += 4 + (size_t)bs;
    }
  }
  decode_records(h, rec_ptr.data(), (int64_t)rec_ptr.size(), cb_tag,
                 n_threads);
  return h;
}

// Streaming whole-file loader: identical output to gio_bam_load, but the
// file is processed in bounded segments — read a batch of raw blocks,
// inflate them in parallel, decode the complete records they contain into
// the columnar arrays, carry partial-record bytes into the next segment,
// release the segment. Peak memory is the columnar output plus ONE
// segment, instead of raw file + fully-inflated stream + columns.
GioBam* gio_bam_load_stream(const char* path, const char* cb_tag,
                            int n_threads, int64_t segment_bytes) {
  if (segment_bytes <= 0) segment_bytes = 256 << 20;
  if (segment_bytes < (1 << 20)) segment_bytes = 1 << 20;  // >= max block
  auto* h = new GioBam();
  FILE* f = fopen(path, "rb");
  if (!f) { h->error = "cannot open file"; return h; }

  std::vector<uint8_t> raw(segment_bytes);
  size_t raw_len = 0;    // valid bytes in raw
  bool eof = false;
  auto refill = [&]() {
    if (eof) return;
    size_t got = fread(raw.data() + raw_len, 1, raw.size() - raw_len, f);
    raw_len += got;
    if (got == 0) eof = true;
  };
  refill();

  std::vector<uint8_t> data;   // inflated bytes carried across segments
  size_t data_consumed = 0;    // bytes of `data` already decoded
  bool header_done = false;
  size_t expect_hdr = 12;      // grows as header fields arrive

  // running columnar append state
  std::vector<int32_t> seq_len, itv_cnt, cb_len, ub_len;
  h->seq_off.push_back(0);
  h->itv_off.push_back(0);
  h->cb_off.push_back(0);
  h->ub_off.push_back(0);

  while (true) {
    // --- inflate every complete block currently in raw ---
    struct Blk { size_t src_off, src_len, dst_off, dst_len; };
    std::vector<Blk> blocks;
    size_t pos = 0;
    size_t dst_base = data.size();
    size_t add = 0;
    while (pos + 28 <= raw_len) {
      if (!(raw[pos] == 0x1f && raw[pos + 1] == 0x8b && raw[pos + 2] == 8 &&
            (raw[pos + 3] & 4))) {
        h->error = "not BGZF in stream";
        fclose(f);
        return h;
      }
      uint16_t xlen;
      memcpy(&xlen, raw.data() + pos + 10, 2);
      size_t xoff = pos + 12, xend = xoff + xlen;
      if (xend > raw_len) break;
      uint32_t bsize = 0;
      while (xoff + 4 <= xend) {
        uint16_t slen;
        memcpy(&slen, raw.data() + xoff + 2, 2);
        if (raw[xoff] == 'B' && raw[xoff + 1] == 'C' && slen == 2) {
          uint16_t bs;
          memcpy(&bs, raw.data() + xoff + 4, 2);
          bsize = (uint32_t)bs + 1;
        }
        xoff += 4 + slen;
      }
      if (!bsize) { h->error = "missing BC subfield"; fclose(f); return h; }
      if (pos + bsize > raw_len) break;  // incomplete block: next segment
      uint32_t isize;
      memcpy(&isize, raw.data() + pos + bsize - 4, 4);
      blocks.push_back({xend, bsize - (xend - pos) - 8, dst_base + add, isize});
      add += isize;
      pos += bsize;
    }
    if (blocks.empty() && eof) break;
    if (blocks.empty() && !eof) {
      // block larger than remaining buffer space: compact + refill
      if (pos == 0 && raw_len == raw.size()) {
        h->error = "BGZF block larger than segment";
        fclose(f);
        return h;
      }
      memmove(raw.data(), raw.data() + pos, raw_len - pos);
      raw_len -= pos;
      refill();
      continue;
    }
    data.resize(dst_base + add);
    std::atomic<bool> ok(true);
    parallel_chunks((int64_t)blocks.size(), n_threads,
                    [&](int64_t lo, int64_t hi) {
      for (int64_t b = lo; b < hi; ++b) {
        const Blk& bl = blocks[b];
        if (bl.dst_len == 0) continue;
        if (!inflate_block(raw.data() + bl.src_off, bl.src_len,
                           data.data() + bl.dst_off, bl.dst_len))
          ok = false;
      }
    });
    if (!ok) { h->error = "BGZF inflate failure"; fclose(f); return h; }
    // slide leftover raw bytes to the front, refill for next round
    memmove(raw.data(), raw.data() + pos, raw_len - pos);
    raw_len -= pos;
    refill();

    // --- header (first segment(s)) ---
    if (!header_done) {
      if (data.size() < expect_hdr) continue;
      if (memcmp(data.data(), "BAM\x01", 4) != 0) {
        h->error = "not a BAM stream";
        fclose(f);
        return h;
      }
      int32_t l_text;
      memcpy(&l_text, data.data() + 4, 4);
      size_t off = 8 + (size_t)l_text;
      if (data.size() < off + 4) { expect_hdr = off + 4; continue; }
      int32_t n_ref;
      memcpy(&n_ref, data.data() + off, 4);
      off += 4;
      bool complete = true;
      std::vector<RefInfo> refs;
      for (int32_t i = 0; i < n_ref; ++i) {
        if (data.size() < off + 4) { expect_hdr = off + 4; complete = false; break; }
        int32_t l_name;
        memcpy(&l_name, data.data() + off, 4);
        if (data.size() < off + 8 + (size_t)l_name) {
          expect_hdr = off + 8 + (size_t)l_name;
          complete = false;
          break;
        }
        std::string name((const char*)data.data() + off + 4, (size_t)l_name - 1);
        int32_t l_ref;
        memcpy(&l_ref, data.data() + off + 4 + l_name, 4);
        refs.push_back({name, l_ref});
        off += 8 + l_name;
      }
      if (!complete) continue;
      h->refs = std::move(refs);
      data_consumed = off;
      header_done = true;
    }

    // --- index complete records in [data_consumed, data.size()) ---
    std::vector<size_t> rec_off;
    {
      size_t p = data_consumed;
      while (p + 4 <= data.size()) {
        int32_t bs;
        memcpy(&bs, data.data() + p, 4);
        if (bs <= 0) { h->error = "corrupt record size"; fclose(f); return h; }
        if (p + 4 + (size_t)bs > data.size()) break;
        rec_off.push_back(p);
        p += 4 + (size_t)bs;
      }
      data_consumed = p;
    }
    int64_t base = h->n;
    int64_t n_new = (int64_t)rec_off.size();
    if (n_new) {
      // sizes pass for this batch
      seq_len.resize(n_new);
      itv_cnt.resize(n_new);
      cb_len.resize(n_new);
      ub_len.resize(n_new);
      parallel_chunks(n_new, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
          const uint8_t* r = data.data() + rec_off[i];
          int32_t bs;
          memcpy(&bs, r, 4);
          const uint8_t* body = r + 4;
          const uint8_t* bend = body + bs;
          int32_t l_seq;
          uint8_t l_read_name = body[8];
          uint16_t n_cigar;
          memcpy(&n_cigar, body + 12, 2);
          memcpy(&l_seq, body + 16, 4);
          seq_len[i] = l_seq;
          const uint8_t* cig = body + 32 + l_read_name;
          const uint8_t* aux = cig + 4 * n_cigar + (l_seq + 1) / 2 + l_seq;
          const uint8_t* ops;
          int32_t n_ops;
          effective_cigar(cig, n_cigar, l_seq, aux, bend, &ops, &n_ops);
          int cnt = 0;
          bool open = false;
          for (int32_t c = 0; c < n_ops; ++c) {
            uint32_t v;
            memcpy(&v, ops + 4 * c, 4);
            uint32_t op = v & 0xF;
            if (op == 0 || op == 7 || op == 8 || op == 2) {
              if (!open) { ++cnt; open = true; }
            } else if (op == 3) {
              open = false;
            }
          }
          itv_cnt[i] = cnt;
          const uint8_t *v1, *v2;
          int32_t l1, l2;
          scan_aux(aux, bend, cb_tag, "UB", &v1, &l1, &v2, &l2);
          cb_len[i] = l1;
          ub_len[i] = l2;
        }
      });
      h->n += n_new;
      h->tid.resize(h->n);
      h->pos.resize(h->n);
      h->ref_end.resize(h->n);
      h->mapq.resize(h->n);
      h->flag.resize(h->n);
      h->seq_off.resize(h->n + 1);
      h->itv_off.resize(h->n + 1);
      h->cb_off.resize(h->n + 1);
      h->ub_off.resize(h->n + 1);
      for (int64_t i = 0; i < n_new; ++i) {
        h->seq_off[base + i + 1] = h->seq_off[base + i] + seq_len[i];
        h->itv_off[base + i + 1] = h->itv_off[base + i] + itv_cnt[i];
        h->cb_off[base + i + 1] = h->cb_off[base + i] + cb_len[i];
        h->ub_off[base + i + 1] = h->ub_off[base + i] + ub_len[i];
      }
      h->seq_pool.resize((size_t)h->seq_off[h->n]);
      h->itv_pool.resize((size_t)h->itv_off[h->n] * 2);
      h->cb_pool.resize((size_t)h->cb_off[h->n]);
      h->ub_pool.resize((size_t)h->ub_off[h->n]);
      parallel_chunks(n_new, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
          const uint8_t* r = data.data() + rec_off[i];
          int64_t gi = base + i;
          int32_t bs;
          memcpy(&bs, r, 4);
          const uint8_t* body = r + 4;
          const uint8_t* bend = body + bs;
          int32_t refid, p0, l_seq;
          memcpy(&refid, body, 4);
          memcpy(&p0, body + 4, 4);
          uint8_t l_read_name = body[8];
          h->mapq[gi] = body[9];
          uint16_t n_cigar, flg;
          memcpy(&n_cigar, body + 12, 2);
          memcpy(&flg, body + 14, 2);
          memcpy(&l_seq, body + 16, 4);
          h->tid[gi] = refid;
          h->pos[gi] = p0;
          h->flag[gi] = flg;
          const uint8_t* cig = body + 32 + l_read_name;
          const uint8_t* aux0 = cig + 4 * n_cigar + (l_seq + 1) / 2 + l_seq;
          const uint8_t* ops;
          int32_t n_ops;
          effective_cigar(cig, n_cigar, l_seq, aux0, bend, &ops, &n_ops);
          int32_t rp = p0;
          int64_t iv = h->itv_off[gi] * 2;
          bool open = false;
          int32_t ref_len = 0;
          for (int32_t c = 0; c < n_ops; ++c) {
            uint32_t v;
            memcpy(&v, ops + 4 * c, 4);
            uint32_t op = v & 0xF;
            int32_t l = (int32_t)(v >> 4);
            bool consumes_ref = (op == 0 || op == 2 || op == 3 || op == 7 || op == 8);
            bool aligned = (op == 0 || op == 2 || op == 7 || op == 8);
            if (aligned) {
              if (!open) {
                h->itv_pool[iv] = rp;
                h->itv_pool[iv + 1] = rp + l;
                open = true;
              } else {
                h->itv_pool[iv + 1] = rp + l;
              }
            } else if (op == 3 && open) {
              iv += 2;
              open = false;
            }
            if (consumes_ref) {
              rp += l;
              ref_len += l;
            }
          }
          h->ref_end[gi] = ref_len > 0 ? p0 + ref_len : p0 + 1;
          const uint8_t* sq = cig + 4 * n_cigar;
          uint8_t* out = h->seq_pool.data() + h->seq_off[gi];
          for (int32_t s = 0; s < l_seq; ++s) {
            uint8_t b = sq[s >> 1];
            out[s] = (uint8_t)SEQ_NT16[(s & 1) ? (b & 0xF) : (b >> 4)];
          }
          const uint8_t* aux = sq + (l_seq + 1) / 2 + l_seq;
          const uint8_t *v1, *v2;
          int32_t l1, l2;
          scan_aux(aux, bend, cb_tag, "UB", &v1, &l1, &v2, &l2);
          if (l1) memcpy(h->cb_pool.data() + h->cb_off[gi], v1, (size_t)l1);
          if (l2) memcpy(h->ub_pool.data() + h->ub_off[gi], v2, (size_t)l2);
        }
      });
    }
    // drop decoded bytes; carry the partial tail into the next round
    if (data_consumed) {
      data.erase(data.begin(), data.begin() + (ptrdiff_t)data_consumed);
      data_consumed = 0;
    }
    if (eof && raw_len < 28) break;
  }
  fclose(f);
  if (!header_done) {
    if (h->error.empty()) h->error = "truncated header";
    return h;
  }
  // seq_off was seeded with a single 0 before n was known; the resizes
  // above maintain the invariant len == n + 1
  h->seq_pool.shrink_to_fit();
  return h;
}

// Region loader: decode ONLY the BGZF blocks the given index chunks touch
// (the htslib fetch model the reference uses per variant,
// /root/reference/src/main.rs:822-826, lifted to a batched plan). chunks =
// n_chunks (vbeg, vend) virtual-offset pairs, sorted and non-overlapping
// (the Python side merges them from BAI/CSI region queries). Peak memory
// is the inflated chunk data + decoded columns — independent of file size.
GioBam* gio_bam_load_regions(const char* path, const char* cb_tag,
                             int n_threads, const int64_t* chunks,
                             int64_t n_chunks) {
  auto* h = new GioBam();
  FILE* f = fopen(path, "rb");
  if (!f) { h->error = "cannot open file"; return h; }
  int fd = fileno(f);

  // one BGZF block at file offset `off` -> append payload to out;
  // returns compressed size (0 on EOF/corrupt)
  auto inflate_at = [&](int64_t off, std::vector<uint8_t>& out) -> int64_t {
    uint8_t head[18];
    if (pread(fd, head, 18, off) != 18) return 0;
    if (!(head[0] == 0x1f && head[1] == 0x8b && head[2] == 8 && (head[3] & 4)))
      return 0;
    uint16_t xlen;
    memcpy(&xlen, head + 10, 2);
    std::vector<uint8_t> extra(xlen);
    if (xlen <= 6) {
      memcpy(extra.data(), head + 12, xlen);
    } else {
      memcpy(extra.data(), head + 12, 6);
      if (pread(fd, extra.data() + 6, xlen - 6, off + 18) != xlen - 6) return 0;
    }
    uint32_t bsize = 0;
    size_t xo = 0;
    while (xo + 4 <= extra.size()) {
      uint16_t slen;
      memcpy(&slen, extra.data() + xo + 2, 2);
      if (extra[xo] == 'B' && extra[xo + 1] == 'C' && slen == 2) {
        uint16_t bs16;
        memcpy(&bs16, extra.data() + xo + 4, 2);
        bsize = (uint32_t)bs16 + 1;
      }
      xo += 4 + slen;
    }
    if (!bsize) return 0;
    size_t clen = bsize - 12 - xlen - 8;
    std::vector<uint8_t> cdata(clen + 8);
    if (pread(fd, cdata.data(), clen + 8, off + 12 + xlen) != (ssize_t)(clen + 8))
      return 0;
    uint32_t isize;
    memcpy(&isize, cdata.data() + clen + 4, 4);
    size_t base = out.size();
    out.resize(base + isize);
    if (isize && !inflate_block(cdata.data(), clen, out.data() + base, isize))
      return 0;
    return (int64_t)bsize;
  };

  // --- header: inflate leading blocks until the header region parses ---
  {
    std::vector<uint8_t> hdr;
    int64_t off = 0;
    auto need = [&](size_t want) -> bool {
      while (hdr.size() < want) {
        int64_t bs = inflate_at(off, hdr);
        if (bs <= 0) return false;
        off += bs;
      }
      return true;
    };
    if (!need(12) || memcmp(hdr.data(), "BAM\x01", 4) != 0) {
      fclose(f);
      h->error = "not a BAM stream";
      return h;
    }
    int32_t l_text;
    memcpy(&l_text, hdr.data() + 4, 4);
    if (!need(8 + (size_t)l_text + 4)) { fclose(f); h->error = "truncated header"; return h; }
    size_t o = 8 + (size_t)l_text;
    int32_t n_ref;
    memcpy(&n_ref, hdr.data() + o, 4);
    o += 4;
    for (int32_t i = 0; i < n_ref; ++i) {
      if (!need(o + 4)) { fclose(f); h->error = "truncated header"; return h; }
      int32_t l_name;
      memcpy(&l_name, hdr.data() + o, 4);
      if (!need(o + 8 + (size_t)l_name)) { fclose(f); h->error = "truncated header"; return h; }
      std::string name((const char*)hdr.data() + o + 4, (size_t)l_name - 1);
      int32_t l_ref;
      memcpy(&l_ref, hdr.data() + o + 4 + l_name, 4);
      h->refs.push_back({name, l_ref});
      o += 8 + l_name;
    }
  }

  // --- per chunk (parallel): inflate its blocks, index its records ---
  struct ChunkBuf {
    std::vector<uint8_t> data;
    std::vector<size_t> rec_off;
  };
  std::vector<ChunkBuf> bufs(n_chunks);
  std::atomic<bool> ok(true);
  parallel_chunks(n_chunks, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t ci = lo; ci < hi && ok; ++ci) {
      int64_t vbeg = chunks[2 * ci], vend = chunks[2 * ci + 1];
      int64_t coff = vbeg >> 16, cend = vend >> 16;
      ChunkBuf& cb = bufs[ci];
      size_t end_local = SIZE_MAX;  // local offset corresponding to vend
      int64_t cur = coff;
      while (cur < cend || (cur == cend && (vend & 0xFFFF) != 0)) {
        if (cur == cend) end_local = cb.data.size() + (size_t)(vend & 0xFFFF);
        int64_t bs = inflate_at(cur, cb.data);
        if (bs <= 0) { ok = false; return; }
        cur += bs;
      }
      if (end_local == SIZE_MAX) end_local = cb.data.size();
      // index records [vbeg&0xFFFF, end_local); extend with more blocks if
      // a record spans past the chunk end (defensive: BAI chunk ends are
      // record boundaries, but merged/foreign indexes may be sloppier)
      size_t u = (size_t)(vbeg & 0xFFFF);
      while (u < end_local) {
        while (u + 4 > cb.data.size()) {
          int64_t bs = inflate_at(cur, cb.data);
          if (bs <= 0) { ok = false; return; }
          cur += bs;
        }
        int32_t bs32;
        memcpy(&bs32, cb.data.data() + u, 4);
        if (bs32 <= 0) { ok = false; return; }
        while (u + 4 + (size_t)bs32 > cb.data.size()) {
          int64_t bs = inflate_at(cur, cb.data);
          if (bs <= 0) { ok = false; return; }
          cur += bs;
        }
        cb.rec_off.push_back(u);
        u += 4 + (size_t)bs32;
      }
    }
  });
  fclose(f);
  if (!ok) { h->error = "BGZF chunk decode failure"; return h; }

  int64_t n = 0;
  for (auto& cb : bufs) n += (int64_t)cb.rec_off.size();
  std::vector<const uint8_t*> rec_ptr;
  rec_ptr.reserve((size_t)n);
  for (auto& cb : bufs)
    for (size_t off : cb.rec_off) rec_ptr.push_back(cb.data.data() + off);
  decode_records(h, rec_ptr.data(), n, cb_tag, n_threads);
  return h;
}

void gio_bam_free(GioBam* h) { delete h; }

// Padded read gather: out[i] = pool[seq_off[r]:seq_off[r+1]] (r =
// read_ids[i]) truncated/zero-padded to lx bytes. This is the device-batch
// packing step (kernel read pad byte is 0); it replaces a numpy
// fancy-index gather whose [n, lx] int64 index matrix dominated host time.
void gio_gather_padded(const uint8_t* pool, const int64_t* seq_off,
                       const int64_t* read_ids, int64_t n, int32_t lx,
                       uint8_t* out, int n_threads) {
  parallel_chunks(n, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t r = read_ids[i];
      int64_t s = seq_off[r];
      int64_t len = seq_off[r + 1] - s;
      if (len > lx) len = lx;
      uint8_t* dst = out + i * (int64_t)lx;
      if (len > 0) memcpy(dst, pool + s, (size_t)len);
      if (len < lx) memset(dst + len, 0, (size_t)(lx - len));
    }
  });
}

// Packed padded gather: like gio_gather_padded but emits 4-bit codes
// (two bases per byte, high nibble first — the BAM SEQ layout) plus the
// per-row byte length. Read sequences come from BAM's 16-symbol nibble
// alphabet, so the pack is lossless; the device unpacks via a 16-entry
// table before the SW kernel. Halves the host->device read transfer,
// which dominates the score phase through the TPU relay.
// Returns 0 on success, -1 if any pool byte is outside the SEQ_NT16
// alphabet (caller falls back to the unpacked path).
int32_t gio_gather_padded_packed(const uint8_t* pool, const int64_t* seq_off,
                                 const int64_t* read_ids, int64_t n,
                                 int32_t lx, uint8_t* out, int32_t* lens,
                                 int n_threads) {
  if (lx % 2) return -1;  // rows are lx/2 bytes; odd lx would overflow
  // thread-safe one-time init (C++11 static local initialization)
  static const auto lut = [] {
    std::array<uint8_t, 256> t;
    t.fill(0xFF);
    for (int i = 0; i < 16; ++i) t[(uint8_t)SEQ_NT16[i]] = (uint8_t)i;
    return t;
  }();
  int32_t half = lx / 2;
  std::atomic<int32_t> bad{0};
  parallel_chunks(n, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t r = read_ids[i];
      int64_t s = seq_off[r];
      int64_t len = seq_off[r + 1] - s;
      if (len > lx) len = lx;
      lens[i] = (int32_t)len;
      uint8_t* dst = out + i * (int64_t)half;
      int64_t k = 0;
      for (; k + 1 < len; k += 2) {
        uint8_t a = lut[pool[s + k]], b = lut[pool[s + k + 1]];
        if ((a | b) & 0xF0) { bad.store(1); return; }
        dst[k >> 1] = (uint8_t)((a << 4) | b);
      }
      if (k < len) {
        uint8_t a = lut[pool[s + k]];
        if (a & 0xF0) { bad.store(1); return; }
        dst[k >> 1] = (uint8_t)(a << 4);
        ++k;
      }
      if ((k >> 1) < half)
        memset(dst + (k >> 1) + ((k & 1) ? 1 : 0), 0,
               (size_t)(half - (k >> 1) - ((k & 1) ? 1 : 0)));
    }
  });
  return bad.load() ? -1 : 0;
}

// 2-bit packed padded gather: A/C/G/T only (four bases per byte, low
// bits first) — the dominant short-read case, quartering the read
// transfer. Any other byte (N, '=', lowercase, IUPAC) declines with -1
// and the caller falls back to the 4-bit protocol for that chunk, so
// exactness never depends on the alphabet assumption.
int32_t gio_gather_padded_packed2(const uint8_t* pool,
                                  const int64_t* seq_off,
                                  const int64_t* read_ids, int64_t n,
                                  int32_t lx, uint8_t* out, int32_t* lens,
                                  int n_threads) {
  if (lx % 4) return -1;  // rows are lx/4 bytes
  static const auto lut2 = [] {
    std::array<uint8_t, 256> t;
    t.fill(0xFF);
    t[(uint8_t)'A'] = 0;
    t[(uint8_t)'C'] = 1;
    t[(uint8_t)'G'] = 2;
    t[(uint8_t)'T'] = 3;
    return t;
  }();
  int32_t q = lx / 4;
  std::atomic<int32_t> bad{0};
  parallel_chunks(n, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      if (bad.load(std::memory_order_relaxed)) return;
      int64_t r = read_ids[i];
      int64_t s = seq_off[r];
      int64_t len = seq_off[r + 1] - s;
      if (len > lx) len = lx;
      lens[i] = (int32_t)len;
      uint8_t* dst = out + i * (int64_t)q;
      memset(dst, 0, (size_t)q);
      for (int64_t k = 0; k < len; ++k) {
        uint8_t c = lut2[pool[s + k]];
        if (c & 0xFC) {
          bad.store(1);
          return;
        }
        dst[k >> 2] |= (uint8_t)(c << ((k & 3) * 2));
      }
    }
  });
  return bad.load() ? -1 : 0;
}

// ---- Aux-tag value mapping ----------------------------------------------
//
// The collect phase maps every record's CB tag to a barcode-list index
// and every UB tag to an equality-preserving dense id (the semantics of
// src/main.rs:737-757 vectorized over the whole file). The Python
// fallback does this with per-length gathers + a vectorized hash; these
// native versions replace ~0.3s of NumPy work (and its ~150MB of
// temporary index matrices) per 500k reads with one hash-table pass.

// out[i] = kvals[j] where keys[j] byte-equals record i's tag; -1 when
// the tag is absent (zero-length), `miss` when present but not listed.
void gio_tag_lookup(const uint8_t* pool, const int64_t* off, int64_t n,
                    const uint8_t* keys, const int64_t* koff, int64_t K,
                    const int32_t* kvals, int32_t miss, int32_t* out,
                    int n_threads) {
  std::unordered_map<std::string_view, int32_t> table;
  table.reserve((size_t)K * 2);
  for (int64_t j = 0; j < K; ++j) {
    std::string_view k((const char*)keys + koff[j],
                       (size_t)(koff[j + 1] - koff[j]));
    table.emplace(k, kvals[j]);  // first-seen wins, like dict semantics
  }
  parallel_chunks(n, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      int64_t len = off[i + 1] - off[i];
      if (len == 0) { out[i] = -1; continue; }
      auto it = table.find(
          std::string_view((const char*)pool + off[i], (size_t)len));
      out[i] = (it == table.end()) ? miss : it->second;
    }
  });
}

// out[i] = dense first-seen id of record i's tag bytes (-1 = absent).
// Open-addressing table over (hash, first-record-index) slots — UMI
// cardinality approaches the record count, so std::unordered_map's
// per-node allocations dominate; a flat table with precomputed hashes
// (hashed in parallel) makes the serial insert pass ~memcmp-bound.
// Single-threaded insertion keeps ids deterministic in record order;
// only equality is meaningful downstream (UMI grouping).
void gio_tag_ids(const uint8_t* pool, const int64_t* off, int64_t n,
                 int64_t* out, int n_threads) {
  if (n <= 0) return;
  std::vector<uint64_t> h((size_t)n);
  parallel_chunks(n, n_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint64_t v = 1469598103934665603ull;  // FNV-1a 64
      for (int64_t p = off[i]; p < off[i + 1]; ++p)
        v = (v ^ pool[p]) * 1099511628211ull;
      h[(size_t)i] = v;
    }
  });
  size_t cap = 16;
  while (cap < (size_t)n * 2) cap <<= 1;
  std::vector<int64_t> slot(cap, -1);  // record index of the slot owner
  size_t mask = cap - 1;
  int64_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t len = off[i + 1] - off[i];
    if (len == 0) { out[i] = -1; continue; }
    size_t s = (size_t)h[(size_t)i] & mask;
    for (;;) {
      int64_t owner = slot[s];
      if (owner < 0) {
        slot[s] = i;
        out[i] = next++;
        break;
      }
      if (h[(size_t)owner] == h[(size_t)i] &&
          off[owner + 1] - off[owner] == len &&
          memcmp(pool + off[owner], pool + off[i], (size_t)len) == 0) {
        out[i] = out[owner];
        break;
      }
      s = (s + 1) & mask;
    }
  }
}

// ---- Matrix Market body formatting / parsing ----------------------------
//
// The reference writes matrices through sprs' write_matrix_market
// (/root/reference/src/main.rs:381-389): one "row col value" line per
// triplet, f64 values in Rust `Display` semantics (shortest round-trip,
// positional notation, integral values bare, NaN as "NaN").
// std::to_chars with chars_format::fixed produces exactly that shortest
// positional form; integral values take the integer fast path. Lines are
// formatted/parsed in parallel chunks — this is the scalability story for
// cohort-scale (100M-nnz) matrices that a Python formatter can't provide.

struct GioBuf {
  std::vector<char> data;
};

namespace {

// Rust f64 `Display`: shortest round-trip digits, always positional.
// std::to_chars (general) yields the shortest digits but may pick
// scientific notation; expand the exponent positionally when it does —
// NOT chars_format::fixed, which prints the value's exact expansion
// (all 309 digits of f64::MAX) instead of shortest-digits-plus-zeros.
inline char* format_value(double v, char* p) {
  if (std::isnan(v)) { memcpy(p, "NaN", 3); return p + 3; }
  if (std::isinf(v)) {
    if (v < 0) { memcpy(p, "-inf", 4); return p + 4; }
    memcpy(p, "inf", 3); return p + 3;
  }
  if (v == (double)(int64_t)v && std::fabs(v) < 1e16) {
    int64_t iv = (int64_t)v;
    if (iv == 0 && std::signbit(v)) { memcpy(p, "-0", 2); return p + 2; }
    return std::to_chars(p, p + 24, iv).ptr;
  }
  // scientific-shortest gives minimal round-trip significand digits;
  // placement is re-derived positionally. libstdc++'s Ryu can emit one
  // conservative extra digit at round-half-even tie boundaries where
  // Python repr / Rust Display emit the shorter correctly-rounded string,
  // so trim while a shorter %.*e string still parses back bit-exactly.
  char tmp[48];
  char* tend = std::to_chars(tmp, tmp + 48, v,
                             std::chars_format::scientific).ptr;
  if (*tmp == '-') *p++ = '-';
  char digits[40];
  int nd = 0, exp10 = 0;
  auto extract = [&](const char* s, const char* send) {
    if (*s == '-') ++s;
    nd = 0;
    for (; s < send && *s != 'e'; ++s) {
      if (*s != '.') digits[nd++] = *s;
    }
    exp10 = 0;
    bool eneg = false;
    ++s;  // 'e'
    if (s < send && (*s == '+' || *s == '-')) eneg = (*s++ == '-');
    for (; s < send; ++s) exp10 = exp10 * 10 + (*s - '0');
    if (eneg) exp10 = -exp10;
  };
  extract(tmp, tend);
  while (nd > 1) {
    char sbuf[48];
    int sn = snprintf(sbuf, sizeof sbuf, "%.*e", nd - 2, v);
    double back;
    auto fr = std::from_chars((const char*)sbuf, sbuf + sn, back);
    if (fr.ec != std::errc() || memcmp(&back, &v, 8) != 0) break;
    extract(sbuf, sbuf + sn);
  }
  int pos = 1 + exp10;  // scientific: one digit before the point
  if (pos <= 0) {
    *p++ = '0'; *p++ = '.';
    for (int z = 0; z < -pos; ++z) *p++ = '0';
    memcpy(p, digits, (size_t)nd);
    return p + nd;
  }
  if (pos >= nd) {
    memcpy(p, digits, (size_t)nd);
    p += nd;
    for (int z = 0; z < pos - nd; ++z) *p++ = '0';
    return p;
  }
  memcpy(p, digits, (size_t)pos);
  p += pos;
  *p++ = '.';
  memcpy(p, digits + pos, (size_t)(nd - pos));
  return p + (nd - pos);
}

}  // namespace

// (already inside the file's extern "C" block)
// Format n "row col value\n" lines (indices passed already 1-based).
GioBuf* gio_mtx_format(const int64_t* rows, const int64_t* cols,
                       const double* vals, int64_t n, int n_threads) {
  auto* out = new GioBuf();
  if (n == 0) return out;
  int nchunks = std::max(1, std::min<int>(n_threads * 4, (int)std::min<int64_t>(n, 256)));
  int64_t per = (n + nchunks - 1) / nchunks;
  std::vector<std::string> parts(nchunks);
  parallel_chunks(nchunks, n_threads, [&](int64_t clo, int64_t chi) {
    // worst-case line: 20 + 1 + 20 + 1 + 1078 + 1 bytes; reserve amortized
    char line[1152];
    for (int64_t ci = clo; ci < chi; ++ci) {
      int64_t lo = ci * per, hi = std::min(n, lo + per);
      if (lo >= hi) continue;
      std::string& s = parts[ci];
      s.reserve((size_t)(hi - lo) * 16);
      for (int64_t i = lo; i < hi; ++i) {
        char* p = std::to_chars(line, line + 24, rows[i]).ptr;
        *p++ = ' ';
        p = std::to_chars(p, p + 24, cols[i]).ptr;
        *p++ = ' ';
        p = format_value(vals[i], p);
        *p++ = '\n';
        s.append(line, (size_t)(p - line));
      }
    }
  });
  size_t total = 0;
  for (auto& s : parts) total += s.size();
  out->data.resize(total);
  size_t off = 0;
  for (auto& s : parts) {
    memcpy(out->data.data() + off, s.data(), s.size());
    off += s.size();
  }
  return out;
}

const char* gio_buf_data(GioBuf* b) { return b->data.data(); }
int64_t gio_buf_len(GioBuf* b) { return (int64_t)b->data.size(); }
void gio_buf_free(GioBuf* b) { delete b; }

// Parse up to n "row col value" lines from buf (indices emitted 1-based,
// exactly as stored). Returns the number of lines parsed, or
// -1 = malformed number, -2 = non-integer row/col index.
int64_t gio_mtx_parse(const char* buf, int64_t len, int64_t n,
                      int64_t* rows, int64_t* cols, double* vals,
                      int n_threads) {
  if (n == 0) return 0;
  // pass 1: chunk the buffer at line boundaries, count lines per chunk
  int nchunks = std::max(1, std::min<int>(n_threads * 4, 256));
  std::vector<int64_t> c_beg(nchunks + 1, len);
  c_beg[0] = 0;
  for (int c = 1; c < nchunks; ++c) {
    int64_t p = len * c / nchunks;
    if (p < c_beg[c - 1]) p = c_beg[c - 1];
    while (p < len && buf[p] != '\n') ++p;
    c_beg[c] = p < len ? p + 1 : len;
  }
  std::vector<int64_t> c_lines(nchunks, 0);
  parallel_chunks(nchunks, n_threads, [&](int64_t clo, int64_t chi) {
    for (int64_t c = clo; c < chi; ++c) {
      int64_t cnt = 0;
      const char* p = buf + c_beg[c];
      const char* end = buf + c_beg[c + 1];
      bool in_line = false;
      while (p < end) {
        if (*p == '\n') { in_line = false; }
        else if (!in_line && *p != '\r') { in_line = true; ++cnt; }
        ++p;
      }
      c_lines[c] = cnt;
    }
  });
  std::vector<int64_t> c_first(nchunks + 1, 0);
  for (int c = 0; c < nchunks; ++c) c_first[c + 1] = c_first[c] + c_lines[c];
  std::atomic<int64_t> err(0);
  parallel_chunks(nchunks, n_threads, [&](int64_t clo, int64_t chi) {
    for (int64_t c = clo; c < chi; ++c) {
      int64_t li = c_first[c];
      const char* p = buf + c_beg[c];
      const char* end = buf + c_beg[c + 1];
      while (p < end && li < n) {
        while (p < end && (*p == '\n' || *p == '\r')) ++p;
        if (p >= end) break;
        const char* eol = (const char*)memchr(p, '\n', (size_t)(end - p));
        if (!eol) eol = end;
        auto skip_ws = [&] { while (p < eol && (*p == ' ' || *p == '\t' || *p == '\r')) ++p; };
        int64_t iv[2];
        bool bad = false;
        for (int t = 0; t < 2 && !bad; ++t) {
          skip_ws();
          auto r = std::from_chars(p, eol, iv[t]);
          if (r.ec != std::errc()) { err = -1; bad = true; break; }
          if (r.ptr < eol && *r.ptr != ' ' && *r.ptr != '\t' && *r.ptr != '\r') {
            err = -2;  // "1.5" / "1e3": index token isn't a bare integer
            bad = true;
            break;
          }
          p = r.ptr;
        }
        if (bad) return;
        skip_ws();
        double dv;
        auto r = std::from_chars(p, eol, dv);
        if (r.ec != std::errc()) { err = -1; return; }
        rows[li] = iv[0];
        cols[li] = iv[1];
        vals[li] = dv;
        ++li;
        p = eol;
      }
    }
  });
  if (err != 0) return err;
  int64_t total = std::min<int64_t>(n, c_first[nchunks]);
  return total;
}

const char* gio_bam_error(GioBam* h) {
  return h->error.empty() ? nullptr : h->error.c_str();
}

int64_t gio_bam_n_records(GioBam* h) { return h->n; }
int32_t gio_bam_n_refs(GioBam* h) { return (int32_t)h->refs.size(); }
const char* gio_bam_ref_name(GioBam* h, int32_t i) { return h->refs[i].name.c_str(); }
int32_t gio_bam_ref_len(GioBam* h, int32_t i) { return h->refs[i].len; }

const int32_t* gio_bam_tid(GioBam* h) { return h->tid.data(); }
const int32_t* gio_bam_pos(GioBam* h) { return h->pos.data(); }
const int32_t* gio_bam_ref_end(GioBam* h) { return h->ref_end.data(); }
const uint8_t* gio_bam_mapq(GioBam* h) { return h->mapq.data(); }
const uint16_t* gio_bam_flag(GioBam* h) { return h->flag.data(); }
const int64_t* gio_bam_seq_off(GioBam* h) { return h->seq_off.data(); }
const uint8_t* gio_bam_seq_pool(GioBam* h) { return h->seq_pool.data(); }
const int64_t* gio_bam_itv_off(GioBam* h) { return h->itv_off.data(); }
const int32_t* gio_bam_itv_pool(GioBam* h) { return h->itv_pool.data(); }
const int64_t* gio_bam_cb_off(GioBam* h) { return h->cb_off.data(); }
const uint8_t* gio_bam_cb_pool(GioBam* h) { return h->cb_pool.data(); }
const int64_t* gio_bam_ub_off(GioBam* h) { return h->ub_off.data(); }
const uint8_t* gio_bam_ub_pool(GioBam* h) { return h->ub_pool.data(); }

}  // extern "C"
