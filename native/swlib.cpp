// CPU Smith-Waterman library: the host-side native baseline + oracle.
//
// Provides, behind a C ABI for ctypes:
//   * banded_sw_batch — k-mer-seeded banded affine local SW with the
//     reference tool's parameters (match=1, mismatch=-5, gap_open=-5,
//     gap_extend=-1, k=6, w=20; see /root/reference/src/main.rs:30-38,
//     898-901). This reproduces the COST profile and scoring convention of
//     the reference's per-read aligner and serves as the multi-threaded
//     CPU baseline that bench.py measures TPU speedups against.
//   * full_sw_batch — exact unbanded SW, used to cross-validate the
//     Pallas/XLA kernels and to quantify banded-vs-full divergence at
//     scale.
//
// Gap convention (rust-bio): a gap of length L costs gap_open + L*gap_extend.
//
// Build: native/build.sh -> vartrix_tpu/_native/libvartrixsw.so

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int32_t MATCH = 1;
constexpr int32_t MISMATCH = -5;
constexpr int32_t GAP_OPEN = -5;
constexpr int32_t GAP_EXTEND = -1;
constexpr int32_t NEG = INT32_MIN / 4;

inline int32_t score(uint8_t a, uint8_t b) { return a == b ? MATCH : MISMATCH; }

// Full affine local SW, row-major with rolling arrays. Exact.
int32_t full_sw(const uint8_t* x, int32_t lx, const uint8_t* y, int32_t ly) {
  if (lx == 0 || ly == 0) return 0;
  std::vector<int32_t> H(ly + 1, 0), E(ly + 1, NEG);
  int32_t best = 0;
  for (int32_t i = 1; i <= lx; ++i) {
    int32_t diag = H[0];  // H[i-1][0] == 0
    int32_t f = NEG;      // F[i][j] column gap, tracked along the row? no:
    // F depends on previous ROW: need per-column F array.
    // Use a static thread_local to avoid realloc per pair.
    (void)f;
    static thread_local std::vector<int32_t> F;
    if (i == 1) { F.assign(ly + 1, NEG); }
    int32_t h_prev = 0;  // H[i][j-1]
    int32_t e_row = NEG; // E[i][j] row gap (consuming y)
    for (int32_t j = 1; j <= ly; ++j) {
      e_row = std::max(h_prev + GAP_OPEN + GAP_EXTEND, e_row + GAP_EXTEND);
      F[j] = std::max(H[j] + GAP_OPEN + GAP_EXTEND, F[j] + GAP_EXTEND);
      int32_t h = std::max({0, diag + score(x[i - 1], y[j - 1]), e_row, F[j]});
      diag = H[j];
      H[j] = h;
      h_prev = h;
      best = std::max(best, h);
    }
    H[0] = 0;
  }
  return best;
}

// Banded SW in the style of rust-bio pairwise::banded: hash the k-mers of
// y, scan x's k-mers, and widen every match cell into a (2w+k)-square band;
// the DP visits only banded cells (per-row interval union approximation).
int32_t banded_sw(const uint8_t* x, int32_t lx, const uint8_t* y, int32_t ly,
                  int k, int w) {
  if (lx < k || ly < k) return full_sw(x, lx, y, ly);
  // 2-bit-packable? sequences may contain N etc. — hash raw bytes.
  // Open-addressed hash of y k-mers -> first position list (chained).
  const int32_t ny = ly - k + 1;
  static thread_local std::vector<uint64_t> keys;
  static thread_local std::vector<int32_t> head, nxt;
  int cap = 1;
  while (cap < ny * 2) cap <<= 1;
  keys.assign(cap, ~0ull);
  head.assign(cap, -1);
  nxt.assign(ny, -1);
  auto hash_kmer = [&](const uint8_t* p) {
    uint64_t h = 1469598103934665603ull;
    for (int t = 0; t < k; ++t) { h ^= p[t]; h *= 1099511628211ull; }
    return h;
  };
  for (int32_t j = 0; j < ny; ++j) {
    uint64_t h = hash_kmer(y + j);
    uint32_t slot = (uint32_t)h & (cap - 1);
    while (keys[slot] != ~0ull && keys[slot] != h) slot = (slot + 1) & (cap - 1);
    keys[slot] = h;
    nxt[j] = head[slot];
    head[slot] = j;
  }
  // per-row band interval [jlo, jhi)
  static thread_local std::vector<int32_t> jlo, jhi;
  jlo.assign(lx, INT32_MAX);
  jhi.assign(lx, INT32_MIN);
  bool seeded = false;
  for (int32_t i = 0; i + k <= lx; ++i) {
    uint64_t h = hash_kmer(x + i);
    uint32_t slot = (uint32_t)h & (cap - 1);
    while (keys[slot] != ~0ull) {
      if (keys[slot] == h) {
        for (int32_t j = head[slot]; j != -1; j = nxt[j]) {
          if (memcmp(x + i, y + j, k) != 0) continue;
          seeded = true;
          int32_t i0 = std::max(0, i - w), i1 = std::min(lx, i + k + w);
          int32_t j0 = std::max(0, j - w), j1 = std::min(ly, j + k + w);
          for (int32_t r = i0; r < i1; ++r) {
            jlo[r] = std::min(jlo[r], j0);
            jhi[r] = std::max(jhi[r], j1);
          }
        }
        break;
      }
      slot = (slot + 1) & (cap - 1);
    }
  }
  if (!seeded) return 0;
  // DP restricted to per-row intervals
  static thread_local std::vector<int32_t> H, E, F;
  H.assign(ly + 1, 0);
  E.assign(ly + 1, NEG);
  F.assign(ly + 1, NEG);
  static thread_local std::vector<int32_t> Hd;
  Hd.assign(ly + 1, 0);  // previous row H
  int32_t best = 0;
  int32_t prev_lo = 0, prev_hi = 0;
  for (int32_t i = 1; i <= lx; ++i) {
    int32_t lo = jlo[i - 1], hi = jhi[i - 1];
    if (lo >= hi) { prev_lo = 0; prev_hi = 0; continue; }
    std::swap(H, Hd);
    // clear cells outside previous row's band in Hd/E/F as needed
    for (int32_t j = lo; j <= hi; ++j) {
      if (j < prev_lo || j > prev_hi) { Hd[j] = 0; F[j] = NEG; }
    }
    if (lo > 0 && (lo - 1 < prev_lo || lo - 1 > prev_hi)) Hd[lo - 1] = 0;
    int32_t h_prev = 0, e_row = NEG;
    for (int32_t j = lo + 1; j <= hi; ++j) {
      e_row = std::max(h_prev + GAP_OPEN + GAP_EXTEND, e_row + GAP_EXTEND);
      F[j] = std::max(Hd[j] + GAP_OPEN + GAP_EXTEND, F[j] + GAP_EXTEND);
      int32_t h = std::max({0, Hd[j - 1] + score(x[i - 1], y[j - 1]), e_row, F[j]});
      H[j] = h;
      h_prev = h;
      best = std::max(best, h);
    }
    prev_lo = lo + 1;
    prev_hi = hi;
  }
  return best;
}

// Banded SW with rust-bio pairwise::banded's band-construction SHAPE:
// k-mer matches between x and y are CHAINED with a sparse DP (kmer score
// minus gap penalties between consecutive chain anchors, the sdpkpp
// approach), the best chain's anchors get a diagonal band of half-width w,
// consecutive anchors are connected by boxes, and the band is extended
// from the first/last anchor toward the corners (local alignments may
// start/end off-chain). The DP then runs over the per-row column interval
// this construction induces (a monotone chain keeps it an interval).
// Cells outside the band read H=0 (equivalent to starting a new local
// alignment at the band edge), so banded_score <= full_score always.
// Build the chained band's per-row intervals into jlo/jhi (size lx).
// Returns 0 = no k-mer seeds (empty band, score 0), 1 = banded,
// 2 = sequences shorter than k (caller should use full SW).
int build_chained_band(const uint8_t* x, int32_t lx, const uint8_t* y,
                       int32_t ly, int k, int w, std::vector<int32_t>& jlo,
                       std::vector<int32_t>& jhi) {
  if (lx < k || ly < k) return 2;
  // hash y k-mers
  const int32_t ny = ly - k + 1;
  static thread_local std::vector<uint64_t> keys;
  static thread_local std::vector<int32_t> head, nxt;
  int cap = 1;
  while (cap < ny * 2) cap <<= 1;
  keys.assign(cap, ~0ull);
  head.assign(cap, -1);
  nxt.assign(ny, -1);
  auto hash_kmer = [&](const uint8_t* p) {
    uint64_t h = 1469598103934665603ull;
    for (int t = 0; t < k; ++t) { h ^= p[t]; h *= 1099511628211ull; }
    return h;
  };
  for (int32_t j = 0; j < ny; ++j) {
    uint64_t h = hash_kmer(y + j);
    uint32_t slot = (uint32_t)h & (cap - 1);
    while (keys[slot] != ~0ull && keys[slot] != h) slot = (slot + 1) & (cap - 1);
    keys[slot] = h;
    nxt[j] = head[slot];
    head[slot] = j;
  }
  // collect matches (i, j), ordered by (i, j)
  static thread_local std::vector<std::pair<int32_t, int32_t>> matches;
  matches.clear();
  for (int32_t i = 0; i + k <= lx; ++i) {
    uint64_t h = hash_kmer(x + i);
    uint32_t slot = (uint32_t)h & (cap - 1);
    while (keys[slot] != ~0ull) {
      if (keys[slot] == h) {
        for (int32_t j = head[slot]; j != -1; j = nxt[j]) {
          if (memcmp(x + i, y + j, k) == 0) matches.emplace_back(i, j);
        }
        break;
      }
      slot = (slot + 1) & (cap - 1);
    }
  }
  if (matches.empty()) return 0;
  std::sort(matches.begin(), matches.end());
  // (band construction continues below; jlo/jhi filled at the end)
  // chain anchors with a sparse DP: score = k*MATCH per anchor minus an
  // affine penalty for the (di, dj) jump between consecutive anchors
  size_t m = matches.size();
  static thread_local std::vector<int64_t> chain_sc;
  static thread_local std::vector<int32_t> prev;
  chain_sc.assign(m, 0);
  prev.assign(m, -1);
  int64_t best_sc = -1;
  size_t best_i = 0;
  // predecessor window caps the chain DP at O(m*W) on repeat-heavy pairs
  const size_t MAX_PRED = 64;
  for (size_t a = 0; a < m; ++a) {
    chain_sc[a] = (int64_t)k * MATCH;
    size_t seen = 0;
    for (size_t b = a; b-- > 0 && seen < MAX_PRED;) {
      ++seen;
      if (matches[b].first >= matches[a].first ||
          matches[b].second >= matches[a].second)
        continue;
      int64_t di = matches[a].first - matches[b].first;
      int64_t dj = matches[a].second - matches[b].second;
      int64_t gap = std::max(di, dj) - std::min(di, dj);
      int64_t pen = gap > 0 ? -(GAP_OPEN + gap * GAP_EXTEND) : 0;
      int64_t overlap = std::max<int64_t>(0, k - std::min(di, dj));
      int64_t sc = chain_sc[b] + (int64_t)(k - overlap) * MATCH - pen;
      if (sc > chain_sc[a]) { chain_sc[a] = sc; prev[a] = (int32_t)b; }
    }
    if (chain_sc[a] > best_sc) { best_sc = chain_sc[a]; best_i = a; }
  }
  // best chain path, front to back
  static thread_local std::vector<std::pair<int32_t, int32_t>> path;
  path.clear();
  for (int32_t a = (int32_t)best_i; a != -1; a = prev[a])
    path.push_back(matches[a]);
  std::reverse(path.begin(), path.end());
  // band: per-row [jlo, jhi) from anchor diagonals widened by w, boxes
  // between consecutive anchors, and corner extensions at the ends
  jlo.assign(lx, INT32_MAX);
  jhi.assign(lx, INT32_MIN);
  auto add_box = [&](int32_t i0, int32_t i1, int32_t j0, int32_t j1) {
    i0 = std::max(0, i0); i1 = std::min(lx, i1);
    j0 = std::max(0, j0); j1 = std::min(ly, j1);
    for (int32_t r = i0; r < i1; ++r) {
      jlo[r] = std::min(jlo[r], j0);
      jhi[r] = std::max(jhi[r], j1);
    }
  };
  auto add_diag = [&](int32_t i0, int32_t j0, int32_t len) {
    for (int32_t t = -w; t < len + w; ++t) {
      int32_t r = i0 + t;
      if (r < 0 || r >= lx) continue;
      jlo[r] = std::min(jlo[r], std::max(0, j0 + t - w));
      jhi[r] = std::max(jhi[r], std::min(ly, j0 + t + w + 1));
    }
  };
  for (size_t a = 0; a < path.size(); ++a) {
    add_diag(path[a].first, path[a].second, k);
    if (a + 1 < path.size()) {
      // connect consecutive anchors with a box spanning their gap
      add_box(path[a].first, path[a + 1].first + k,
              path[a].second, path[a + 1].second + k);
    }
  }
  // corner extensions: local alignment may extend beyond the chain along
  // its diagonal — prepend/append diagonal runs to the matrix edges
  {
    int32_t i0 = path.front().first, j0 = path.front().second;
    int32_t back = std::min(i0, j0);
    add_diag(i0 - back, j0 - back, back);
    int32_t i1 = path.back().first + k, j1 = path.back().second + k;
    int32_t fwd = std::min(lx - i1, ly - j1);
    add_diag(i1, j1, fwd);
  }
  return 1;
}

int32_t banded_sw_chained(const uint8_t* x, int32_t lx, const uint8_t* y,
                          int32_t ly, int k, int w) {
  static thread_local std::vector<int32_t> jlo, jhi;
  int kind = build_chained_band(x, lx, y, ly, k, w, jlo, jhi);
  if (kind == 2) return full_sw(x, lx, y, ly);
  if (kind == 0) return 0;
  // DP restricted to per-row intervals (same evaluation as banded_sw)
  static thread_local std::vector<int32_t> H, F, Hd;
  H.assign(ly + 1, 0);
  F.assign(ly + 1, NEG);
  Hd.assign(ly + 1, 0);
  int32_t best = 0;
  int32_t prev_lo = 0, prev_hi = 0;
  for (int32_t i = 1; i <= lx; ++i) {
    int32_t lo = jlo[i - 1], hi = jhi[i - 1];
    if (lo >= hi) { prev_lo = 0; prev_hi = 0; continue; }
    std::swap(H, Hd);
    for (int32_t j = lo; j <= hi; ++j) {
      if (j < prev_lo || j > prev_hi) { Hd[j] = 0; F[j] = NEG; }
    }
    if (lo > 0 && (lo - 1 < prev_lo || lo - 1 > prev_hi)) Hd[lo - 1] = 0;
    int32_t h_prev = 0, e_row = NEG;
    for (int32_t j = lo + 1; j <= hi; ++j) {
      e_row = std::max(h_prev + GAP_OPEN + GAP_EXTEND, e_row + GAP_EXTEND);
      F[j] = std::max(Hd[j] + GAP_OPEN + GAP_EXTEND, F[j] + GAP_EXTEND);
      int32_t h = std::max({0, Hd[j - 1] + score(x[i - 1], y[j - 1]), e_row, F[j]});
      H[j] = h;
      h_prev = h;
      best = std::max(best, h);
    }
    prev_lo = lo + 1;
    prev_hi = hi;
  }
  return best;
}

template <typename F>
void parallel_for(int64_t n, int n_threads, F&& body) {
  if (n_threads <= 1) {
    for (int64_t i = 0; i < n; ++i) body(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&] {
      for (;;) {
        int64_t i = next.fetch_add(64);
        if (i >= n) return;
        int64_t end = std::min(n, i + 64);
        for (int64_t j = i; j < end; ++j) body(j);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// xs: concatenated reads, x_off[n+1] offsets; ys likewise. out[n] scores.
void full_sw_batch(const uint8_t* xs, const int64_t* x_off, const uint8_t* ys,
                   const int64_t* y_off, int64_t n, int32_t* out,
                   int n_threads) {
  parallel_for(n, n_threads, [&](int64_t i) {
    out[i] = full_sw(xs + x_off[i], (int32_t)(x_off[i + 1] - x_off[i]),
                     ys + y_off[i], (int32_t)(y_off[i + 1] - y_off[i]));
  });
}

void banded_sw_batch(const uint8_t* xs, const int64_t* x_off, const uint8_t* ys,
                     const int64_t* y_off, int64_t n, int32_t* out,
                     int n_threads, int k, int w) {
  parallel_for(n, n_threads, [&](int64_t i) {
    out[i] = banded_sw(xs + x_off[i], (int32_t)(x_off[i + 1] - x_off[i]),
                       ys + y_off[i], (int32_t)(y_off[i + 1] - y_off[i]), k, w);
  });
}

// rust-bio-style chained-band variant (see banded_sw_chained above)
void banded_sw_chained_batch(const uint8_t* xs, const int64_t* x_off,
                             const uint8_t* ys, const int64_t* y_off,
                             int64_t n, int32_t* out, int n_threads, int k,
                             int w) {
  parallel_for(n, n_threads, [&](int64_t i) {
    out[i] = banded_sw_chained(
        xs + x_off[i], (int32_t)(x_off[i + 1] - x_off[i]),
        ys + y_off[i], (int32_t)(y_off[i + 1] - y_off[i]), k, w);
  });
}

// Per-row chained-band intervals for device-side banded scoring: fills
// jlo/jhi (int16 [n, lx_pad], y positions, [lo, hi) per read row; rows
// beyond a pair's read length get [0, 0)). Sequences shorter than k fall
// back to the FULL band [0, ly) per row (matching banded_sw_chained's
// full-SW fallback); unseeded pairs get all-empty rows (score 0).
void banded_bounds_batch(const uint8_t* xs, const int64_t* x_off,
                         const uint8_t* ys, const int64_t* y_off,
                         int64_t n, int32_t lx_pad, int16_t* jlo_out,
                         int16_t* jhi_out, int n_threads, int k, int w) {
  parallel_for(n, n_threads, [&](int64_t i) {
    const uint8_t* x = xs + x_off[i];
    int32_t lx = (int32_t)(x_off[i + 1] - x_off[i]);
    const uint8_t* y = ys + y_off[i];
    int32_t ly = (int32_t)(y_off[i + 1] - y_off[i]);
    int16_t* lo = jlo_out + i * lx_pad;
    int16_t* hi = jhi_out + i * lx_pad;
    memset(lo, 0, sizeof(int16_t) * lx_pad);
    memset(hi, 0, sizeof(int16_t) * lx_pad);
    if (lx == 0 || ly == 0) return;
    static thread_local std::vector<int32_t> jlo, jhi;
    int kind = build_chained_band(x, lx, y, ly, k, w, jlo, jhi);
    int32_t lim = std::min(lx, lx_pad);
    if (kind == 2) {
      for (int32_t r = 0; r < lim; ++r) hi[r] = (int16_t)ly;
      return;
    }
    if (kind == 0) return;
    for (int32_t r = 0; r < lim; ++r) {
      if (jlo[r] < jhi[r]) {
        lo[r] = (int16_t)jlo[r];
        hi[r] = (int16_t)jhi[r];
      }
    }
  });
}

}  // extern "C"
