// AVX-512 CPU cell-list neighbor-build baseline.
//
// Role (BASELINE.md "CPU baseline note"): the driver's north star asks the
// TPU engine to beat "the reference's AVX-512 CPU path" (BASELINE.json:5),
// but the reference mount is empty and cannot be built (SURVEY.md §0). This
// program is the honest in-repo stand-in: the same algorithm family the
// reference benchmarks — counting-sort cell binning + 27-cell sweep with
// AVX-512 compare + vcompressps compress-store into fixed-capacity padded
// half lists — written fresh, tuned for this host, timed under the same
// protocol as bench.py (median of reps, same lattice initial condition).
//
// Build: make -C baseline_cpp      Run: ./cell_list_baseline [N] [reps]
// Output: one JSON line {"n":..., "build_ms":..., "pairs":..., ...}
//
// Self-validation: at small N an O(N^2) brute-force pair count must match
// the cell-list pair count exactly (same oracle discipline as the JAX side,
// SURVEY.md §6.1).

#include <immintrin.h>

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Params {
  int64_t n;
  float rho = 1.0f;
  float rc = 2.5f;
  float skin = 0.3f;
  float L;     // box side
  float rs;    // search radius rc + skin
  int mc;      // cells per dim
  float cell;  // cell edge
};

// Simple-cubic lattice at density rho — matches core/system.py:init_lattice
// so CPU and TPU time the same physical configuration.
void init_lattice(const Params& p, float* x, float* y, float* z) {
  int m = static_cast<int>(std::ceil(std::cbrt(static_cast<double>(p.n))));
  while (static_cast<int64_t>(m) * m * m < p.n) ++m;
  const float spacing = p.L / m;
  for (int64_t i = 0; i < p.n; ++i) {
    int64_t ix = i % m, iy = (i / m) % m, iz = i / (static_cast<int64_t>(m) * m);
    x[i] = (ix + 0.5f) * spacing;
    y[i] = (iy + 0.5f) * spacing;
    z[i] = (iz + 0.5f) * spacing;
  }
}

struct CellList {
  std::vector<int> cell_of;    // cell id per (unsorted) particle
  std::vector<int> start;      // prefix offsets, size ncells+1
  std::vector<float> sx, sy, sz;  // sorted coordinates
  std::vector<int> sid;        // original id per sorted slot
};

// Counting sort into cells (the reference family's binning; SURVEY.md §3 R4).
void bin_particles(const Params& p, const float* x, const float* y,
                   const float* z, CellList& cl) {
  const int64_t n = p.n;
  const int mc = p.mc;
  const int64_t ncells = static_cast<int64_t>(mc) * mc * mc;
  const float inv = 1.0f / p.cell;
  cl.cell_of.resize(n);
  cl.start.assign(ncells + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    int cx = std::min(static_cast<int>(x[i] * inv), mc - 1);
    int cy = std::min(static_cast<int>(y[i] * inv), mc - 1);
    int cz = std::min(static_cast<int>(z[i] * inv), mc - 1);
    int c = cx + mc * (cy + mc * cz);
    cl.cell_of[i] = c;
    ++cl.start[c + 1];
  }
  for (int64_t c = 0; c < ncells; ++c) cl.start[c + 1] += cl.start[c];
  cl.sx.resize(n);
  cl.sy.resize(n);
  cl.sz.resize(n);
  cl.sid.resize(n);
  std::vector<int> cursor(cl.start.begin(), cl.start.end() - 1);
  for (int64_t i = 0; i < n; ++i) {
    int dst = cursor[cl.cell_of[i]]++;
    cl.sx[dst] = x[i];
    cl.sy[dst] = y[i];
    cl.sz[dst] = z[i];
    cl.sid[dst] = static_cast<int>(i);
  }
}

// The 13 forward neighbor offsets (+ self handled separately): visiting only
// lexicographically-positive offsets gives each unordered cell pair once —
// the half-list Newton-3 dedup at cell granularity (SURVEY.md §4.3).
constexpr int kFwd[13][3] = {
    {1, 0, 0},  {-1, 1, 0}, {0, 1, 0},  {1, 1, 0},  {-1, -1, 1}, {0, -1, 1},
    {1, -1, 1}, {-1, 0, 1}, {0, 0, 1},  {1, 0, 1},  {-1, 1, 1},  {0, 1, 1},
    {1, 1, 1}};

// AVX-512 sweep: for each sorted particle i, scan candidate segments with
// 16-lane compare and vcompressps-store surviving j indices into padded rows.
int64_t sweep_avx512(const Params& p, const CellList& cl, int k_cap,
                     int32_t* rows, int* counts) {
  const int mc = p.mc;
  const float rs2 = p.rs * p.rs;
  const __m512 vrs2 = _mm512_set1_ps(rs2);
  int64_t pairs = 0;
  const int* start = cl.start.data();
  const float* sx = cl.sx.data();
  const float* sy = cl.sy.data();
  const float* sz = cl.sz.data();

  std::vector<int32_t> jbuf(16);
  for (int cz = 0; cz < mc; ++cz)
    for (int cy = 0; cy < mc; ++cy)
      for (int cx = 0; cx < mc; ++cx) {
        const int c = cx + mc * (cy + mc * cz);
        const int cs = start[c], ce = start[c + 1];
        for (int i = cs; i < ce; ++i) {
          const __m512 xi = _mm512_set1_ps(sx[i]);
          const __m512 yi = _mm512_set1_ps(sy[i]);
          const __m512 zi = _mm512_set1_ps(sz[i]);
          int cnt = counts[i];
          int32_t* row = rows + static_cast<int64_t>(i) * k_cap;

          // same-cell forward pairs j > i
          for (int j0 = i + 1; j0 < ce; j0 += 16) {
            const int lanes = std::min(16, ce - j0);
            const __mmask16 lane_m = static_cast<__mmask16>((1u << lanes) - 1);
            __m512 dx = _mm512_sub_ps(xi, _mm512_maskz_loadu_ps(lane_m, sx + j0));
            __m512 dy = _mm512_sub_ps(yi, _mm512_maskz_loadu_ps(lane_m, sy + j0));
            __m512 dz = _mm512_sub_ps(zi, _mm512_maskz_loadu_ps(lane_m, sz + j0));
            __m512 r2 = _mm512_fmadd_ps(
                dx, dx, _mm512_fmadd_ps(dy, dy, _mm512_mul_ps(dz, dz)));
            __mmask16 hit = _mm512_mask_cmp_ps_mask(lane_m, r2, vrs2, _CMP_LT_OQ);
            if (hit) {
              __m512i jv = _mm512_add_epi32(
                  _mm512_set1_epi32(j0),
                  _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,
                                    13, 14, 15));
              _mm512_mask_compressstoreu_epi32(jbuf.data(), hit, jv);
              const int h = _mm_popcnt_u32(hit);
              for (int t = 0; t < h && cnt < k_cap; ++t) row[cnt++] = jbuf[t];
              pairs += h;
            }
          }

          // 13 forward neighbor cells, PBC shift folded into j positions
          for (const auto& d : kFwd) {
            int nx = cx + d[0], ny = cy + d[1], nz = cz + d[2];
            float shx = 0.f, shy = 0.f, shz = 0.f;
            if (nx < 0) { nx += mc; shx = -p.L; } else if (nx >= mc) { nx -= mc; shx = p.L; }
            if (ny < 0) { ny += mc; shy = -p.L; } else if (ny >= mc) { ny -= mc; shy = p.L; }
            if (nz < 0) { nz += mc; shz = -p.L; } else if (nz >= mc) { nz -= mc; shz = p.L; }
            const int nc = nx + mc * (ny + mc * nz);
            const int ns = start[nc], ne = start[nc + 1];
            const __m512 sxv = _mm512_set1_ps(shx);
            const __m512 syv = _mm512_set1_ps(shy);
            const __m512 szv = _mm512_set1_ps(shz);
            for (int j0 = ns; j0 < ne; j0 += 16) {
              const int lanes = std::min(16, ne - j0);
              const __mmask16 lane_m = static_cast<__mmask16>((1u << lanes) - 1);
              __m512 xj = _mm512_add_ps(_mm512_maskz_loadu_ps(lane_m, sx + j0), sxv);
              __m512 yj = _mm512_add_ps(_mm512_maskz_loadu_ps(lane_m, sy + j0), syv);
              __m512 zj = _mm512_add_ps(_mm512_maskz_loadu_ps(lane_m, sz + j0), szv);
              __m512 dx = _mm512_sub_ps(xi, xj);
              __m512 dy = _mm512_sub_ps(yi, yj);
              __m512 dz = _mm512_sub_ps(zi, zj);
              __m512 r2 = _mm512_fmadd_ps(
                  dx, dx, _mm512_fmadd_ps(dy, dy, _mm512_mul_ps(dz, dz)));
              __mmask16 hit =
                  _mm512_mask_cmp_ps_mask(lane_m, r2, vrs2, _CMP_LT_OQ);
              if (hit) {
                __m512i jv = _mm512_add_epi32(
                    _mm512_set1_epi32(j0),
                    _mm512_setr_epi32(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12,
                                      13, 14, 15));
                _mm512_mask_compressstoreu_epi32(jbuf.data(), hit, jv);
                const int h = _mm_popcnt_u32(hit);
                for (int t = 0; t < h && cnt < k_cap; ++t) row[cnt++] = jbuf[t];
                pairs += h;
              }
            }
          }
          counts[i] = cnt;
        }
      }
  return pairs;
}

// Brute-force validation count (min-image), O(N^2) — small N only.
int64_t brute_pairs(const Params& p, const float* x, const float* y,
                    const float* z) {
  const float rs2 = p.rs * p.rs;
  int64_t pairs = 0;
  for (int64_t i = 0; i < p.n; ++i)
    for (int64_t j = i + 1; j < p.n; ++j) {
      float dx = x[i] - x[j];
      float dy = y[i] - y[j];
      float dz = z[i] - z[j];
      dx -= p.L * std::nearbyint(dx / p.L);
      dy -= p.L * std::nearbyint(dy / p.L);
      dz -= p.L * std::nearbyint(dz / p.L);
      if (dx * dx + dy * dy + dz * dz < rs2) ++pairs;
    }
  return pairs;
}

}  // namespace

int main(int argc, char** argv) {
  Params p;
  p.n = argc > 1 ? std::atoll(argv[1]) : 1000000;
  const int reps = argc > 2 ? std::atoi(argv[2]) : 10;
  p.L = std::cbrt(static_cast<double>(p.n) / p.rho);
  p.rs = p.rc + p.skin;
  p.mc = std::max(1, static_cast<int>(p.L / p.rs));
  p.cell = p.L / p.mc;
  if (p.mc < 3) {
    std::fprintf(stderr, "box too small (mc=%d < 3)\n", p.mc);
    return 1;
  }

  std::vector<float> x(p.n), y(p.n), z(p.n);
  init_lattice(p, x.data(), y.data(), z.data());

  const int k_cap = 96;
  std::vector<int32_t> rows(static_cast<int64_t>(p.n) * k_cap);
  std::vector<int> counts(p.n);

  // validate at reduced N first (exact pair-count parity vs brute force)
  {
    Params q = p;
    q.n = std::min<int64_t>(p.n, 4096);
    q.L = std::cbrt(static_cast<double>(q.n) / q.rho);
    q.mc = std::max(1, static_cast<int>(q.L / q.rs));
    q.cell = q.L / q.mc;
    std::vector<float> qx(q.n), qy(q.n), qz(q.n);
    init_lattice(q, qx.data(), qy.data(), qz.data());
    CellList qcl;
    bin_particles(q, qx.data(), qy.data(), qz.data(), qcl);
    std::vector<int32_t> qrows(static_cast<int64_t>(q.n) * k_cap);
    std::vector<int> qcounts(q.n, 0);
    int64_t cell_pairs =
        sweep_avx512(q, qcl, k_cap, qrows.data(), qcounts.data());
    int64_t brute = q.mc >= 3 ? brute_pairs(q, qx.data(), qy.data(), qz.data())
                              : cell_pairs;
    if (cell_pairs != brute) {
      std::fprintf(stderr, "VALIDATION FAILED: cell=%lld brute=%lld\n",
                   static_cast<long long>(cell_pairs),
                   static_cast<long long>(brute));
      return 2;
    }
    std::fprintf(stderr, "validation ok at N=%lld: %lld pairs\n",
                 static_cast<long long>(q.n), static_cast<long long>(brute));
  }

  std::vector<double> times;
  int64_t pairs = 0;
  int maxcnt = 0;
  CellList cl;  // buffers reused across reps, as steady-state rebuilds would
  for (int r = 0; r < reps + 1; ++r) {  // +1 warmup
    std::fill(counts.begin(), counts.end(), 0);
    auto t0 = std::chrono::steady_clock::now();
    bin_particles(p, x.data(), y.data(), z.data(), cl);
    pairs = sweep_avx512(p, cl, k_cap, rows.data(), counts.data());
    auto t1 = std::chrono::steady_clock::now();
    if (r > 0)
      times.push_back(
          std::chrono::duration<double, std::milli>(t1 - t0).count());
    maxcnt = *std::max_element(counts.begin(), counts.end());
  }
  std::sort(times.begin(), times.end());
  const double med = times[times.size() / 2];

  std::printf(
      "{\"n\": %lld, \"build_ms\": %.3f, \"pairs\": %lld, \"max_count\": %d, "
      "\"k_cap\": %d, \"threads\": 1, \"simd\": \"avx512\", \"reps\": %d}\n",
      static_cast<long long>(p.n), med, static_cast<long long>(pairs), maxcnt,
      k_cap, reps);
  return maxcnt > k_cap ? 3 : 0;
}
