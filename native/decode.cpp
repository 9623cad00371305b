// Streaming C++ decoder for the packed cluster-bitmask neighbor-list
// artifact (ops/pallas_force.py::dense_lists_half).
//
// The TPU engine's list deliverable is cluster-compressed: i32 mask words
// packed over the own-slot axis, one bit per unordered pair (format spec:
// ops/decode.py module docstring — this file mirrors those exact bit
// semantics and is parity-tested against the numpy decoder in
// tests/test_native_decode.py). Decoding is an O(pairs) irregular
// expansion that belongs on the host (SURVEY.md §3: host-side native code
// is the right tool exactly here); at N=8M the artifact is ~1.7 GB and
// 320M pairs, where the numpy path's per-(word,bit) nonzero scans cost
// minutes and ~5 GB of index intermediates — this single-pass popcount
// walk costs seconds and zero intermediates.
//
// Build: g++ -O3 -march=native -std=c++17 -shared -fPIC decode.cpp
//        (done on demand by md_neighbor_list_tpu/utils/native.py).
#include <cstdint>

namespace {
// HALF_OFFSETS5 (dz, dy) — mirrored from ops/pallas_force.py:239.
constexpr int DZ[5] = {0, 0, 1, 1, 1};
constexpr int DY[5] = {0, 1, -1, 0, 1};
constexpr int MASK_BITS = 32;  // ops/pallas_force.py:43

inline uint32_t word_bit_mask(int32_t cap, int32_t w) {
  // Valid bits of word w cover own slots 32w .. min(32w+31, cap-1); the
  // kernel never sets higher bits, but masking keeps the walk defensive.
  const int32_t nbits = cap - MASK_BITS * w;
  if (nbits >= MASK_BITS) return 0xffffffffu;
  if (nbits <= 0) return 0u;
  return (1u << nbits) - 1u;
}
}  // namespace

extern "C" {

// Exact decodable-pair count: popcount of every valid bit in the artifact.
// masks: C-contiguous i32 (5, words, R=mc*mc, mc, 3*cap).
int64_t mdnl_mask_pair_count(const int32_t* masks, int32_t mc, int32_t cap,
                             int32_t words) {
  const int64_t vol = (int64_t)mc * mc * mc * 3 * cap;  // per (k, w) plane
  int64_t total = 0;
  for (int k = 0; k < 5; ++k) {
    for (int32_t w = 0; w < words; ++w) {
      const uint32_t bmask = word_bit_mask(cap, w);
      const int32_t* p = masks + ((int64_t)k * words + w) * vol;
      for (int64_t e = 0; e < vol; ++e)
        total += __builtin_popcount((uint32_t)p[e] & bmask);
    }
  }
  return total;
}

// Decode every set bit to (own pid, partner pid), preserving the kernel's
// Newton-3 attribution (the OWN slot is the row the pair is charged to).
//   masks: C-contiguous i32 (5, words, R, mc, 3*cap)
//   pid:   C-contiguous i32 (R, mc, cap), -1 marks an empty slot
// Returns pairs written; -1 if any set bit points at an empty slot
// (masks and pid are from different states); -2 if out_cap is too small.
int64_t mdnl_decode_half(const int32_t* masks, const int32_t* pid,
                         int32_t mc, int32_t cap, int32_t words,
                         int32_t* out_own, int32_t* out_partner,
                         int64_t out_cap) {
  const int64_t R = (int64_t)mc * mc;
  const int64_t lanes = 3 * (int64_t)cap;
  int64_t nout = 0;
  for (int k = 0; k < 5; ++k) {
    const int32_t dz = DZ[k], dy = DY[k];
    for (int32_t w = 0; w < words; ++w) {
      const uint32_t bmask = word_bit_mask(cap, w);
      const int32_t* plane = masks + ((int64_t)k * words + w) * R * mc * lanes;
      for (int64_t r = 0; r < R; ++r) {
        const int32_t z = (int32_t)(r / mc), y = (int32_t)(r % mc);
        const int64_t prow =
            (int64_t)((z + dz) % mc) * mc + (y + dy + mc) % mc;
        for (int32_t x = 0; x < mc; ++x) {
          const int32_t* row = plane + (r * mc + x) * lanes;
          const int64_t own_base =
              (r * mc + x) * (int64_t)cap + MASK_BITS * w;
          for (int64_t lane = 0; lane < lanes; ++lane) {
            uint32_t v = (uint32_t)row[lane] & bmask;
            if (!v) continue;
            const int32_t px =
                (int32_t)((x + (int32_t)(lane / cap) - 1 + mc) % mc);
            const int32_t pj =
                pid[(prow * mc + px) * cap + (int32_t)(lane % cap)];
            while (v) {
              const int b = __builtin_ctz(v);
              v &= v - 1;
              const int32_t pi = pid[own_base + b];
              if (pi < 0 || pj < 0) return -1;
              if (nout >= out_cap) return -2;
              out_own[nout] = pi;
              out_partner[nout] = pj;
              ++nout;
            }
          }
        }
      }
    }
  }
  return nout;
}

// Decode straight into fixed-capacity padded rows (the reference's
// deliverable shape, BASELINE.json:5) in ONE O(pairs) pass — no pair
// buffer, no argsort: each decoded pair lands at its row's running
// cursor. On the 1-vCPU host this replaces the numpy padded-row
// construction (40M-pair stable argsort + fancy-index scatter, tens of
// seconds at N=1M) with the walk itself.
//   idx: (n, k_cap) i32, fully overwritten (pad = sentinel n)
//   cnt: (n,)      i32, fully overwritten
//   full: nonzero -> store each pair in BOTH rows (symmetric full lists)
// Returns the max row count seen — if it exceeds k_cap the overflowing
// entries were dropped (counts stay correct) and the caller must re-call
// with k_cap >= the returned value; -1 if a set bit points at an empty
// slot; -3 if a decoded pid falls outside [0, n).
int64_t mdnl_decode_half_padded(const int32_t* masks, const int32_t* pid,
                                int32_t mc, int32_t cap, int32_t words,
                                int64_t n, int64_t k_cap, int32_t full,
                                int32_t* idx, int32_t* cnt) {
  const int64_t R = (int64_t)mc * mc;
  const int64_t lanes = 3 * (int64_t)cap;
  const int32_t pad = (int32_t)n;
  for (int64_t e = 0; e < n * k_cap; ++e) idx[e] = pad;
  for (int64_t i = 0; i < n; ++i) cnt[i] = 0;
  int64_t maxc = 0;
  for (int k = 0; k < 5; ++k) {
    const int32_t dz = DZ[k], dy = DY[k];
    for (int32_t w = 0; w < words; ++w) {
      const uint32_t bmask = word_bit_mask(cap, w);
      const int32_t* plane = masks + ((int64_t)k * words + w) * R * mc * lanes;
      for (int64_t r = 0; r < R; ++r) {
        const int32_t z = (int32_t)(r / mc), y = (int32_t)(r % mc);
        const int64_t prow =
            (int64_t)((z + dz) % mc) * mc + (y + dy + mc) % mc;
        for (int32_t x = 0; x < mc; ++x) {
          const int32_t* row = plane + (r * mc + x) * lanes;
          const int64_t own_base =
              (r * mc + x) * (int64_t)cap + MASK_BITS * w;
          for (int64_t lane = 0; lane < lanes; ++lane) {
            uint32_t v = (uint32_t)row[lane] & bmask;
            if (!v) continue;
            const int32_t px =
                (int32_t)((x + (int32_t)(lane / cap) - 1 + mc) % mc);
            const int32_t pj =
                pid[(prow * mc + px) * cap + (int32_t)(lane % cap)];
            while (v) {
              const int b = __builtin_ctz(v);
              v &= v - 1;
              const int32_t pi = pid[own_base + b];
              if (pi < 0 || pj < 0) return -1;
              if (pi >= n || pj >= n) return -3;
              int32_t c = cnt[pi]++;
              if (c < k_cap) idx[(int64_t)pi * k_cap + c] = pj;
              if (c + 1 > maxc) maxc = c + 1;
              if (full) {
                c = cnt[pj]++;
                if (c < k_cap) idx[(int64_t)pj * k_cap + c] = pi;
                if (c + 1 > maxc) maxc = c + 1;
              }
            }
          }
        }
      }
    }
  }
  return maxc;
}

}  // extern "C"
