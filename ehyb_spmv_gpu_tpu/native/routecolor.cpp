// Bipartite edge coloring for the routing engine's stage-B step assignment
// (core/route.py).  Each dst-slice ("pair") is an independent bipartite
// multigraph: dst lanes (128) on one side, source lanes ("slots", 128) on the
// other, one edge per routed entry.  A valid stage-B schedule assigns every
// edge a step ("color") such that within a (pair, step) no lane and no slot
// repeats — exactly proper edge coloring.  König: Δ(pair) colors suffice; the
// sequential lowest-free-color greedy with 64-bit masks gets within ~1 round
// of Δ in practice, where the vectorized round-election in Python plateaued
// at ~1.5Δ (13% spill on random matrices).
//
// Role in the reference: the GPU ER phase needs no such schedule because
// global-memory gathers are hardware (/root/reference/kernel.cu:169-194);
// on TPU the schedule IS the gather.  Plain C ABI, loaded via ctypes like
// partition.cpp.
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Returns the number of spilled edges (color_out = -1), or -1 on bad args.
// pair[i] in [0, n_pairs); lane[i], slot[i] in [0, 128); order = processing
// sequence (indices into the edge arrays); max_colors <= 64.
long long ehyb_color_edges(long long n_edges,
                           const int32_t* pair,
                           const int16_t* lane,
                           const int16_t* slot,
                           const int64_t* order,
                           int32_t n_pairs,
                           int32_t max_colors,
                           int32_t* color_out) {
  if (n_edges < 0 || n_pairs <= 0 || max_colors < 1 || max_colors > 64)
    return -1;
  const uint64_t cap_mask =
      (max_colors == 64) ? ~0ull : ((1ull << max_colors) - 1ull);
  std::vector<uint64_t> lmask((size_t)n_pairs * 128, 0);
  std::vector<uint64_t> smask((size_t)n_pairs * 128, 0);
  long long spilled = 0;
  for (long long k = 0; k < n_edges; ++k) {
    const int64_t e = order[k];
    const size_t base = (size_t)pair[e] * 128;
    uint64_t& lm = lmask[base + (uint16_t)lane[e]];
    uint64_t& sm = smask[base + (uint16_t)slot[e]];
    const uint64_t free = ~(lm | sm) & cap_mask;
    if (!free) {
      color_out[e] = -1;
      ++spilled;
      continue;
    }
    const int c = __builtin_ctzll(free);
    const uint64_t bit = 1ull << c;
    lm |= bit;
    sm |= bit;
    color_out[e] = c;
  }
  return spilled;
}

}  // extern "C"
