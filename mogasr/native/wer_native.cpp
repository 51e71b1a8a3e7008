// Native batch Levenshtein for corpus WER scoring.
//
// The device side of this framework is jax/XLA/Pallas; WER scoring is host
// work (SURVEY.md §1 L5) and the O(R*H) dynamic program over a full eval set
// (thousands of utterances) is the one host hot loop, so it gets a C++
// implementation (task rule: native runtime components in C++). Exposed via
// ctypes; mogasr.eval.wer falls back to pure Python when the shared object
// is unavailable.
//
// Tokens are pre-interned to int32 ids on the Python side; sequences are
// passed as flat arrays with offsets (ragged layout).

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Computes (sub, del, ins) per pair and writes into out[3*i .. 3*i+2].
// refs/hyps: flat int32 token ids; *_off: n_pairs+1 offsets.
void batch_edit_counts(const int32_t* refs, const int64_t* ref_off,
                       const int32_t* hyps, const int64_t* hyp_off,
                       int64_t n_pairs, int32_t* out) {
  std::vector<int32_t> cost;   // (R+1) x (H+1) cost matrix
  std::vector<int8_t> op;      // 0=match 1=sub 2=del 3=ins
  for (int64_t p = 0; p < n_pairs; ++p) {
    const int32_t* r = refs + ref_off[p];
    const int32_t* h = hyps + hyp_off[p];
    const int64_t R = ref_off[p + 1] - ref_off[p];
    const int64_t H = hyp_off[p + 1] - hyp_off[p];
    const int64_t W = H + 1;
    cost.assign((R + 1) * W, 0);
    op.assign((R + 1) * W, 0);
    for (int64_t i = 1; i <= R; ++i) { cost[i * W] = (int32_t)i; op[i * W] = 2; }
    for (int64_t j = 1; j <= H; ++j) { cost[j] = (int32_t)j; op[j] = 3; }
    for (int64_t i = 1; i <= R; ++i) {
      for (int64_t j = 1; j <= H; ++j) {
        if (r[i - 1] == h[j - 1]) {
          cost[i * W + j] = cost[(i - 1) * W + (j - 1)];
          op[i * W + j] = 0;
        } else {
          int32_t sub = cost[(i - 1) * W + (j - 1)] + 1;
          int32_t del = cost[(i - 1) * W + j] + 1;
          int32_t ins = cost[i * W + (j - 1)] + 1;
          int32_t best = std::min(sub, std::min(del, ins));
          cost[i * W + j] = best;
          op[i * W + j] = best == sub ? 1 : (best == del ? 2 : 3);
        }
      }
    }
    // backtrace for the (sub, del, ins) breakdown
    int32_t s = 0, d = 0, n = 0;
    int64_t i = R, j = H;
    while (i > 0 || j > 0) {
      int8_t o = op[i * W + j];
      if (o == 0 || o == 1) { s += (o == 1); --i; --j; }
      else if (o == 2) { ++d; --i; }
      else { ++n; --j; }
    }
    out[3 * p] = s;
    out[3 * p + 1] = d;
    out[3 * p + 2] = n;
  }
}

}  // extern "C"
