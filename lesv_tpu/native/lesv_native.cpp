// lesv_tpu native host kernels.
//
// The device (TPU) owns the banded-DP alignment fill; these are the
// host-side hot loops that stay on CPU: chain-DP scoring (the reference's
// `scoring_chain_seeds`, algo/chain_dp.c:109-170) and the fccns link DP
// (`consensus_backbone_segment`, algo/fccns/fccns_aux.c:128-220).
// Python bindings go through ctypes (lesv_tpu/native/__init__.py); every
// entry point has a numpy fallback so the package works without a
// compiler.
//
// Build: make -C lesv_tpu/native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// Chain DP forward scoring. Seeds must be sorted by (soff, qoff).
// Exact semantics of lesv_tpu.ops.chain.chain_score_np (the reference's
// scoring loop without the max_skip pruning heuristic).
void chain_score(
    int64_t n,
    const int64_t* qoff,
    const int64_t* soff,
    int64_t length,
    int64_t max_dist_qry,
    int64_t max_dist_ref,
    int64_t band_width,
    int64_t* f,           // out: best score ending at i
    int64_t* p)           // out: best predecessor (-1)
{
    const double avg_cov = (double)length;
    int64_t st = 0;
    for (int64_t i = 0; i < n; ++i) {
        f[i] = length;
        p[i] = -1;
    }
    for (int64_t i = 0; i < n; ++i) {
        while (soff[st] + length + max_dist_ref < soff[i]) ++st;
        int64_t best = f[i];
        int64_t bestj = -1;
        for (int64_t j = st; j < i; ++j) {
            int64_t dq = qoff[i] - qoff[j];
            int64_t dr = soff[i] - soff[j];
            if (dq <= 0 || dr <= 0) continue;
            if (dq > max_dist_qry || dr > max_dist_ref) continue;
            int64_t dd = dr > dq ? dr - dq : dq - dr;
            if (dd > band_width) continue;
            int64_t mind = dq < dr ? dq : dr;
            int64_t sc = mind < length ? mind : length;
            int64_t log_dd = 0;
            if (dd > 0) {
                // floor(log2(dd))
                log_dd = 63 - __builtin_clzll((uint64_t)dd);
            }
            sc -= (int64_t)(dd * 0.01 * avg_cov) + (log_dd >> 1);
            sc += f[j];
            if (sc > best) {
                best = sc;
                bestj = j;
            }
        }
        f[i] = best;
        p[i] = bestj;
    }
}

// Maximal-exact-match extension of kmer matches along their diagonals.
// For each (qoff, soff) pair, extend left/right while bases match;
// outputs extended (qoff, soff, len). Bounds: q in [0, qlen), s in
// [0, slen).
void extend_matches(
    int64_t n,
    const uint8_t* q,
    int64_t qlen,
    const uint8_t* s,
    int64_t slen,
    int64_t k,
    int64_t* qoff,        // in/out
    int64_t* soff,        // in/out
    int64_t* len_out)
{
    for (int64_t i = 0; i < n; ++i) {
        int64_t qa = qoff[i], sa = soff[i];
        int64_t qb = qa + k, sb = sa + k;
        while (qa > 0 && sa > 0 && q[qa - 1] == s[sa - 1]) { --qa; --sa; }
        while (qb < qlen && sb < slen && q[qb] == s[sb]) { ++qb; ++sb; }
        qoff[i] = qa;
        soff[i] = sa;
        len_out[i] = qb - qa;
    }
}

// fccns backbone link DP (see ops/consensus.py consensus_from_tags):
// links sorted so predecessor columns come first.
void fccns_link_dp(
    int64_t n_links,
    const int64_t* link_col,   // ascending column id per link
    const int64_t* pred_col,   // predecessor column id or -1
    const double* link_w,      // summed link weight
    const double* cov_pen,     // per-column coverage penalty
    int64_t n_cols,
    double* score,             // out, len n_cols (init -inf by caller)
    int64_t* best_pred)        // out, len n_cols (init -1 by caller)
{
    for (int64_t li = 0; li < n_links; ++li) {
        int64_t c = link_col[li];
        int64_t pc = pred_col[li];
        double sc = link_w[li] - cov_pen[c];
        if (pc >= 0) sc += score[pc];
        if (sc > score[c]) {
            score[c] = sc;
            best_pred[c] = pc;
        }
    }
}

}  // extern "C"
