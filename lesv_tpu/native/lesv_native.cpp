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

// Alignment traceback over direction bytes (see ops/align_jax.py
// traceback_batch — identical semantics, per-lane sequential).
// dirs: (B, R, W) uint8 with R = Qmax+1 (lane-major).
// mode_diag: 1 for diag guide g(i)=i-W/2, 0 for full (g=0).
// Returns per lane: ops written FORWARD into ops[b*T .. b*T+nops),
// nops, reached flag.
void traceback_batch(
    int64_t B,
    int64_t R,
    int64_t W,
    const uint8_t* dirs,
    const int64_t* end_i,
    const int64_t* end_b,
    const uint8_t* ok,
    int64_t mode_diag,
    int64_t T,
    uint8_t* ops,          // (B, T), caller-initialized to 255
    int64_t* nops,
    uint8_t* reached)
{
    const int64_t W2 = W / 2;
    const int64_t Qmax = R - 1;
    const int64_t d = mode_diag ? 1 : 0;
    for (int64_t lane = 0; lane < B; ++lane) {
        nops[lane] = 0;
        reached[lane] = 0;
        if (!ok[lane]) continue;
        int64_t i = end_i[lane];
        int64_t b = end_b[lane];
        int64_t st = 0;
        int64_t n = 0;
        uint8_t* out = ops + lane * T;
        const uint8_t* dl = dirs + lane * R * W;
        bool good = false;
        while (n < T) {
            int64_t g = mode_diag ? (i - W2) : 0;
            if (i <= 0 && g + b <= 0) { good = true; break; }
            if (i < 0 || b < 0 || b >= W) break;
            uint8_t byte = dl[(i < 0 ? 0 : (i > Qmax ? Qmax : i)) * W + b];
            int64_t st_eff = st == 0 ? (byte & 7) : st;
            if (st_eff == 0) {                  // diag / match
                out[n++] = 0;
                i -= 1;
                b += d - 1;
            } else if (st_eff <= 2) {           // E1/E2: gap in query (D)
                out[n++] = 2;
                bool ext = (st_eff == 1) ? (byte & 0x08) : (byte & 0x10);
                b -= 1;
                st = ext ? st_eff : 0;
            } else {                            // F1/F2: gap in subject (I)
                out[n++] = 1;
                bool ext = (st_eff == 3) ? (byte & 0x20) : (byte & 0x40);
                i -= 1;
                b += d;
                st = ext ? st_eff : 0;
            }
        }
        if (!good || n == 0) continue;
        // reverse in place
        for (int64_t a = 0, z = n - 1; a < z; ++a, --z) {
            uint8_t t = out[a]; out[a] = out[z]; out[z] = t;
        }
        nops[lane] = n;
        reached[lane] = 1;
    }
}

}  // extern "C"
