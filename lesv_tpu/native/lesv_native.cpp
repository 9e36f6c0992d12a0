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
#include <thread>
#include <vector>

extern "C" {

// Rolling-hash k-mer scan over one 2-bit-coded sequence (the index-build
// half of the reference's `get_khao_array`, algo/lookup_table.c:27-92).
// Emits (hash, global position) for every VALID k-mer starting at local
// offsets 0, stride, 2*stride, ...; windows containing an ambiguous code
// (>= 4) are skipped.  Hash is the MSB-first 2-bit pack (identical to
// lesv_tpu.index.kmer_index.kmer_hashes).  Returns the emit count.
// O(n) via a rolling shift instead of the numpy path's k gathers.
int64_t kmer_scan(
    const uint8_t* codes, int64_t n, int64_t k, int64_t stride,
    int64_t base, int64_t* out_hash, uint32_t* out_pos)
{
    if (n < k) return 0;
    const uint64_t mask = (k >= 32) ? ~0ull : ((1ull << (2 * k)) - 1);
    uint64_t h = 0;
    int64_t last_ambig = -1;  // most recent position with code >= 4
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
        uint8_t c = codes[i];
        if (c >= 4) { last_ambig = i; c = 0; }
        h = ((h << 2) | c) & mask;
        int64_t o = i - k + 1;  // window start
        if (o >= 0 && o % stride == 0 && last_ambig < o) {
            out_hash[m] = (int64_t)h;
            out_pos[m] = (uint32_t)(base + o);
            ++m;
        }
    }
    return m;
}

// Multithreaded stable LSD radix sort of (hash, position) pairs by hash
// (the reference's MT bucket sort, algo/hash_list_bucket_sort.c).
// 8-bit digits, ceil(nbits/8) passes; stability means positions stay
// ascending within each hash group when they enter globally ascending.
void radix_sort_hash_pos(
    int64_t n, int64_t* h, uint32_t* p, int64_t nbits, int64_t nthreads)
{
    if (n <= 1) return;
    int64_t T = std::max<int64_t>(1, std::min<int64_t>(
        nthreads > 0 ? nthreads : std::thread::hardware_concurrency(), 16));
    const int64_t passes = (nbits + 7) / 8;
    std::vector<int64_t> h2(n);
    std::vector<uint32_t> p2(n);
    int64_t* hs = h;      uint32_t* ps = p;
    int64_t* hd = h2.data(); uint32_t* pd = p2.data();
    std::vector<int64_t> counts(T * 256);
    const int64_t chunk = (n + T - 1) / T;
    for (int64_t pass = 0; pass < passes; ++pass) {
        const int shift = (int)(pass * 8);
        std::fill(counts.begin(), counts.end(), 0);
        auto hist = [&](int64_t t) {
            int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
            int64_t* c = counts.data() + t * 256;
            for (int64_t i = lo; i < hi; ++i)
                ++c[(hs[i] >> shift) & 0xff];
        };
        {
            std::vector<std::thread> th;
            for (int64_t t = 1; t < T; ++t) th.emplace_back(hist, t);
            hist(0);
            for (auto& x : th) x.join();
        }
        // offsets: bucket-major exclusive scan, thread order preserved
        // within a bucket => globally stable scatter
        int64_t off = 0;
        std::vector<int64_t> offs(T * 256);
        for (int b = 0; b < 256; ++b)
            for (int64_t t = 0; t < T; ++t) {
                offs[t * 256 + b] = off;
                off += counts[t * 256 + b];
            }
        auto scatter = [&](int64_t t) {
            int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
            int64_t* o = offs.data() + t * 256;
            for (int64_t i = lo; i < hi; ++i) {
                int64_t d = (hs[i] >> shift) & 0xff;
                int64_t j = o[d]++;
                hd[j] = hs[i];
                pd[j] = ps[i];
            }
        };
        {
            std::vector<std::thread> th;
            for (int64_t t = 1; t < T; ++t) th.emplace_back(scatter, t);
            scatter(0);
            for (auto& x : th) x.join();
        }
        std::swap(hs, hd);
        std::swap(ps, pd);
    }
    if (hs != h) {  // odd number of passes: copy back
        std::memcpy(h, hs, n * sizeof(int64_t));
        std::memcpy(p, ps, n * sizeof(uint32_t));
    }
}

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

// Banded dual-affine fill — identical recurrences to
// ops/align_jax.banded_align_kernel (diag mode g(i)=i-W/2 / full mode
// g=0), producing the same direction bytes. This is the host-CPU
// execution path (the XLA:CPU scan is ~100x slower per cell); the TPU
// kernel remains the production device path.
static const int32_t kNeg = -(1 << 28);

void banded_fill(
    int64_t Q,              // rows to fill (qlen)
    int64_t S,              // subject length (slen)
    const uint8_t* q,
    const uint8_t* s,
    int64_t W,
    int64_t mode_diag,
    int64_t match,
    int64_t mismatch,
    int64_t go1, int64_t ge1,
    int64_t go2, int64_t ge2,
    int64_t free_end,
    uint8_t* dirs,          // (Q+1, W) out
    int32_t* out_score,     // [1]
    int64_t* out_end_i,     // [1]
    int64_t* out_end_b,     // [1]
    uint8_t* out_ok)        // [1]
{
    const int64_t W2 = W / 2;
    const int64_t d = mode_diag ? 1 : 0;
    const int32_t M32 = (int32_t)match, X32 = (int32_t)(-mismatch);
    const int32_t GO1E = (int32_t)(go1 + ge1), GE1 = (int32_t)ge1;
    const int32_t GO2E = (int32_t)(go2 + ge2), GE2 = (int32_t)ge2;
    const int32_t GO1 = (int32_t)go1, GO2 = (int32_t)go2;
    // rows padded by one sentinel on each side so the +-1 shifted reads
    // need no per-cell bounds checks (the shifts become plain unaligned
    // vector loads under -O3/-march=native)
    const int64_t Wp = W + 2;
    int32_t* buf = new int32_t[6 * Wp];
    for (int64_t t = 0; t < 6 * Wp; ++t) buf[t] = kNeg;
    int32_t* __restrict__ H   = buf + 1;
    int32_t* __restrict__ F1  = buf + Wp + 1;
    int32_t* __restrict__ F2  = buf + 2 * Wp + 1;
    int32_t* __restrict__ Hp  = buf + 3 * Wp + 1;
    int32_t* __restrict__ F1p = buf + 4 * Wp + 1;
    int32_t* __restrict__ F2p = buf + 5 * Wp + 1;
    int32_t* __restrict__ D   = new int32_t[W];   // diag candidate
    int32_t* __restrict__ PRE = new int32_t[W];   // max(diag, F1, F2)
    int32_t* __restrict__ M1  = new int32_t[W];   // prefix max PRE+j*ge1
    int32_t* __restrict__ M2  = new int32_t[W];
    // subject padded so s[j-1] reads never leave the buffer (pad = 255,
    // which matches no code)
    const int64_t smax = (Q > S ? Q : S) + 2 * W + 8;
    const int64_t soff0 = W2 + 2;              // spad[soff0 + t] = s[t]
    uint8_t* spad = new uint8_t[smax + soff0];
    std::memset(spad, 255, smax + soff0);
    std::memcpy(spad + soff0, s, S);

    for (int64_t b = 0; b < W; ++b) {
        int64_t j = (mode_diag ? (0 - W2) : 0) + b;
        int32_t e1 = (j > 0) ? (int32_t)(-go1 - j * ge1) : kNeg;
        int32_t e2 = (j > 0) ? (int32_t)(-go2 - j * ge2) : kNeg;
        int32_t h = (j == 0) ? 0 : (e1 > e2 ? e1 : e2);
        bool inb = j >= 0 && j <= S;
        H[b] = inb ? h : kNeg;
        F1[b] = kNeg;
        F2[b] = kNeg;
        dirs[b] = (uint8_t)((e1 >= e2 ? 1 : 2) | 0x18);
    }
    int32_t best = free_end ? H[mode_diag ? W2 : 0] : kNeg;
    int64_t best_i = 0, best_b = mode_diag ? W2 : 0;

    for (int64_t i = 1; i <= Q; ++i) {
        uint8_t* __restrict__ dr = dirs + i * W;
        const int64_t g = mode_diag ? (i - W2) : 0;
        const int32_t qc = q[i - 1];
        std::swap(H, Hp);
        std::swap(F1, F1p);
        std::swap(F2, F2p);
        const int32_t* __restrict__ hd_p  = Hp + (d ? 0 : -1);
        const int32_t* __restrict__ hu_p  = Hp + d;
        const int32_t* __restrict__ f1u_p = F1p + d;
        const int32_t* __restrict__ f2u_p = F2p + d;
        const uint8_t* __restrict__ srow = spad + soff0 - 1 + g;
        // pass A (vectorizable): diag / F lanes / Hpre / F-ext flags /
        // the prefix-max inputs
        for (int64_t b = 0; b < W; ++b) {
            int32_t hd = hd_p[b];
            int32_t sub = (srow[b] == (uint8_t)qc) ? M32 : X32;
            int32_t diagv = (hd > kNeg / 2) ? hd + sub : kNeg;
            int32_t f1b_ = f1u_p[b] - GE1;
            int32_t f1 = hu_p[b] - GO1E;
            if (f1b_ > f1) f1 = f1b_;
            int32_t f2b_ = f2u_p[b] - GE2;
            int32_t f2 = hu_p[b] - GO2E;
            if (f2b_ > f2) f2 = f2b_;
            F1[b] = f1;
            F2[b] = f2;
            D[b] = diagv;
            int32_t hpre = diagv;
            if (f1 > hpre) hpre = f1;
            if (f2 > hpre) hpre = f2;
            PRE[b] = hpre;
            uint8_t byte = 0;
            if (f1 == f1b_) byte |= 0x20;
            if (f2 == f2b_) byte |= 0x40;
            dr[b] = byte;
            int32_t j32 = (int32_t)(g + b);
            M1[b] = (hpre > kNeg / 2) ? hpre + j32 * GE1 : kNeg;
            M2[b] = (hpre > kNeg / 2) ? hpre + j32 * GE2 : kNeg;
        }
        // pass B: the only sequential dependency — 2 maxes per cell
        {
            int32_t r1 = kNeg, r2 = kNeg;
            for (int64_t b = 0; b < W; ++b) {
                r1 = M1[b] > r1 ? M1[b] : r1;
                M1[b] = r1;
                r2 = M2[b] > r2 ? M2[b] : r2;
                M2[b] = r2;
            }
        }
        // pass C (vectorizable): E lanes from the prefix max, combine,
        // source bytes.  e1(b) = M1[b-1] - go1 - j*ge1; the extension
        // flag reduces to "no new prefix max at b-1" (see traceback).
        {
            // b == 0 cell (E invalid, ext flags set as in the scan)
            int64_t j0 = g;
            int32_t h0 = PRE[0];
            bool inb0 = j0 >= 0 && j0 <= S;
            if (!inb0) h0 = kNeg;
            // source priority diag, E1, E2, F1, F2; e1 == e2 == kNeg
            // here, so h == kNeg selects E1 first (scalar-chain parity)
            uint8_t src0;
            if (h0 == D[0]) src0 = 0;
            else if (h0 == kNeg) src0 = 1;
            else if (h0 == F1[0]) src0 = 3;
            else src0 = 4;
            dr[0] = (uint8_t)(dr[0] | src0 | 0x18);
            H[0] = h0;
            if (free_end && inb0 && h0 > best) {
                best = h0; best_i = i; best_b = 0;
            }
        }
        // b == 1 peeled (no M[b-2]); then a branchless vector body
        if (W > 1) {
            int32_t j32 = (int32_t)(g + 1);
            int32_t m1 = M1[0], m2 = M2[0];
            int32_t e1 = (m1 > kNeg / 2) ? m1 - GO1 - j32 * GE1 : kNeg;
            int32_t e2 = (m2 > kNeg / 2) ? m2 - GO2 - j32 * GE2 : kNeg;
            int32_t h = PRE[1];
            if (e1 > h) h = e1;
            if (e2 > h) h = e2;
            if (!((g + 1) >= 0 && (g + 1) <= S)) h = kNeg;
            uint8_t src;
            if (h == D[1]) src = 0;
            else if (h == e1) src = 1;
            else if (h == e2) src = 2;
            else if (h == F1[1]) src = 3;
            else src = 4;
            dr[1] = (uint8_t)(dr[1] | src);
            H[1] = h;
        }
        const int32_t Slim = (int32_t)S;
        
#pragma omp simd
        for (int64_t b = 2; b < W; ++b) {
            int32_t j32 = (int32_t)(g + b);
            int32_t m1 = M1[b - 1];
            int32_t m2 = M2[b - 1];
            int32_t e1 = (m1 > kNeg / 2) ? m1 - GO1 - j32 * GE1 : kNeg;
            int32_t e2 = (m2 > kNeg / 2) ? m2 - GO2 - j32 * GE2 : kNeg;
            int32_t ext = ((M1[b - 2] > kNeg / 2) & (m1 == M1[b - 2]))
                              ? 0x08 : 0;
            ext |= ((M2[b - 2] > kNeg / 2) & (m2 == M2[b - 2]))
                       ? 0x10 : 0;
            int32_t h = PRE[b];
            h = (e1 > h) ? e1 : h;
            h = (e2 > h) ? e2 : h;
            h = ((j32 >= 0) & (j32 <= Slim)) ? h : kNeg;
            int32_t src = (h == D[b]) ? 0
                        : (h == e1) ? 1
                        : (h == e2) ? 2
                        : (h == F1[b]) ? 3 : 4;
            dr[b] = (uint8_t)(dr[b] | ext | src);
            H[b] = h;
        }
        if (free_end) {
            for (int64_t b = 1; b < W; ++b) {
                if (H[b] > best) {
                    best = H[b]; best_i = i; best_b = b;
                }
            }
        }
    }

    int64_t end_i, end_b;
    int32_t score;
    if (free_end) {
        end_i = best_i;
        end_b = best_b;
        score = best;
    } else {
        end_i = Q;
        int64_t gq = mode_diag ? (Q - W2) : 0;
        end_b = S - gq;
        score = (end_b >= 0 && end_b < W) ? H[end_b] : kNeg;
    }
    *out_score = score;
    *out_end_i = end_i;
    *out_end_b = end_b;
    *out_ok = (end_b >= 0 && end_b < W && score > kNeg / 2) ? 1 : 0;

    delete[] buf;
    delete[] D; delete[] PRE;
    delete[] M1; delete[] M2;
    delete[] spad;
}

// Alignment traceback over direction bytes (see ops/align_jax.py
// traceback_batch — identical semantics, per-lane sequential).
// dirs: (B, R, W) uint8 with R = Qmax+1 (lane-major).
// mode_diag: 1 for diag guide g(i)=i-W/2, 0 for full (g=0).
// Returns per lane: ops written FORWARD into ops[b*T .. b*T+nops),
// nops, reached flag.
// lane/row/band element strides make all dirs layouts addressable:
// lane-major (B, R, W): (R*W, W, 1);
// row-major  (R, B, W): (W, B*W, 1);
// band-major (R, W, B): (1, W*B, B)  — the Pallas fill's layout.
void traceback_batch(
    int64_t B,
    int64_t R,
    int64_t W,
    const uint8_t* dirs,
    int64_t lane_stride,
    int64_t row_stride,
    int64_t band_stride,
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
        const uint8_t* dl = dirs + lane * lane_stride;
        bool good = false;
        while (n < T) {
            int64_t g = mode_diag ? (i - W2) : 0;
            if (i <= 0 && g + b <= 0) { good = true; break; }
            if (i < 0 || b < 0 || b >= W) break;
            uint8_t byte =
                dl[(i < 0 ? 0 : (i > Qmax ? Qmax : i)) * row_stride
                   + b * band_stride];
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


// Chain extraction over precomputed (f, p, v) DP arrays (the host half
// of the batched device chain DP, ops/chain_jax.py): find chain ends
// (seeds that are nobody's best predecessor with peak score >=
// min_score), resolve each end to its peak seed via v, claim paths
// greedily best-score-first over unused seeds, filter by min_cnt /
// min_score.  Mirrors `chaining_find_candidates` (algo/chain_dp.c:
// 273-395) = lesv_tpu.ops.chain.extract_chains_np.
//
// Outputs: paths (flattened ascending seed indices, capacity n),
// bounds[c] .. bounds[c+1] delimit chain c, scores[c], n_chains.
void chain_extract(
    int64_t n,
    const int64_t* f,
    const int64_t* p,
    const int64_t* v,
    int64_t min_score,
    int64_t min_cnt,
    int64_t max_chains,
    int64_t* paths,       // out, capacity n
    int64_t* bounds,      // out, capacity max_chains + 1
    int64_t* scores,      // out, capacity max_chains
    int64_t* n_chains)    // out
{
    *n_chains = 0;
    bounds[0] = 0;
    if (n == 0) return;
    std::vector<uint8_t> has_succ(n, 0);
    for (int64_t i = 0; i < n; ++i)
        if (p[i] >= 0) has_succ[p[i]] = 1;
    // peaks: (score, peak index), from ends
    std::vector<std::pair<int64_t, int64_t>> peaks;
    for (int64_t i = 0; i < n; ++i) {
        if (has_succ[i] || v[i] < min_score) continue;
        int64_t j = i;
        while (j >= 0 && f[j] < v[j]) j = p[j];
        if (j < 0) j = i;
        peaks.emplace_back(-f[j], j);   // sort by (-score, index)
    }
    std::sort(peaks.begin(), peaks.end());
    std::vector<uint8_t> used(n, 0);
    int64_t np_out = 0;
    int64_t nc = 0;
    std::vector<int64_t> path;
    for (auto& pk : peaks) {
        if (nc >= max_chains) break;
        int64_t end = pk.second;
        if (used[end]) continue;
        path.clear();
        int64_t j = end;
        while (j >= 0 && !used[j]) {
            path.push_back(j);
            used[j] = 1;
            j = p[j];
        }
        int64_t score = -pk.first;
        if (j >= 0) {
            if (score - f[j] >= min_score) score -= f[j];
            else continue;
        }
        if ((int64_t)path.size() < min_cnt) continue;
        bounds[nc] = np_out;
        scores[nc] = score;
        for (auto it = path.rbegin(); it != path.rend(); ++it)
            paths[np_out++] = *it;
        ++nc;
        bounds[nc] = np_out;
    }
    *n_chains = nc;
}

// fccns consensus traceback: walk best_pred from the argmax column,
// collecting non-gap bases (ops/consensus.py consensus_from_tags's
// python while-loop — ~8k python iterations per template otherwise).
// Returns the walk length; bases come out REVERSED (caller flips).
int64_t fccns_walk(
    int64_t start_col,
    const int64_t* best_pred,
    const int32_t* col_base,    // col_tdb[:, 2]
    const int32_t* col_tpos,    // col_tdb[:, 0]
    int64_t n_cols,
    int64_t gap_code,
    uint8_t* out_rev,           // caller-sized to n_cols
    int64_t* cns_from)          // out: t_pos of the last visited column
{
    int64_t m = 0;
    int64_t cur = start_col;
    int64_t from = 0;
    while (cur >= 0 && cur < n_cols) {
        int32_t b = col_base[cur];
        from = col_tpos[cur];
        if (b != gap_code) out_rev[m++] = (uint8_t)b;
        cur = best_pred[cur];
    }
    *cns_from = from;
    return m;
}

// Batched host alignment: per pair, banded_fill + traceback with the
// band-widening retry loop folded in.  One ctypes call per block — the
// per-call python/ctypes overhead (~0.3 ms) dominated the actual fill
// (~10 us) for the tens of thousands of small inter-anchor segments a
// consensus wave produces.
void banded_align_batch_host(
    int64_t n,
    const uint8_t* qbuf, const int64_t* qoffs, const int64_t* qlens,
    const uint8_t* sbuf, const int64_t* soffs, const int64_t* slens,
    const int64_t* W0, const uint8_t* free_end,
    int64_t match, int64_t mismatch,
    int64_t go1, int64_t ge1, int64_t go2, int64_t ge2,
    uint8_t* ops_out, const int64_t* ops_off,
    int64_t* nops_out, int32_t* score_out,
    int64_t* qe_out, int64_t* se_out, uint8_t* ok_out)
{
    std::vector<uint8_t> dirs;
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* q = qbuf + qoffs[i];
        const uint8_t* s = sbuf + soffs[i];
        const int64_t Q = qlens[i], S = slens[i];
        ok_out[i] = 0;
        nops_out[i] = 0;
        if (Q <= 0 || S <= 0) continue;
        int64_t W = W0[i];
        const int64_t fe = free_end[i] ? 1 : 0;
        for (;;) {
            const int64_t mode_diag = (W < S + 1) ? 1 : 0;
            if ((int64_t)dirs.size() < (Q + 1) * W)
                dirs.resize((Q + 1) * W);
            int32_t score;
            int64_t ei, eb;
            uint8_t okf;
            banded_fill(Q, S, q, s, W, mode_diag, match, mismatch,
                        go1, ge1, go2, ge2, fe,
                        dirs.data(), &score, &ei, &eb, &okf);
            bool got = false;
            if (okf) {
                const int64_t W2 = mode_diag ? W / 2 : 0;
                const int64_t g = mode_diag ? ei - W2 : 0;
                int64_t T = ei + std::max<int64_t>(g + eb, 0) + 2;
                const int64_t cap = ops_off[i + 1] - ops_off[i];
                if (T > cap) T = cap;
                uint8_t* ops = ops_out + ops_off[i];
                int64_t nops;
                uint8_t reached;
                traceback_batch(1, Q + 1, W, dirs.data(), (Q + 1) * W,
                                W, 1, &ei, &eb, &okf, mode_diag, T,
                                ops, &nops, &reached);
                if (reached) {
                    nops_out[i] = nops;
                    score_out[i] = score;
                    qe_out[i] = fe ? ei : Q;
                    se_out[i] = fe ? g + eb : S;
                    ok_out[i] = 1;
                    got = true;
                }
            }
            if (got) break;
            if (!(W < S + 1)) break;
            W = std::min(W * 2, S + 1);
        }
    }
}

// Reconstruct the chain-DP running-peak array v from (f, p_rel) — the
// scan kernel's carry (chain_jax._chain_scan_kernel: v_i =
// max(v[pred], f_i) when a predecessor is taken, else f_i).  Fetching v
// from the device costs 4 bytes/slot over the tunnel; this one pass
// rebuilds it from what is already fetched.
// f: (B, n) int32, p_rel: (B, n) int16 (0 = no predecessor, else the
// predecessor is p_rel slots back), v out: (B, n) int32.
void chain_v_batch(
    int64_t B,
    int64_t n,
    const int32_t* f,
    const int16_t* p_rel,
    int32_t* v)
{
    for (int64_t b = 0; b < B; ++b) {
        const int32_t* fb = f + b * n;
        const int16_t* pb = p_rel + b * n;
        int32_t* vb = v + b * n;
        for (int64_t i = 0; i < n; ++i) {
            int64_t pr = pb[i];
            if (pr > 0 && pr <= i) {
                int32_t vp = vb[i - pr];
                vb[i] = vp > fb[i] ? vp : fb[i];
            } else {
                vb[i] = fb[i];
            }
        }
    }
}

}  // extern "C"

// Anchored-core stitching: sanitize runs -> emit M/D/I ops, solve tiny
// inter-anchor gaps inline (full-DP banded_fill + 1-lane traceback),
// record big segments for the caller's batched device sweep.
// Mirrors lesv_tpu.ops.anchored.anchored_align_many's plan/core phase
// (the python loop is host-latency-bound at scale).
extern "C" void stitch_core(
    const uint8_t* q, int64_t lq,
    const uint8_t* s, int64_t ls,
    const int64_t* runs_in, int64_t n_runs,   // (qo, so, len) triples
    int64_t tiny_cap,
    int64_t match, int64_t mismatch,
    int64_t go1, int64_t ge1, int64_t go2, int64_t ge2,
    uint8_t* ops_out, int64_t ops_cap,
    int64_t* nops_out,
    int64_t* score_out,
    int64_t* bounds_out,        // qb, qe, sb, se of the core
    int64_t* bigs_out,          // (qa, qb, sa, sb, ops_pos) per big seg
    int64_t max_big,
    int64_t* n_big_out,
    int64_t* ok_out)
{
    *nops_out = 0; *score_out = 0; *n_big_out = 0; *ok_out = 0;
    if (n_runs <= 0) return;
    // sanitize: clamp to bounds, merge same-diagonal overlaps, drop
    // conflicting overlaps (ops/anchored.sanitize_anchors semantics)
    std::vector<int64_t> rq, rs, rl;
    rq.reserve(n_runs); rs.reserve(n_runs); rl.reserve(n_runs);
    for (int64_t i = 0; i < n_runs; ++i) {
        int64_t qo = runs_in[3 * i], so = runs_in[3 * i + 1];
        int64_t ln = runs_in[3 * i + 2];
        if (ln > lq - qo) ln = lq - qo;
        if (ln > ls - so) ln = ls - so;
        if (ln <= 0) continue;
        if (!rq.empty()) {
            int64_t pq = rq.back(), ps = rs.back(), pl = rl.back();
            if (qo - pq == so - ps) {           // same diagonal
                if (qo <= pq + pl) {            // overlap/adjacent: merge
                    int64_t nl = qo + ln - pq;
                    if (nl > pl) rl.back() = nl;
                    continue;
                }
            }
            if (qo < pq + pl || so < ps + pl) continue;   // conflict: drop
        }
        rq.push_back(qo); rs.push_back(so); rl.push_back(ln);
    }
    int64_t n = (int64_t)rq.size();
    if (n == 0) return;

    int64_t pos = 0, score = 0, nbig = 0;
    bool fail = false;
    auto gapcost = [&](int64_t g) {
        int64_t c1 = go1 + g * ge1, c2 = go2 + g * ge2;
        return c1 < c2 ? c1 : c2;
    };
    // tiny-gap scratch (full-DP banded_align, W = sgap+1)
    const int64_t TC = tiny_cap;
    std::vector<uint8_t> dirs((TC + 1) * (TC + 2));
    std::vector<uint8_t> tops(2 * TC + 4);
    for (int64_t i = 0; i < n && !fail; ++i) {
        if (i > 0) {
            int64_t qgap = rq[i] - (rq[i - 1] + rl[i - 1]);
            int64_t sgap = rs[i] - (rs[i - 1] + rl[i - 1]);
            if (qgap == 0 && sgap == 0) {
            } else if (qgap == 0) {
                if (pos + sgap > ops_cap) { fail = true; break; }
                std::memset(ops_out + pos, 2, sgap);      // OP_D
                pos += sgap;
                score -= gapcost(sgap);
            } else if (sgap == 0) {
                if (pos + qgap > ops_cap) { fail = true; break; }
                std::memset(ops_out + pos, 1, qgap);      // OP_I
                pos += qgap;
                score -= gapcost(qgap);
            } else if (qgap <= TC && sgap <= TC) {
                // tiny segment: full-DP (W = sgap+1) + 1-lane traceback
                const uint8_t* qa = q + rq[i - 1] + rl[i - 1];
                const uint8_t* sa = s + rs[i - 1] + rl[i - 1];
                int64_t W = sgap + 1;
                int32_t sc32; int64_t ei, eb; uint8_t okf;
                banded_fill(qgap, sgap, qa, sa, W, 0,
                            match, mismatch, go1, ge1, go2, ge2, 0,
                            dirs.data(), &sc32, &ei, &eb, &okf);
                if (!okf) { fail = true; break; }
                int64_t T = qgap + sgap + 2;
                int64_t nops; uint8_t reached;
                traceback_batch(1, qgap + 1, W, dirs.data(),
                                (qgap + 1) * W, W, 1, &ei, &eb, &okf,
                                0, T, tops.data(), &nops, &reached);
                if (!reached) { fail = true; break; }
                if (pos + nops > ops_cap) { fail = true; break; }
                std::memcpy(ops_out + pos, tops.data(), nops);
                pos += nops;
                score += sc32;
            } else {
                // big segment: caller aligns + splices at ops_pos
                if (nbig >= max_big) { fail = true; break; }
                bigs_out[5 * nbig]     = rq[i - 1] + rl[i - 1];
                bigs_out[5 * nbig + 1] = rq[i];
                bigs_out[5 * nbig + 2] = rs[i - 1] + rl[i - 1];
                bigs_out[5 * nbig + 3] = rs[i];
                bigs_out[5 * nbig + 4] = pos;
                ++nbig;
            }
        }
        if (pos + rl[i] > ops_cap) { fail = true; break; }
        std::memset(ops_out + pos, 0, rl[i]);             // OP_M
        pos += rl[i];
        score += rl[i] * match;
    }
    if (fail) { *ok_out = 0; return; }
    *nops_out = pos;
    *score_out = score;
    bounds_out[0] = rq[0];
    bounds_out[1] = rq[n - 1] + rl[n - 1];
    bounds_out[2] = rs[0];
    bounds_out[3] = rs[n - 1] + rl[n - 1];
    *n_big_out = nbig;
    *ok_out = 1;
}
