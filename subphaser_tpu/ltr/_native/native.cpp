// subphaser_tpu native host library.
//
// TPU-native role split (see SURVEY §2.3): the data-parallel scanning that
// the reference delegates to external C binaries runs on device (seed
// matching via the k-mer kernels); the irregular sequential refinement that
// resists vectorization lives here:
//   - sp_refine_ltr: LTRharvest-style candidate refinement (seed clustering,
//     X-drop extension, banded-identity, TSD search) — replaces
//     `gt suffixerator + ltrharvest` (reference LTR.py:35-36)
//   - sp_chain_anchors: minimap2-style colinear anchor chaining — replaces
//     the minimap2 alignment step feeding homoeologous blocks
//     (reference Blocks.py:42-43)
//   - sp_nj_tree: neighbor-joining phylogeny — replaces FastTree for the
//     subgenome-specific LTR trees (reference LTR.py:145-147)
//
// Plain C ABI for ctypes. Sequences are 2-bit codes in uint8 (0..3), 4 = N.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VL__)
#include <immintrin.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// banded global identity between two sequences (a of length la, b of lb).
// Returns identity in [0,1] = matches / alignment_columns.
// ---------------------------------------------------------------------------
static double banded_identity(const uint8_t* a, int la, const uint8_t* b,
                              int lb, int band) {
  if (la <= 0 || lb <= 0) return 0.0;
  band = std::max(band, std::abs(la - lb) + 2);
  const int W = 2 * band + 1;
  const int NEG = -1000000000;
  // DP over (i, j) with |i - j| <= band; store matches and length per cell
  std::vector<int> score(W, NEG), matches(W, 0), cols(W, 0);
  std::vector<int> nscore(W), nmatch(W), ncols(W);
  // j = i + (w - band)
  score[band] = 0;  // (0,0)
  for (int w = band + 1; w < W; ++w) {  // first row: gaps in b
    int j = w - band;
    if (j > lb) break;
    score[w] = -4 * j;  // boundary gaps cost the same as interior gaps
    cols[w] = j;
  }
  for (int i = 1; i <= la; ++i) {
    std::fill(nscore.begin(), nscore.end(), NEG);
    for (int w = 0; w < W; ++w) {
      int j = i + (w - band);
      if (j < 0 || j > lb) continue;
      int best = NEG, bm = 0, bc = 0;
      if (j == 0) {
        best = -4 * i; bm = 0; bc = i;  // boundary gap, same penalty as interior
      } else {
        // diagonal (i-1, j-1) -> same w
        if (score[w] > NEG) {
          bool m = a[i - 1] == b[j - 1] && a[i - 1] < 4;
          int s = score[w] + (m ? 2 : -3);
          if (s > best) { best = s; bm = matches[w] + (m ? 1 : 0); bc = cols[w] + 1; }
        }
        // up (i-1, j) -> w+1 in previous row
        if (w + 1 < W && score[w + 1] > NEG) {
          int s = score[w + 1] - 4;
          if (s > best) { best = s; bm = matches[w + 1]; bc = cols[w + 1] + 1; }
        }
        // left (i, j-1) -> w-1 in current row
        if (w - 1 >= 0 && nscore[w - 1] > NEG) {
          int s = nscore[w - 1] - 4;
          if (s > best) { best = s; bm = nmatch[w - 1]; bc = ncols[w - 1] + 1; }
        }
      }
      nscore[w] = best; nmatch[w] = bm; ncols[w] = bc;
    }
    score.swap(nscore); matches.swap(nmatch); cols.swap(ncols);
  }
  int w = lb - la + band;
  if (w < 0 || w >= W || score[w] <= NEG) return 0.0;
  return cols[w] > 0 ? (double)matches[w] / (double)cols[w] : 0.0;
}

double sp_banded_identity(const uint8_t* a, int la, const uint8_t* b, int lb,
                          int band) {
  return banded_identity(a, la, b, lb, band);
}

// ---------------------------------------------------------------------------
// LTR candidate refinement.
// ---------------------------------------------------------------------------
struct LtrParams {
  int k;            // seed length
  int minlenltr;    // 100
  int maxlenltr;    // 7000
  int mindistltr;   // 1000  (distance between LTR starts)
  int maxdistltr;   // 15000
  double similar;   // 80.0 (percent)
  int mintsd;       // 4
  int maxtsd;       // 6 (0 = no TSD requirement)
  int vic;          // 10
  int xdrop;        // 5 (score units)
  int band;         // diagonal clustering tolerance (e.g. 50)
  int max_gap;      // seed chaining gap along i (e.g. 1000)
};

struct LtrOut {
  int32_t start;      // element start (0-based, inclusive)
  int32_t end;        // element end (0-based, exclusive)
  int32_t lltr_len;
  int32_t rltr_len;
  double similarity;  // percent
  int32_t tsd_len;
};

struct Seed { int32_t i, j; };

// greedy ungapped X-drop extension; returns extension length
static int extend_ungapped(const uint8_t* seq, int n, int i, int j, int dir,
                           int xdrop) {
  // dir = +1 extends to the right starting AT (i, j); -1 extends left
  // starting AT (i, j) inclusive.
  int best = 0, best_len = 0, score = 0, len = 0;
  while (true) {
    int pi = i + dir * len;
    int pj = j + dir * len;
    if (pi < 0 || pj < 0 || pi >= n || pj >= n) break;
    uint8_t a = seq[pi], b = seq[pj];
    if (a >= 4 || b >= 4) break;
    score += (a == b) ? 2 : -3;
    ++len;
    if (score > best) { best = score; best_len = len; }
    if (best - score > xdrop * 2) break;
  }
  return best_len;
}

int sp_refine_ltr(const uint8_t* seq, int64_t n, const int32_t* seed_i,
                  const int32_t* seed_j, int64_t n_seeds,
                  const LtrParams* prm, LtrOut* out, int64_t out_cap) {
  std::vector<Seed> seeds(n_seeds);
  for (int64_t s = 0; s < n_seeds; ++s) seeds[s] = {seed_i[s], seed_j[s]};
  std::sort(seeds.begin(), seeds.end(), [](const Seed& a, const Seed& b) {
    int64_t da = (int64_t)a.j - a.i, db = (int64_t)b.j - b.i;
    if (da != db) return da < db;
    return a.i < b.i;
  });

  int64_t n_out = 0;
  size_t s = 0;
  std::vector<LtrOut> cands;
  while (s < seeds.size()) {
    // cluster seeds with similar diagonal and nearby i
    size_t e = s + 1;
    int64_t d0 = (int64_t)seeds[s].j - seeds[s].i;
    int32_t imin = seeds[s].i, imax = seeds[s].i;
    int32_t jmin = seeds[s].j, jmax = seeds[s].j;
    while (e < seeds.size()) {
      int64_t d = (int64_t)seeds[e].j - seeds[e].i;
      if (d - d0 > prm->band) break;
      if (seeds[e].i > imax + prm->max_gap) break;
      imin = std::min(imin, seeds[e].i); imax = std::max(imax, seeds[e].i);
      jmin = std::min(jmin, seeds[e].j); jmax = std::max(jmax, seeds[e].j);
      ++e;
    }
    s = e;

    // candidate LTR pair spans from the seed cluster
    int ls = imin, le = imax + prm->k;  // [ls, le)
    int rs = jmin, re = jmax + prm->k;
    // extend outward with X-drop
    int left = extend_ungapped(seq, (int)n, ls - 1, rs - 1, -1, prm->xdrop);
    int right = extend_ungapped(seq, (int)n, le, re, +1, prm->xdrop);
    ls -= left; rs -= left; le += right; re += right;
    int lltr = le - ls, rltr = re - rs;
    if (lltr < prm->minlenltr || lltr > prm->maxlenltr) continue;
    if (rltr < prm->minlenltr || rltr > prm->maxlenltr) continue;
    int64_t dist = rs - ls;
    if (dist < prm->mindistltr || dist > prm->maxdistltr) continue;
    if (rs < le) continue;  // LTRs must not overlap each other
    // identity
    int band = (int)((jmax - jmin) - (imax - imin));
    band = std::abs(band) + 20;
    double ident = banded_identity(seq + ls, lltr, seq + rs, rltr, band);
    double sim = 100.0 * ident;
    if (sim < prm->similar) continue;

    // TSD search around [ls, re)
    int tsd = 0, best_shift = 1 << 30, bls = ls, bre = re;
    if (prm->maxtsd > 0) {
      for (int t = prm->maxtsd; t >= prm->mintsd && !tsd; --t) {
        for (int da = -prm->vic; da <= prm->vic; ++da) {
          for (int db = -prm->vic; db <= prm->vic; ++db) {
            int s2 = ls + da, e2 = re + db;
            if (s2 - t < 0 || e2 + t > (int64_t)n) continue;
            bool ok = true;
            for (int x = 0; x < t; ++x) {
              uint8_t a = seq[s2 - t + x], b = seq[e2 + x];
              if (a >= 4 || a != b) { ok = false; break; }
            }
            if (ok && std::abs(da) + std::abs(db) < best_shift) {
              best_shift = std::abs(da) + std::abs(db);
              tsd = t; bls = s2; bre = e2;
            }
          }
        }
      }
      if (!tsd) continue;  // -mintsd set => TSD required (harvest semantics)
      lltr += bls == ls ? 0 : (ls - bls);
      rltr += bre == re ? 0 : (bre - re);
      ls = bls; re = bre;
      if (lltr < prm->minlenltr || rltr < prm->minlenltr) continue;
    }

    LtrOut o;
    o.start = ls; o.end = re; o.lltr_len = lltr; o.rltr_len = rltr;
    o.similarity = std::round(sim * 100.0) / 100.0; o.tsd_len = tsd;
    cands.push_back(o);
  }

  // dedupe: same/heavily-overlapping candidates keep the highest similarity
  std::sort(cands.begin(), cands.end(), [](const LtrOut& a, const LtrOut& b) {
    if (a.start != b.start) return a.start < b.start;
    return a.similarity > b.similarity;
  });
  std::vector<LtrOut> kept;
  for (const auto& c : cands) {
    bool dup = false;
    for (auto it = kept.rbegin(); it != kept.rend(); ++it) {
      if (it->end <= c.start) break;
      int64_t ovl = std::min((int64_t)it->end, (int64_t)c.end) -
                    std::max((int64_t)it->start, (int64_t)c.start);
      int64_t mlen = std::min(it->end - it->start, c.end - c.start);
      if (ovl * 100 >= mlen * 90) { dup = true; break; }
    }
    if (!dup) kept.push_back(c);
  }
  for (const auto& c : kept) {
    if (n_out >= out_cap) break;
    out[n_out++] = c;
  }
  return (int)n_out;
}

// ---------------------------------------------------------------------------
// ltr_finder-style structural refinement (second detector).
//
// Distinct paradigm from sp_refine_ltr: candidates arrive as COLINEAR SEED
// CHAINS (sp_chain_anchors over direct-repeat seed pairs — tolerates
// accumulated indel drift between the two LTR copies, which the
// diagonal-cluster detector splits), and acceptance is gated on a composite
// STRUCTURAL score, the signals ltr_finder reports per record (reference
// LTR.py:715-725 parses TSR/PBS/PPT/strand/score columns):
//   - TG..CA terminal dinucleotides on both LTRs (boundary-adjusted)
//   - target-site duplication (TSD), optional (scored, not required)
//   - PBS: primer-binding site complementary to the tRNA-iMet 3' end
//     (canonical plant/animal PBS motif TGGTATCAGAGC) just inside the
//     element after the left LTR
//   - PPT: polypurine tract (>=12 purines in a 15 bp window) immediately
//     before the right LTR
// Strand is inferred from the orientation the PBS/PPT signals are found in.
// ---------------------------------------------------------------------------
struct FinderOut {
  int32_t start;      // element start (0-based, inclusive)
  int32_t end;        // element end (0-based, exclusive)
  int32_t lltr_len;
  int32_t rltr_len;
  double similarity;  // percent
  int32_t tsd_len;
  int32_t score;      // structural signals found (0..4)
  int32_t flags;      // bit0 TG..CA, bit1 TSD, bit2 PBS, bit3 PPT
  int32_t strand;     // +1 / -1 / 0 (undetermined)
};

// nearest offset d (|d| <= vic) with the dinucleotide (b0,b1) at pos+d;
// INT32_MIN when absent. pos indexes the FIRST base of the dinucleotide.
static int find_dinuc(const uint8_t* seq, int64_t n, int64_t pos, int vic,
                      uint8_t b0, uint8_t b1) {
  for (int a = 0; a <= vic; ++a) {
    for (int sgn = 0; sgn < 2; ++sgn) {
      int d = sgn ? -a : a;
      if (sgn && a == 0) continue;
      int64_t p = pos + d;
      if (p < 0 || p + 1 >= n) continue;
      if (seq[p] == b0 && seq[p + 1] == b1) return d;
    }
  }
  return INT32_MIN;
}

// best (#matching bases) placement of motif[0..mlen) inside seq[w0, w1)
static int motif_best_matches(const uint8_t* seq, int64_t n, int64_t w0,
                              int64_t w1, const uint8_t* motif, int mlen) {
  int best = 0;
  if (w0 < 0) w0 = 0;
  if (w1 > n) w1 = n;
  for (int64_t s = w0; s + mlen <= w1; ++s) {
    int m = 0;
    for (int x = 0; x < mlen; ++x)
      if (seq[s + x] == motif[x]) ++m;
    if (m > best) best = m;
  }
  return best;
}

// max purine (A=0/G=2) count over 15 bp windows in seq[w0, w1);
// pyr != 0 counts pyrimidines (C=1/T=3) instead (minus-strand PPT)
static int tract_best(const uint8_t* seq, int64_t n, int64_t w0, int64_t w1,
                      int pyr) {
  if (w0 < 0) w0 = 0;
  if (w1 > n) w1 = n;
  const int W = 15;
  int best = 0, cur = 0;
  for (int64_t p = w0; p < w1; ++p) {
    uint8_t b = seq[p];
    int hit = pyr ? (b == 1 || b == 3) : (b == 0 || b == 2);
    cur += hit;
    if (p - w0 >= W) {
      uint8_t o = seq[p - W];
      cur -= pyr ? (o == 1 || o == 3) : (o == 0 || o == 2);
    }
    if (cur > best) best = cur;
  }
  return best;
}

int sp_finder_ltr(const uint8_t* seq, int64_t n, const int64_t* ls_arr,
                  const int64_t* le_arr, const int64_t* rs_arr,
                  const int64_t* re_arr, int64_t n_cand,
                  const LtrParams* prm, int32_t min_score, FinderOut* out,
                  int64_t out_cap) {
  // PBS motif: complement of the tRNA-iMet 3' acceptor end, the primer of
  // most plant/animal LTR retrotransposons (TGGTATCAGAGC)
  static const uint8_t PBS[12] = {3, 2, 2, 3, 0, 3, 1, 0, 2, 0, 2, 1};
  // reverse complement of PBS for minus-strand elements (GCTCTGATACCA)
  static const uint8_t PBS_RC[12] = {2, 1, 3, 1, 3, 2, 0, 3, 0, 1, 1, 0};
  const int PBS_WIN = 30, PBS_MIN = 10, PPT_WIN = 50, PPT_MIN = 12;

  std::vector<FinderOut> cands;
  for (int64_t c = 0; c < n_cand; ++c) {
    int64_t ls = ls_arr[c], le = le_arr[c];
    int64_t rs = rs_arr[c], re = re_arr[c];
    if (ls < 0 || re > n || le <= ls || re <= rs) continue;
    // X-drop extension outward from the chained core
    int left = extend_ungapped(seq, (int)n, (int)ls - 1, (int)rs - 1, -1,
                               prm->xdrop);
    int right = extend_ungapped(seq, (int)n, (int)le, (int)re, +1, prm->xdrop);
    ls -= left; rs -= left; le += right; re += right;

    int flags = 0;
    // TG..CA terminal adjustment: both LTR copies start with TG, end with CA
    int d_ls = find_dinuc(seq, n, ls, prm->vic, 3, 2);
    int d_rs = find_dinuc(seq, n, rs, prm->vic, 3, 2);
    int d_le = find_dinuc(seq, n, le - 2, prm->vic, 1, 0);
    int d_re = find_dinuc(seq, n, re - 2, prm->vic, 1, 0);
    if (d_ls != INT32_MIN) ls += d_ls;
    if (d_rs != INT32_MIN) rs += d_rs;
    if (d_le != INT32_MIN) le += d_le;
    if (d_re != INT32_MIN) re += d_re;
    if (d_ls != INT32_MIN && d_rs != INT32_MIN && d_le != INT32_MIN &&
        d_re != INT32_MIN)
      flags |= 1;

    int64_t lltr = le - ls, rltr = re - rs;
    if (lltr < prm->minlenltr || lltr > prm->maxlenltr) continue;
    if (rltr < prm->minlenltr || rltr > prm->maxlenltr) continue;
    int64_t dist = rs - ls;
    if (dist < prm->mindistltr || dist > prm->maxdistltr) continue;
    if (rs < le) continue;  // the two LTRs must not overlap

    int band = (int)std::llabs(rltr - lltr) + 20;
    double sim =
        100.0 * banded_identity(seq + ls, (int)lltr, seq + rs, (int)rltr, band);
    if (sim < prm->similar) continue;

    // TSD (optional here — a scored signal, unlike harvest semantics)
    int tsd = 0;
    if (prm->maxtsd > 0) {
      for (int t = prm->maxtsd; t >= prm->mintsd && !tsd; --t) {
        if (ls - t < 0 || re + t > n) continue;
        bool ok = true;
        for (int x = 0; x < t; ++x) {
          uint8_t a = seq[ls - t + x], b = seq[re + x];
          if (a >= 4 || a != b) { ok = false; break; }
        }
        if (ok) tsd = t;
      }
      if (tsd) flags |= 2;
    }

    // PBS / PPT in both orientations -> strand
    int pbs_p = motif_best_matches(seq, n, le, le + PBS_WIN, PBS, 12) >= PBS_MIN;
    int pbs_m =
        motif_best_matches(seq, n, rs - PBS_WIN, rs, PBS_RC, 12) >= PBS_MIN;
    int ppt_p = tract_best(seq, n, rs - PPT_WIN, rs, 0) >= PPT_MIN;
    int ppt_m = tract_best(seq, n, le, le + PPT_WIN, 1) >= PPT_MIN;
    int splus = pbs_p + ppt_p, sminus = pbs_m + ppt_m;
    int strand = splus > sminus ? 1 : (sminus > splus ? -1 : 0);
    int pbs = strand >= 0 ? pbs_p : pbs_m;
    int ppt = strand >= 0 ? ppt_p : ppt_m;
    if (pbs) flags |= 4;
    if (ppt) flags |= 8;

    int score = ((flags & 1) != 0) + ((flags & 2) != 0) + pbs + ppt;
    if (score < min_score) continue;

    FinderOut o;
    o.start = (int32_t)ls; o.end = (int32_t)re;
    o.lltr_len = (int32_t)lltr; o.rltr_len = (int32_t)rltr;
    o.similarity = std::round(sim * 100.0) / 100.0;
    o.tsd_len = tsd; o.score = score; o.flags = flags; o.strand = strand;
    cands.push_back(o);
  }

  // dedupe heavily-overlapping candidates: keep highest score, then similarity
  std::sort(cands.begin(), cands.end(), [](const FinderOut& a,
                                           const FinderOut& b) {
    if (a.start != b.start) return a.start < b.start;
    if (a.score != b.score) return a.score > b.score;
    return a.similarity > b.similarity;
  });
  std::vector<FinderOut> kept;
  for (const auto& c : cands) {
    bool dup = false;
    for (auto it = kept.rbegin(); it != kept.rend(); ++it) {
      if (it->end <= c.start) break;
      int64_t ovl = std::min((int64_t)it->end, (int64_t)c.end) -
                    std::max((int64_t)it->start, (int64_t)c.start);
      int64_t mlen = std::min(it->end - it->start, c.end - c.start);
      if (ovl * 100 >= mlen * 90) { dup = true; break; }
    }
    if (!dup) kept.push_back(c);
  }
  int64_t n_out = 0;
  for (const auto& c : kept) {
    if (n_out >= out_cap) break;
    out[n_out++] = c;
  }
  return (int)n_out;
}

// ---------------------------------------------------------------------------
// colinear anchor chaining (minimap2-flavored DP) for homoeologous blocks.
// Anchors: (qpos, tpos, len) sorted by qpos. Returns chain segments as
// (q_start, q_end, t_start, t_end, n_anchors, score) sextuples.
// ---------------------------------------------------------------------------
struct ChainOut {
  int64_t q_start, q_end, t_start, t_end;
  int32_t n_anchors;
  int32_t strand;  // +1 / -1
  double score;
};

int sp_chain_anchors(const int64_t* qpos, const int64_t* tpos,
                     const int32_t* alen, int64_t n_anchors, int32_t strand,
                     int64_t max_gap, int64_t min_chain_len,
                     int32_t min_chain_anchors, ChainOut* out,
                     int64_t out_cap) {
  if (n_anchors == 0) return 0;
  std::vector<int64_t> order(n_anchors);
  for (int64_t i = 0; i < n_anchors; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    if (qpos[a] != qpos[b]) return qpos[a] < qpos[b];
    return tpos[a] < tpos[b];
  });
  std::vector<double> dp(n_anchors);
  std::vector<int64_t> prev(n_anchors, -1);
  const int64_t LOOKBACK = 64;
  for (int64_t oi = 0; oi < n_anchors; ++oi) {
    int64_t i = order[oi];
    dp[i] = alen[i];
    for (int64_t oj = std::max((int64_t)0, oi - LOOKBACK); oj < oi; ++oj) {
      int64_t j = order[oj];
      int64_t dq = qpos[i] - qpos[j];
      int64_t dt = tpos[i] - tpos[j];
      if (dq <= 0 || dt <= 0) continue;
      if (dq > max_gap || dt > max_gap) continue;
      int64_t gap = std::llabs(dq - dt);
      double sc = dp[j] + std::min((int64_t)alen[i], std::min(dq, dt)) -
                  (gap > 0 ? 0.01 * gap + 0.5 * std::log2((double)gap + 1) : 0.0);
      if (sc > dp[i]) { dp[i] = sc; prev[i] = j; }
    }
  }
  // backtrack best chains greedily (highest score first, unused anchors)
  std::vector<int64_t> by_score(n_anchors);
  for (int64_t i = 0; i < n_anchors; ++i) by_score[i] = i;
  std::sort(by_score.begin(), by_score.end(),
            [&](int64_t a, int64_t b) { return dp[a] > dp[b]; });
  std::vector<char> used(n_anchors, 0);
  int64_t n_out = 0;
  for (int64_t idx : by_score) {
    if (used[idx] || n_out >= out_cap) continue;
    // walk chain
    int64_t tail = idx, head = idx, cnt = 0;
    bool clash = false;
    for (int64_t cur = idx; cur != -1; cur = prev[cur]) {
      if (used[cur]) { clash = true; break; }
      head = cur; ++cnt;
    }
    if (clash) continue;
    int64_t q0 = qpos[head], t0 = tpos[head];
    int64_t q1 = qpos[tail] + alen[tail], t1 = tpos[tail] + alen[tail];
    for (int64_t cur = idx; cur != -1; cur = prev[cur]) used[cur] = 1;
    if (cnt < min_chain_anchors) continue;
    if (q1 - q0 < min_chain_len) continue;
    ChainOut o;
    o.q_start = q0; o.q_end = q1; o.t_start = t0; o.t_end = t1;
    o.n_anchors = (int32_t)cnt; o.strand = strand; o.score = dp[idx];
    out[n_out++] = o;
  }
  return (int)n_out;
}

// ---------------------------------------------------------------------------
// neighbor-joining tree from a condensed distance matrix.
// Writes newick into out (cap bytes). Names are provided as a single
// NUL-separated blob.
// ---------------------------------------------------------------------------
int sp_nj_tree(const double* dist, int32_t n, const char* names_blob,
               char* out, int64_t cap) {
  if (n <= 0) return -1;
  std::vector<const char*> names(n);
  {
    const char* p = names_blob;
    for (int i = 0; i < n; ++i) { names[i] = p; p += strlen(p) + 1; }
  }
  std::vector<std::vector<double>> d(n, std::vector<double>(n));
  for (int i = 0; i < n; ++i)
    for (int j = 0; j < n; ++j) d[i][j] = dist[(int64_t)i * n + j];
  std::vector<std::string> node(n);
  for (int i = 0; i < n; ++i) node[i] = names[i];
  std::vector<int> active(n);
  for (int i = 0; i < n; ++i) active[i] = 1;
  int m = n;
  auto fmt = [](double x) {
    char b[32];
    snprintf(b, sizeof b, "%.6f", std::max(x, 0.0));
    return std::string(b);
  };
  while (m > 2) {
    std::vector<double> r(n, 0.0);
    for (int i = 0; i < n; ++i)
      if (active[i])
        for (int j = 0; j < n; ++j)
          if (active[j] && j != i) r[i] += d[i][j];
    double best = 1e300; int bi = -1, bj = -1;
    for (int i = 0; i < n; ++i) {
      if (!active[i]) continue;
      for (int j = i + 1; j < n; ++j) {
        if (!active[j]) continue;
        double q = (m - 2) * d[i][j] - r[i] - r[j];
        if (q < best) { best = q; bi = i; bj = j; }
      }
    }
    double li = 0.5 * d[bi][bj] + (r[bi] - r[bj]) / (2.0 * (m - 2));
    double lj = d[bi][bj] - li;
    std::string merged = "(" + node[bi] + ":" + fmt(li) + "," + node[bj] + ":" +
                         fmt(lj) + ")";
    for (int x = 0; x < n; ++x) {
      if (!active[x] || x == bi || x == bj) continue;
      d[bi][x] = d[x][bi] = 0.5 * (d[bi][x] + d[bj][x] - d[bi][bj]);
    }
    node[bi] = merged;
    active[bj] = 0;
    --m;
  }
  int a = -1, b = -1;
  for (int i = 0; i < n; ++i)
    if (active[i]) { if (a < 0) a = i; else b = i; }
  std::string tree;
  if (b < 0) tree = node[a] + ";";
  else tree = "(" + node[a] + ":" + fmt(d[a][b] / 2) + "," + node[b] + ":" +
              fmt(d[a][b] / 2) + ");";
  if ((int64_t)tree.size() + 1 > cap) return -2;
  memcpy(out, tree.c_str(), tree.size() + 1);
  return (int)tree.size();
}


// ---------------------------------------------------------------------------
// banded global AFFINE-gap alignment emitting CIGAR-style runs for PAF cs
// strings (role of minimap2 --cs, consumed by the reference's CsBlocks
// parser, Paf.py:171-262). a = query codes, b = target codes (0-3; 4 = N).
// match +2, mismatch -4, gap open -4, gap extend -2 (affine keeps indels in
// single runs like minimap2's output).
// ops_out holds (op, len) int32 pairs: 0 = diagonal (M; the caller splits
// into ':' runs and '*' SNPs by comparing bases), 1 = query-only
// (cs '+', insertion), 2 = target-only (cs '-', deletion).
// Returns the number of pairs, or -1 when max_ops is too small.
// ---------------------------------------------------------------------------
struct AlignScratch {
  std::vector<int> M, I, D, nM, nI, nD;
  std::vector<uint8_t> trace;
};

static int banded_align_ops_core(const uint8_t* a, int la, const uint8_t* b,
                                 int lb, int band, int32_t* ops_out,
                                 int max_ops, AlignScratch& sc) {
  if (la < 0 || lb < 0) return -1;
  int n = 0;
  if (la == 0 || lb == 0) {
    if (lb > 0) { if (n >= max_ops) return -1; ops_out[2*n] = 2; ops_out[2*n+1] = lb; ++n; }
    if (la > 0) { if (n >= max_ops) return -1; ops_out[2*n] = 1; ops_out[2*n+1] = la; ++n; }
    return n;
  }
  band = std::max(band, std::abs(la - lb) + 2);
  const int W = 2 * band + 1;
  const int NEG = -1000000000;
  const int MATCH = 2, MIS = -4, GO = -4, GE = -2;
  // scratch reused across gaps (one allocation per thread, not per gap)
  sc.M.assign(W, NEG); sc.I.assign(W, NEG); sc.D.assign(W, NEG);
  sc.nM.resize(W); sc.nI.resize(W); sc.nD.resize(W);
  sc.trace.assign((size_t)(la + 1) * W, 0);
  std::vector<int>&M = sc.M, &I = sc.I, &D = sc.D;
  std::vector<int>&nM = sc.nM, &nI = sc.nI, &nD = sc.nD;
  std::vector<uint8_t>& trace = sc.trace;
  // trace bits per cell: [1:0] best-of-three at (i,j) in {0=M,1=I,2=D}
  //                      [2] M came from I, [3] M came from D
  //                      [4] I extends, [5] D extends
  // j = i + (w - band); row 0
  M[band] = 0;
  for (int w = band + 1; w < W; ++w) {
    int j = w - band;
    if (j > lb) break;
    D[w] = GO + GE * (j - 1);
    trace[w] = (uint8_t)(2 | (j > 1 ? 32 : 0));
  }
  for (int i = 1; i <= la; ++i) {
    std::fill(nM.begin(), nM.end(), NEG);
    std::fill(nI.begin(), nI.end(), NEG);
    std::fill(nD.begin(), nD.end(), NEG);
    uint8_t* tr = &trace[(size_t)i * W];
    // valid j range for this row: 0 <= j <= lb  ->  band-i <= w <= lb-i+band
    int wlo = std::max(0, band - i);
    int whi = std::min(W - 1, lb - i + band);
    if (whi < wlo) { M.swap(nM); I.swap(nI); D.swap(nD); continue; }
    if (i <= band && wlo == band - i) {  // j == 0 boundary cell
      nI[wlo] = GO + GE * (i - 1);
      tr[wlo] = (uint8_t)(1 | (i > 1 ? 16 : 0));
      ++wlo;
    }
    const uint8_t ai = a[i - 1];
    const bool a_ok = ai < 4;
    const uint8_t* bj = b + (i - band) - 1;  // b[j-1] at offset w
    // NEG drift is bounded (<= ~6 per row * 65536 rows << INT_MIN-NEG), so
    // the per-cell reachability guards of the original formulation are
    // unnecessary: unreachable cells just carry very-negative scores.
    // The row is computed in four passes so the compiler can vectorize
    // the three w-independent ones (M/I recurrences read only the PREV
    // row); only the D recurrence (nD[w] <- nD[w-1], same row) stays a
    // scalar chain, and it is 4 ops per cell. Bit/tie semantics are
    // identical to the fused formulation (cs text is parity-tested).
    const int* Mp = M.data(); const int* Ip = I.data(); const int* Dp = D.data();
    int* nMp = nM.data(); int* nIp = nI.data(); int* nDp = nD.data();
    // pass 1: nM + previous-state bits (vectorizable)
    for (int w = wlo; w <= whi; ++w) {
      const int Mw = Mp[w], Iw = Ip[w], Dw = Dp[w];
      int pb = Mw > Iw ? Mw : Iw;
      if (Dw > pb) pb = Dw;
      const bool m = a_ok && ai == bj[w];
      nMp[w] = pb + (m ? MATCH : MIS);
      uint8_t bits = 0;
      if (Iw == pb && Iw >= Mw) bits = 4;       // M came from I
      else if (Dw == pb && Dw > Mw) bits = 8;   // M came from D
      tr[w] = bits;
    }
    // pass 2: nI (consume query; from (i-1, j) -> w+1 in prev row)
    {
      const int hi = std::min(whi, W - 2);
      for (int w = wlo; w <= hi; ++w) {
        const int open_ = Mp[w + 1] + GO;
        const int ext = Ip[w + 1] + GE;
        if (ext > open_) { nIp[w] = ext; tr[w] |= 16; }
        else nIp[w] = open_;
      }
    }
    // pass 3: nD (consume target; from (i, j-1) -> w-1 in CURRENT row).
    // nD[w] = max(C[w], nD[w-1] + GE) with C[w] = nM[w-1] + GO is a
    // prefix-max after the shear E[w] = nD[w] - GE*w (E is the running
    // max of X[w] = C[w] - GE*w), so it vectorizes as blockwise in-lane
    // prefix maxes with a scalar carry; bit32 (gap EXTENDS, strict) is
    // exactly E[w] > X[w]. Scalar fallback keeps identical semantics.
    {
      const int lo = std::max(wlo, 1);
      int w = lo;
      int carry = nDp[lo - 1] - GE * (lo - 1);  // E[lo-1]
#if defined(__AVX512F__) && defined(__AVX512BW__) && defined(__AVX512VL__)
      const __m512i lane2 = _mm512_setr_epi32(0, -GE, -2 * GE, -3 * GE,
          -4 * GE, -5 * GE, -6 * GE, -7 * GE, -8 * GE, -9 * GE, -10 * GE,
          -11 * GE, -12 * GE, -13 * GE, -14 * GE, -15 * GE);
      const __m512i vmin = _mm512_set1_epi32(INT32_MIN);
      const __m512i go = _mm512_set1_epi32(GO);
      const __m512i last = _mm512_set1_epi32(15);
      for (; w + 15 <= whi; w += 16) {
        const __m512i shear =
            _mm512_add_epi32(_mm512_set1_epi32(-GE * w), lane2);
        __m512i x = _mm512_add_epi32(
            _mm512_add_epi32(
                _mm512_loadu_si512((const void*)(nMp + w - 1)), go),
            shear);
        const __m512i x0 = x;
        // in-lane prefix max (shift -inf into the low lanes)
        x = _mm512_max_epi32(x, _mm512_alignr_epi32(x, vmin, 15));
        x = _mm512_max_epi32(x, _mm512_alignr_epi32(x, vmin, 14));
        x = _mm512_max_epi32(x, _mm512_alignr_epi32(x, vmin, 12));
        x = _mm512_max_epi32(x, _mm512_alignr_epi32(x, vmin, 8));
        x = _mm512_max_epi32(x, _mm512_set1_epi32(carry));
        _mm512_storeu_si512((void*)(nDp + w), _mm512_sub_epi32(x, shear));
        const __mmask16 ext = _mm512_cmpgt_epi32_mask(x, x0);
        __m128i trv = _mm_loadu_si128((const __m128i*)(tr + w));
        trv = _mm_or_si128(trv, _mm_maskz_set1_epi8(ext, 32));
        _mm_storeu_si128((__m128i*)(tr + w), trv);
        carry = _mm_cvtsi128_si32(
            _mm512_castsi512_si128(_mm512_permutexvar_epi32(last, x)));
      }
#endif
      for (; w <= whi; ++w) {
        const int x0 = nMp[w - 1] + GO - GE * w;
        if (carry > x0) { nDp[w] = carry + GE * w; tr[w] |= 32; }
        else { nDp[w] = x0 + GE * w; carry = x0; }
      }
    }
    // pass 4: best-of-three state bits (vectorizable)
    for (int w = wlo; w <= whi; ++w) {
      int best = nMp[w] > nIp[w] ? nMp[w] : nIp[w];
      if (nDp[w] > best) best = nDp[w];
      tr[w] |= (best == nMp[w]) ? 0 : (best == nIp[w]) ? 1 : 2;
    }
    M.swap(nM); I.swap(nI); D.swap(nD);
  }
  int i = la, j = lb;
  if (j - i + band < 0 || j - i + band >= W) return -1;
  // start from the best of the three end states
  int state;  // 0=M 1=I 2=D
  {
    int w = j - i + band;
    int best = std::max(M[w], std::max(I[w], D[w]));
    state = (best == M[w]) ? 0 : (best == I[w]) ? 1 : 2;
  }
  std::vector<std::pair<uint8_t, int32_t>> runs;
  while (i > 0 || j > 0) {
    int w = j - i + band;
    if (w < 0 || w >= W) return -1;
    uint8_t bits = trace[(size_t)i * W + w];
    uint8_t op;
    int ns;
    if (i == 0) { op = 2; ns = 2; --j; }
    else if (j == 0) { op = 1; ns = 1; --i; }
    else if (state == 0) {
      op = 0;
      ns = (bits & 4) ? 1 : (bits & 8) ? 2 : 0;
      --i; --j;
    } else if (state == 1) {
      op = 1;
      ns = (bits & 16) ? 1 : 0;
      --i;
    } else {
      op = 2;
      ns = (bits & 32) ? 2 : 0;
      --j;
    }
    state = ns;
    if (!runs.empty() && runs.back().first == op) runs.back().second++;
    else runs.push_back({op, 1});
  }
  if ((int)runs.size() > max_ops) return -1;
  int cnt = (int)runs.size();
  for (int t = 0; t < cnt; ++t) {
    ops_out[2 * t] = runs[cnt - 1 - t].first;
    ops_out[2 * t + 1] = runs[cnt - 1 - t].second;
  }
  return cnt;
}

int sp_banded_align_ops(const uint8_t* a, int la, const uint8_t* b, int lb,
                        int band, int32_t* ops_out, int max_ops) {
  AlignScratch sc;
  return banded_align_ops_core(a, la, b, lb, band, ops_out, max_ops, sc);
}

// ---------------------------------------------------------------------------
// sp_build_cs: minimap2-style cs:Z: short-tag text for one anchor-chained
// block (replaces the per-anchor Python loop in blocks/cs.build_cs, which
// cost ~50 s on ~500k-anchor chromosome-scale homoeologous blocks).
//
// q/t are uint8 base codes (0..3, >=4 = N) in the alignment's own
// orientation; anchors (aq, at) are k-mer start pairs sorted by aq and
// colinear. Anchor k-mers emit ':' runs; inter-anchor gaps <= 65536 bp go
// through the banded aligner above, longer gaps emit raw -/+ runs. With
// minus != 0 the runs are emitted target-forward (order reversed, carried
// sequences reverse-complemented) — blocks/cs.minus_transform semantics.
//
// Writes NUL-terminated cs text to out (returns text length, or -1 when
// out_cap is too small); *nmatch_out = total ':' length, *alen_out =
// nmatch + substitutions + inserted + deleted bases.
// ---------------------------------------------------------------------------
static const char* kBase = "acgtn";
static inline char comp_ch(char c) {
  switch (c) {
    case 'a': return 't';
    case 'c': return 'g';
    case 'g': return 'c';
    case 't': return 'a';
    default: return 'n';
  }
}

struct CsRun {
  char op;          // ':', '*', '+', '-'
  int64_t len;      // for ':'
  std::string seq;  // for '*' (2 chars: target, query), '+', '-'
};

static void cs_push_match(std::vector<CsRun>& runs, int64_t n) {
  if (n <= 0) return;
  if (!runs.empty() && runs.back().op == ':') runs.back().len += n;
  else runs.push_back({':', n, std::string()});
}

static void cs_emit_diag(std::vector<CsRun>& runs, const uint8_t* q,
                         const uint8_t* t, int64_t qpos, int64_t tpos,
                         int64_t n) {
  int64_t i = 0;
  while (i < n) {
    uint8_t qb = q[qpos + i], tb = t[tpos + i];
    if (qb == tb && qb < 4) {
      int64_t j = i;
      while (j < n && q[qpos + j] == t[tpos + j] && q[qpos + j] < 4) ++j;
      cs_push_match(runs, j - i);
      i = j;
    } else {
      std::string s;
      s.push_back(kBase[tb < 4 ? tb : 4]);
      s.push_back(kBase[qb < 4 ? qb : 4]);
      runs.push_back({'*', 0, s});
      ++i;
    }
  }
}

static void cs_seq(std::string& out, const uint8_t* p, int64_t lo, int64_t hi) {
  out.reserve(out.size() + (hi - lo));
  for (int64_t i = lo; i < hi; ++i) out.push_back(kBase[p[i] < 4 ? p[i] : 4]);
}

static void cs_raw_runs(std::vector<CsRun>& runs, const uint8_t* q,
                        const uint8_t* t, int64_t q0, int64_t q1,
                        int64_t t0, int64_t t1) {
  if (t1 > t0) {
    CsRun r{'-', 0, std::string()};
    cs_seq(r.seq, t, t0, t1);
    runs.push_back(std::move(r));
  }
  if (q1 > q0) {
    CsRun r{'+', 0, std::string()};
    cs_seq(r.seq, q, q0, q1);
    runs.push_back(std::move(r));
  }
}

static void cs_gap(std::vector<CsRun>& runs, const uint8_t* q, const uint8_t* t,
                   int64_t q0, int64_t q1, int64_t t0, int64_t t1,
                   std::vector<int32_t>& buf, AlignScratch& sc) {
  int64_t qlen = q1 - q0, tlen = t1 - t0;
  if (qlen <= 0 && tlen <= 0) return;
  const int64_t kMaxGapDp = 1 << 16;
  // the banded DP's traceback matrix is (la+1) x (2*band+1) with
  // band >= |qlen-tlen|; a very asymmetric gap (one-sided insertion)
  // would allocate gigabytes and burn minutes — emit raw runs instead,
  // like minimap2 does for structural-variant-scale gaps
  const int64_t kMaxGapDiff = 1 << 12;
  if (qlen > kMaxGapDp || tlen > kMaxGapDp ||
      std::abs(qlen - tlen) > kMaxGapDiff) {
    cs_raw_runs(runs, q, t, q0, q1, t0, t1);
    return;
  }
  int band = (int)std::abs(qlen - tlen) + 32;
  int64_t cap = 2 * (qlen + tlen) + 16;
  if ((int64_t)buf.size() < 2 * cap) buf.resize(2 * cap);
  int n = banded_align_ops_core(q + q0, (int)qlen, t + t0, (int)tlen, band,
                                buf.data(), (int)cap, sc);
  if (n < 0) {  // fallback: raw runs
    cs_raw_runs(runs, q, t, q0, q1, t0, t1);
    return;
  }
  int64_t qp = q0, tp = t0;
  for (int i = 0; i < n; ++i) {
    int op = buf[2 * i];
    int64_t ln = buf[2 * i + 1];
    if (op == 0) {
      cs_emit_diag(runs, q, t, qp, tp, ln);
      qp += ln; tp += ln;
    } else if (op == 1) {
      CsRun r{'+', 0, std::string()}; cs_seq(r.seq, q, qp, qp + ln);
      runs.push_back(std::move(r)); qp += ln;
    } else {
      CsRun r{'-', 0, std::string()}; cs_seq(r.seq, t, tp, tp + ln);
      runs.push_back(std::move(r)); tp += ln;
    }
  }
}

int64_t sp_build_cs(const uint8_t* q, int64_t /*qlen_total*/,
                    const uint8_t* t, int64_t /*tlen_total*/,
                    const int64_t* aq, const int64_t* at, int64_t n_anchors,
                    int64_t qstart, int64_t qend, int64_t tstart, int64_t tend,
                    int k, int minus, char* out, int64_t out_cap,
                    int64_t* nmatch_out, int64_t* alen_out) {
  // pass 1: anchor walk -> gap tasks (each gap is independent DP work;
  // the banded alignments dominate, so they run under OpenMP)
  struct GapTask { int64_t q0, q1, t0, t1; };
  std::vector<GapTask> gaps;
  std::vector<int64_t> match_len;  // ':' run after gap i (0 = none)
  gaps.reserve(4096);
  int64_t cq = qstart, ct = tstart;
  for (int64_t i = 0; i < n_anchors; ++i) {
    int64_t x = aq[i], y = at[i];
    if (x < cq || y < ct) continue;  // overlaps previous anchor
    // clamp the anchor match at the block bounds so a terminal anchor
    // ending past ONE boundary still leaves the other coordinate's
    // residual to the tail gap below (blocks/cs.build_cs semantics)
    int64_t m = std::min<int64_t>(k, std::min(qend - x, tend - y));
    if (m <= 0) break;
    gaps.push_back({cq, x, ct, y});
    match_len.push_back(m);
    cq = x + m; ct = y + m;
    if (m < k) break;
  }
  // residual tail (cq <= qend and ct <= tend hold by the clamp above);
  // one-sided tails come out as raw +/- runs from cs_gap
  gaps.push_back({cq, qend, ct, tend});
  match_len.push_back(0);

  std::vector<std::vector<CsRun>> gap_runs(gaps.size());
#pragma omp parallel
  {
    std::vector<int32_t> buf;
    AlignScratch sc;  // DP buffers reused across this thread's gaps
#pragma omp for schedule(dynamic, 16)
    for (int64_t i = 0; i < (int64_t)gaps.size(); ++i) {
      const GapTask& g = gaps[i];
      cs_gap(gap_runs[i], q, t, g.q0, g.q1, g.t0, g.t1, buf, sc);
    }
  }

  // pass 2: in-order stitch with the same ':'-merge the sequential walk did
  std::vector<CsRun> runs;
  runs.reserve(4096);
  for (size_t i = 0; i < gaps.size(); ++i) {
    for (auto& r : gap_runs[i]) {
      if (r.op == ':') cs_push_match(runs, r.len);
      else runs.push_back(std::move(r));
    }
    if (match_len[i] > 0) cs_push_match(runs, match_len[i]);
  }

  if (minus) {
    std::vector<CsRun> rev;
    rev.reserve(runs.size());
    for (auto it = runs.rbegin(); it != runs.rend(); ++it) {
      CsRun r{it->op, it->len, std::string()};
      if (it->op == '*') {
        // payload is (target, query): complement both, keep order
        r.seq.push_back(comp_ch(it->seq[0]));
        r.seq.push_back(comp_ch(it->seq[1]));
      } else if (it->op != ':') {
        r.seq.reserve(it->seq.size());
        for (auto ch = it->seq.rbegin(); ch != it->seq.rend(); ++ch)
          r.seq.push_back(comp_ch(*ch));
      }
      // merge adjacent ':' runs created by the reversal
      if (r.op == ':' && !rev.empty() && rev.back().op == ':') rev.back().len += r.len;
      else rev.push_back(std::move(r));
    }
    runs.swap(rev);
  }

  int64_t nmatch = 0, alen = 0, pos = 0;
  char tmp[32];
  for (const auto& r : runs) {
    if (r.op == ':') {
      nmatch += r.len;
      alen += r.len;
      int m = snprintf(tmp, sizeof(tmp), ":%lld", (long long)r.len);
      if (pos + m >= out_cap) return -1;
      std::memcpy(out + pos, tmp, m);
      pos += m;
    } else {
      alen += r.op == '*' ? 1 : (int64_t)r.seq.size();
      int64_t need = 1 + (int64_t)r.seq.size();
      if (pos + need >= out_cap) return -1;
      out[pos++] = r.op;
      std::memcpy(out + pos, r.seq.data(), r.seq.size());
      pos += r.seq.size();
    }
  }
  out[pos] = '\0';
  if (nmatch_out) *nmatch_out = nmatch;
  if (alen_out) *alen_out = alen;
  return pos;
}

// ---------------------------------------------------------------------------
// sp_lis: longest strictly-increasing subsequence of t (patience sort,
// O(n log n)). Input anchors must be sorted by (q, t). Writes the kept
// indices to idx_out (caller-sized to n) and returns their count.
// Replaces a per-element Python bisect loop in blocks/align._lis_anchors
// that cost tens of seconds on million-anchor homoeologous blocks.
// ---------------------------------------------------------------------------
int64_t sp_lis(const int64_t* t, int64_t n, int64_t* idx_out) {
  if (n <= 0) return 0;
  std::vector<int64_t> tails;      // tails[k] = smallest t ending a (k+1)-LIS
  std::vector<int64_t> tails_idx;  // index of that anchor
  std::vector<int64_t> prev(n, -1);
  tails.reserve(1024);
  tails_idx.reserve(1024);
  for (int64_t i = 0; i < n; ++i) {
    int64_t v = t[i];
    size_t k = std::lower_bound(tails.begin(), tails.end(), v) - tails.begin();
    if (k == tails.size()) {
      tails.push_back(v);
      tails_idx.push_back(i);
    } else {
      tails[k] = v;
      tails_idx[k] = i;
    }
    prev[i] = k > 0 ? tails_idx[k - 1] : -1;
  }
  int64_t count = 0;
  for (int64_t i = tails_idx.back(); i >= 0; i = prev[i]) ++count;
  int64_t w = count;
  for (int64_t i = tails_idx.back(); i >= 0; i = prev[i]) idx_out[--w] = i;
  return count;
}

// ---------------------------------------------------------------------------
// sp_pack_body: single-pass FASTA record body -> 2-bit packed words.
//
// Replaces the host-side numpy packing pipeline (io/encoding.encode_bases +
// pack_words + the newline-strip copy), which makes four full passes over
// each chromosome; the reference leaves this to Biopython line parsing
// (reference Seqs.py:27-71). `body` is the raw record body INCLUDING
// newlines/CR (skipped here, so no strip copy is ever made). Layout matches
// io/encoding.py: 16 bases per int32 word, base i in bits [2i, 2i+2),
// validity bit i = 1 iff unambiguous ACGT (case-insensitive). Trailing
// partial words are zero-padded/invalid.
//
// `packed` / `vmask` must hold at least (n + 15) / 16 words (an upper bound,
// since newline bytes only shrink the base count). Returns the number of
// bases written.
// ---------------------------------------------------------------------------
struct PackLut {
  uint8_t code[256];
  uint8_t valid[256];
  PackLut() {
    std::memset(code, 0, sizeof(code));
    std::memset(valid, 0, sizeof(valid));
    const char* bases = "ACGT";
    for (int i = 0; i < 4; ++i) {
      code[(uint8_t)bases[i]] = (uint8_t)i;
      code[(uint8_t)(bases[i] + 32)] = (uint8_t)i;
      valid[(uint8_t)bases[i]] = 1;
      valid[(uint8_t)(bases[i] + 32)] = 1;
    }
  }
};

int64_t sp_pack_body(const uint8_t* body, int64_t n, int32_t* packed,
                     int32_t* vmask) {
  // C++11 magic static: thread-safe one-time init (pack_body is called
  // concurrently from the packing thread pool)
  static const PackLut lut;
  const uint8_t* code_lut = lut.code;
  const uint8_t* valid_lut = lut.valid;
  uint32_t word = 0, vbits = 0;
  int shift = 0;
  int64_t nbases = 0, w = 0;
  for (int64_t i = 0; i < n; ++i) {
    uint8_t ch = body[i];
    if (ch == '\n' || ch == '\r') continue;
    word |= (uint32_t)code_lut[ch] << (2 * shift);
    vbits |= (uint32_t)valid_lut[ch] << shift;
    ++nbases;
    if (++shift == 16) {
      packed[w] = (int32_t)word;
      vmask[w] = (int32_t)vbits;
      ++w;
      word = vbits = 0;
      shift = 0;
    }
  }
  if (shift) {
    packed[w] = (int32_t)word;
    vmask[w] = (int32_t)vbits;
  }
  return nbases;
}

// ---------------------------------------------------------------------------
// sp_unpack_codes: 2-bit packed words -> uint8 base codes (0..3, 4 = N).
// One pass; replaces the numpy broadcast unpack (io/encoding.unpack_words
// materializes (n_words, 16) intermediates — measured 6.3 s per 26 Mb
// chromosome on the host, ~50x this loop).
// ---------------------------------------------------------------------------
void sp_unpack_codes(const int32_t* packed, const int32_t* vmask,
                     int64_t n_words, int64_t n_bases, uint8_t* out) {
  int64_t pos = 0;
  for (int64_t w = 0; w < n_words && pos < n_bases; ++w) {
    uint32_t p = (uint32_t)packed[w];
    uint32_t v = (uint32_t)vmask[w];
    int64_t lim = std::min<int64_t>(16, n_bases - pos);
    for (int64_t i = 0; i < lim; ++i) {
      uint8_t code = (p >> (2 * i)) & 3u;
      out[pos + i] = ((v >> i) & 1u) ? code : (uint8_t)4;
    }
    pos += lim;
  }
}

// ---------------------------------------------------------------------------
// sp_profile_align: global affine-gap (Gotoh) alignment of two peptide
// PROFILES — the merge step of the progressive MSA that replaces the
// reference's mafft call on concatenated domain peptides
// (reference LTR.py:144-299, api/TEsorter/modules/concatenate_domains.py).
//
// p1 is (l1 x 21) float32 row-major column frequencies (20 amino acids +
// gap at index 20). sp2 is (l2 x 21) float32 premultiplied by the
// substitution matrix (sp2[j] = S @ f2[j], one numpy matmul caller-side),
// so each DP cell's profile-sum-of-pairs score is a plain 21-dim dot.
// gap_open/gap_ext are positive penalties. Writes (op, len) runs to
// ops_out: 0 = aligned column pair, 1 = column from profile 1 only
// (gap inserted into profile 2), 2 = column from profile 2 only.
// Returns the run count, or -1 when max_ops is too small.
// ---------------------------------------------------------------------------
int sp_profile_align(const float* p1, int32_t l1, const float* sp2, int32_t l2,
                     float gap_open, float gap_ext,
                     int32_t* ops_out, int32_t max_ops) {
  if (l1 < 0 || l2 < 0) return -1;
  const float NEG = -1e30f;
  const int64_t W = (int64_t)l2 + 1;
  std::vector<float> M(W), X(W), Y(W), nM(W), nX(W), nY(W);
  // traceback: 2 bits for M's source (0=M,1=X,2=Y), 1 bit each for X/Y
  // (0 = opened from M, 1 = extended)
  std::vector<uint8_t> tb((int64_t)(l1 + 1) * W, 0);
  M[0] = 0; X[0] = NEG; Y[0] = NEG;
  for (int j = 1; j <= l2; ++j) {
    M[j] = NEG; X[j] = NEG;
    Y[j] = -gap_open - gap_ext * (float)(j - 1);
    tb[j] = (j > 1) ? (1u << 3) : 0;  // Y extended after the first open
  }
  for (int i = 1; i <= l1; ++i) {
    const float* f1 = p1 + (int64_t)(i - 1) * 21;
    nM[0] = NEG; nY[0] = NEG;
    nX[0] = -gap_open - gap_ext * (float)(i - 1);
    uint8_t* trow = tb.data() + (int64_t)i * W;
    trow[0] = (i > 1) ? (1u << 2) : 0;
    for (int j = 1; j <= l2; ++j) {
      const float* s2 = sp2 + (int64_t)(j - 1) * 21;
      float sc = 0.f;
      for (int a = 0; a < 21; ++a) sc += f1[a] * s2[a];
      // M from best of prior cell's three states
      float dm = M[j - 1], dx = X[j - 1], dy = Y[j - 1];
      uint8_t msrc = 0; float dbest = dm;
      if (dx > dbest) { dbest = dx; msrc = 1; }
      if (dy > dbest) { dbest = dy; msrc = 2; }
      nM[j] = dbest + sc;
      // X: column from profile 1 (advance i)
      float xo = M[j] - gap_open, xe = X[j] - gap_ext;
      uint8_t xsrc = xe > xo ? 1 : 0;
      nX[j] = xe > xo ? xe : xo;
      // Y: column from profile 2 (advance j)
      float yo = nM[j - 1] - gap_open, ye = nY[j - 1] - gap_ext;
      uint8_t ysrc = ye > yo ? 1 : 0;
      nY[j] = ye > yo ? ye : yo;
      trow[j] = msrc | (xsrc << 2) | (ysrc << 3);
    }
    M.swap(nM); X.swap(nX); Y.swap(nY);
  }
  // traceback from the best final state
  int state = 0;  // 0=M 1=X 2=Y
  float best = M[l2];
  if (X[l2] > best) { best = X[l2]; state = 1; }
  if (Y[l2] > best) { best = Y[l2]; state = 2; }
  std::vector<std::pair<int32_t, int32_t>> runs;  // reversed
  int i = l1, j = l2;
  auto push = [&](int32_t op) {
    if (!runs.empty() && runs.back().first == op) ++runs.back().second;
    else runs.push_back({op, 1});
  };
  while (i > 0 || j > 0) {
    uint8_t t = tb[(int64_t)i * W + j];
    if (i == 0) state = 2;
    else if (j == 0) state = 1;
    if (state == 0) {
      push(0);
      state = t & 3;
      --i; --j;
    } else if (state == 1) {
      push(1);
      state = ((t >> 2) & 1) ? 1 : 0;
      --i;
    } else {
      push(2);
      state = ((t >> 3) & 1) ? 2 : 0;
      --j;
    }
  }
  if ((int32_t)runs.size() > max_ops) return -1;
  int cnt = (int32_t)runs.size();
  for (int t = 0; t < cnt; ++t) {
    ops_out[2 * t] = runs[cnt - 1 - t].first;
    ops_out[2 * t + 1] = runs[cnt - 1 - t].second;
  }
  return cnt;
}

}  // extern "C"
