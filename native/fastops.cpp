// fastops: native host-side kernels for the evaluation hot loop.
//
// The reference leans on the `editdistance` C wheel and per-window
// difflib.SequenceMatcher calls (src/metrics.py:22, src/utils.py:255-281);
// evaluating chunk scores over a full validation split is a host-bound
// O(n_samples * n_chunks * |chunk| * |answer|) loop. These kernels keep that
// loop native:
//
//   * levenshtein            — banded DP edit distance over uint32 codepoints
//   * best_substring_ratio   — max difflib ratio of `b` against every
//                              len(b)-window of `a` (exact difflib
//                              get_matching_blocks semantics, no junk
//                              heuristic), early-exit on 1.0
//
// Built lazily by rag_docvqa_tpu/native.py:  g++ -O3 -shared -fPIC.

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <unordered_map>
#include <vector>

extern "C" {

int levenshtein(const uint32_t* a, int la, const uint32_t* b, int lb) {
    if (la == 0) return lb;
    if (lb == 0) return la;
    if (la < lb) { std::swap(a, b); std::swap(la, lb); }
    std::vector<int> prev(lb + 1), cur(lb + 1);
    for (int j = 0; j <= lb; ++j) prev[j] = j;
    for (int i = 0; i < la; ++i) {
        cur[0] = i + 1;
        const uint32_t ca = a[i];
        for (int j = 0; j < lb; ++j) {
            int cost = (b[j] != ca);
            cur[j + 1] = std::min({prev[j] + cost, prev[j + 1] + 1, cur[j] + 1});
        }
        std::swap(prev, cur);
    }
    return prev[lb];
}

namespace {

// difflib SequenceMatcher matching-character count for seq1 over seq2
// (b2j built from seq2), recursion replaced by an explicit stack.
struct Range { int alo, ahi, blo, bhi; };

long matching_chars(const uint32_t* s1, int l1, const uint32_t* s2, int l2) {
    std::unordered_map<uint32_t, std::vector<int>> b2j;
    b2j.reserve(l2 * 2);
    for (int j = 0; j < l2; ++j) b2j[s2[j]].push_back(j);

    long matches = 0;
    std::vector<Range> stack;
    stack.push_back({0, l1, 0, l2});
    std::unordered_map<int, int> j2len, newj2len;

    while (!stack.empty()) {
        Range r = stack.back();
        stack.pop_back();
        // find longest match in r
        int besti = r.alo, bestj = r.blo, bestsize = 0;
        j2len.clear();
        for (int i = r.alo; i < r.ahi; ++i) {
            newj2len.clear();
            auto it = b2j.find(s1[i]);
            if (it != b2j.end()) {
                for (int j : it->second) {
                    if (j < r.blo) continue;
                    if (j >= r.bhi) break;
                    int k = 1;
                    auto pit = j2len.find(j - 1);
                    if (pit != j2len.end()) k = pit->second + 1;
                    newj2len[j] = k;
                    if (k > bestsize) {
                        besti = i - k + 1;
                        bestj = j - k + 1;
                        bestsize = k;
                    }
                }
            }
            std::swap(j2len, newj2len);
        }
        if (bestsize > 0) {
            matches += bestsize;
            if (r.alo < besti && r.blo < bestj)
                stack.push_back({r.alo, besti, r.blo, bestj});
            if (besti + bestsize < r.ahi && bestj + bestsize < r.bhi)
                stack.push_back({besti + bestsize, r.ahi, bestj + bestsize, r.bhi});
        }
    }
    return matches;
}

}  // namespace

// Max SequenceMatcher(None, b, a[i:i+len(b)]).ratio() over all windows i.
double best_substring_ratio(const uint32_t* a, int la, const uint32_t* b, int lb) {
    if (lb == 0 || la < lb) {
        // mirror the Python loop: range(la - lb + 1) is empty -> score 0
        if (la - lb + 1 <= 0) return 0.0;
    }
    double best = 0.0;
    const double denom = 2.0 * lb;  // len(b) + len(window), window == lb
    for (int i = 0; i + lb <= la; ++i) {
        long m = matching_chars(b, lb, a + i, lb);
        double ratio = denom > 0 ? (2.0 * m) / denom : 0.0;
        if (ratio > best) {
            best = ratio;
            if (best >= 1.0) break;
        }
    }
    return best;
}

// Batched Levenshtein: flat codepoint buffers with offsets, results out.
void levenshtein_batch(
    const uint32_t* a_flat, const int* a_off, const uint32_t* b_flat,
    const int* b_off, int n, int* out) {
    for (int i = 0; i < n; ++i) {
        out[i] = levenshtein(
            a_flat + a_off[i], a_off[i + 1] - a_off[i],
            b_flat + b_off[i], b_off[i + 1] - b_off[i]);
    }
}

}  // extern "C"
