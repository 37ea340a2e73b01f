// textops — native host-side text primitives for hybridsearch_tpu.
//
// First-party C++ replacement for the native machinery the reference
// delegated to third-party libs: rapidfuzz's edit-distance kernels
// (reference core.py:185, autocomplete.py:126-131), regex tokenization
// (reference extractor.py:15), and MinHash shingle hashing
// (reference deduplication.py:84-124).
//
// Exposed as a C ABI consumed via ctypes (hybridsearch_tpu/text/native.py).
// Build: make -C native

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Tokenize: find runs of [A-Za-z0-9_] in `data`. Writes up to `cap`
// (start, end) byte-offset pairs; returns the number of tokens found.
int64_t hst_tokenize(const char* data, int64_t len, int64_t* starts,
                     int64_t* ends, int64_t cap) {
  int64_t n = 0;
  int64_t i = 0;
  while (i < len && n < cap) {
    unsigned char c = static_cast<unsigned char>(data[i]);
    bool word = (c == '_' || (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') ||
                 (c >= 'a' && c <= 'z'));
    if (!word) {
      ++i;
      continue;
    }
    int64_t start = i;
    while (i < len) {
      unsigned char d = static_cast<unsigned char>(data[i]);
      bool w = (d == '_' || (d >= '0' && d <= '9') || (d >= 'A' && d <= 'Z') ||
                (d >= 'a' && d <= 'z'));
      if (!w) break;
      ++i;
    }
    starts[n] = start;
    ends[n] = i;
    ++n;
  }
  return n;
}

// Levenshtein distance with the standard two-row DP, O(|a|*|b|) time,
// O(min) memory.
int64_t hst_levenshtein(const char* a, int64_t la, const char* b, int64_t lb) {
  if (la < lb) {
    std::swap(a, b);
    std::swap(la, lb);
  }
  if (lb == 0) return la;
  std::vector<int64_t> prev(lb + 1), cur(lb + 1);
  for (int64_t j = 0; j <= lb; ++j) prev[j] = j;
  for (int64_t i = 1; i <= la; ++i) {
    cur[0] = i;
    const char ca = a[i - 1];
    for (int64_t j = 1; j <= lb; ++j) {
      int64_t cost = (ca == b[j - 1]) ? 0 : 1;
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost});
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

// partial_ratio: best similarity (0..100) of the shorter string against any
// equal-length window of the longer one — the contract of
// rapidfuzz.fuzz.partial_ratio as used by the reference's fuzzy lexical arm.
// Uses banded early exit: tracks the best distance so far and skips windows
// whose first-character mismatch lower bound can't improve it.
double hst_partial_ratio(const char* a, int64_t la, const char* b, int64_t lb) {
  if (la == 0 || lb == 0) return 0.0;
  const char* s = a;
  const char* l = b;
  int64_t ls = la, ll = lb;
  if (ls > ll) {
    std::swap(s, l);
    std::swap(ls, ll);
  }
  int64_t best = ls;  // worst case: everything differs
  std::vector<int64_t> prev(ls + 1), cur(ls + 1);
  for (int64_t start = 0; start + ls <= ll; ++start) {
    const char* w = l + start;
    for (int64_t j = 0; j <= ls; ++j) prev[j] = j;
    for (int64_t i = 1; i <= ls; ++i) {
      cur[0] = i;
      const char cw = w[i - 1];
      int64_t row_min = cur[0];
      for (int64_t j = 1; j <= ls; ++j) {
        int64_t cost = (cw == s[j - 1]) ? 0 : 1;
        cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost});
        row_min = std::min(row_min, cur[j]);
      }
      if (row_min >= best) break;  // cannot beat current best in this window
      std::swap(prev, cur);
    }
    best = std::min(best, prev[ls]);
    if (best == 0) break;
  }
  return 100.0 * (1.0 - static_cast<double>(best) / static_cast<double>(ls));
}

// Tokenize + hash in one pass for the hashing encoder: lowercase word
// tokens ([A-Za-z0-9_]+), drop tokens whose FNV-1a hash appears in the
// sorted `stop_hashes` list, then emit FNV-1a hashes of each kept token
// (out_uni) and of each adjacent pair joined by '_' (out_bi, n-1 entries).
// Returns the number of kept tokens. Must produce hashes identical to the
// Python stable_hash over the lowercase token text.
static inline uint64_t fnv1a_update(uint64_t h, const char* p, int64_t n) {
  const uint64_t kPrime = 0x100000001B3ULL;
  for (int64_t i = 0; i < n; ++i) {
    h ^= static_cast<unsigned char>(p[i]);
    h *= kPrime;
  }
  return h;
}

static inline bool in_sorted(const uint64_t* a, int64_t n, uint64_t v) {
  int64_t lo = 0, hi = n;
  while (lo < hi) {
    int64_t mid = (lo + hi) / 2;
    if (a[mid] < v) lo = mid + 1; else hi = mid;
  }
  return lo < n && a[lo] == v;
}

int64_t hst_token_hashes(const char* data, int64_t len,
                         const uint64_t* stop_hashes, int64_t n_stop,
                         uint64_t* out_uni, uint64_t* out_bi, int64_t cap) {
  const uint64_t kOffset = 0xCBF29CE484222325ULL;
  // buffer for the lowercased current token (tokens are ASCII by def)
  char buf[256];
  char prev[256];
  int64_t prev_len = 0;
  int64_t n = 0;
  int64_t i = 0;
  while (i < len && n < cap) {
    unsigned char c = static_cast<unsigned char>(data[i]);
    bool word = (c == '_' || (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') ||
                 (c >= 'a' && c <= 'z'));
    if (!word) { ++i; continue; }
    int64_t blen = 0;
    while (i < len) {
      unsigned char d = static_cast<unsigned char>(data[i]);
      bool w = (d == '_' || (d >= '0' && d <= '9') || (d >= 'A' && d <= 'Z') ||
                (d >= 'a' && d <= 'z'));
      if (!w) break;
      if (blen < 255) {
        buf[blen++] = (d >= 'A' && d <= 'Z') ? static_cast<char>(d + 32)
                                             : static_cast<char>(d);
      }
      ++i;
    }
    uint64_t h = fnv1a_update(kOffset, buf, blen);
    if (in_sorted(stop_hashes, n_stop, h)) continue;
    out_uni[n] = h;
    if (n > 0) {
      // hash(prev + "_" + tok)
      uint64_t hb = fnv1a_update(kOffset, prev, prev_len);
      const char us = '_';
      hb = fnv1a_update(hb, &us, 1);
      hb = fnv1a_update(hb, buf, blen);
      out_bi[n - 1] = hb;
    }
    __builtin_memcpy(prev, buf, static_cast<size_t>(blen));
    prev_len = blen;
    ++n;
  }
  return n;
}

// Batch token hashing for bulk indexing: one call covers `n_docs`
// documents laid out contiguously in `data` with `offsets[n_docs + 1]`
// byte boundaries. For each doc, lowercased word-token FNV-1a hashes
// (stopword hashes dropped, same contract as hst_token_hashes) are
// written contiguously into `out`; counts[i] = kept tokens of doc i.
// Returns the total number of hashes written, or -1 if `cap` would be
// exceeded (caller re-allocates and retries).
int64_t hst_token_hashes_docs(const char* data, const int64_t* offsets,
                              int64_t n_docs, const uint64_t* stop_hashes,
                              int64_t n_stop, uint64_t* out, int64_t cap,
                              int64_t* counts) {
  const uint64_t kOffset = 0xCBF29CE484222325ULL;
  char buf[256];
  int64_t total = 0;
  for (int64_t d = 0; d < n_docs; ++d) {
    const char* doc = data + offsets[d];
    const int64_t len = offsets[d + 1] - offsets[d];
    int64_t kept = 0;
    int64_t i = 0;
    while (i < len) {
      unsigned char c = static_cast<unsigned char>(doc[i]);
      bool word = (c == '_' || (c >= '0' && c <= '9') ||
                   (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'));
      if (!word) { ++i; continue; }
      int64_t blen = 0;
      while (i < len) {
        unsigned char e = static_cast<unsigned char>(doc[i]);
        bool w = (e == '_' || (e >= '0' && e <= '9') ||
                  (e >= 'A' && e <= 'Z') || (e >= 'a' && e <= 'z'));
        if (!w) break;
        if (blen < 255) {
          buf[blen++] = (e >= 'A' && e <= 'Z') ? static_cast<char>(e + 32)
                                               : static_cast<char>(e);
        }
        ++i;
      }
      uint64_t h = fnv1a_update(kOffset, buf, blen);
      if (in_sorted(stop_hashes, n_stop, h)) continue;
      if (total >= cap) return -1;
      out[total++] = h;
      ++kept;
    }
    counts[d] = kept;
  }
  return total;
}

// 64-bit FNV-1a hashes over character shingles of length `k`.
int64_t hst_minhash_shingles(const char* data, int64_t len, int64_t k,
                             uint64_t* out, int64_t cap) {
  const uint64_t kOffset = 0xCBF29CE484222325ULL;
  const uint64_t kPrime = 0x100000001B3ULL;
  int64_t n = (len >= k) ? (len - k + 1) : 0;
  n = std::min(n, cap);
  for (int64_t i = 0; i < n; ++i) {
    uint64_t h = kOffset;
    for (int64_t j = 0; j < k; ++j) {
      h ^= static_cast<unsigned char>(data[i + j]);
      h *= kPrime;
    }
    out[i] = h;
  }
  return n;
}

}  // extern "C"
