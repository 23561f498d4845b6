// N-gram (prompt-lookup) draft matching — host-side hot loop.
//
// Reference counterpart: vllm/v1/spec_decode/ngram_proposer.py numba
// kernels (:169). numba is not in this image and the scan runs on the
// host every step for every running request, so it is implemented as
// a small C++ kernel (see native/build.py for the build story).
//
// Semantics (must stay in lockstep with the Python fallback in
// spec_decode/ngram_proposer.py): among positions e in
// [min_n-1, len-2], let m(e) = length of the common suffix between
// seq[..e] and seq[..len-1], capped at max_n. Pick the position with
// the largest m(e) >= min_n, breaking ties toward the most recent e;
// the draft is the k tokens following it. A single reverse scan with
// early exit at m == max_n is equivalent to the reference's
// "longest n first, most recent occurrence" loop.

#include <cstdint>

extern "C" {

// Returns the number of drafted tokens written to out (0..k).
int64_t ngram_propose(const int32_t* seq, int64_t len, int64_t min_n,
                      int64_t max_n, int64_t k, int32_t* out) {
    if (len < min_n + 1 || min_n < 1) return 0;
    if (max_n > len - 1) max_n = len - 1;

    int64_t best_m = 0, best_e = -1;
    const int64_t last = len - 1;
    for (int64_t e = len - 2; e >= min_n - 1; --e) {
        // common suffix length of seq[..e] and seq[..last], capped
        int64_t m = 0;
        while (m < max_n && m <= e && seq[e - m] == seq[last - m]) {
            ++m;
        }
        if (m >= min_n && m > best_m) {
            best_m = m;
            best_e = e;
            if (best_m == max_n) break;  // cannot improve
        }
    }
    if (best_e < 0) return 0;
    int64_t start = best_e + 1;
    int64_t n_out = len - start;
    if (n_out > k) n_out = k;
    for (int64_t i = 0; i < n_out; ++i) out[i] = seq[start + i];
    return n_out;
}

// Batched variant over the runner's persistent [rows, max_len] token
// matrix: starts[i] is request i's element offset into `base` (row *
// row_stride — zero copy), lens[i] its token count. Drafts go
// row-major into out [nreq, k]; out_lens[i] holds each row's valid
// length. One call per scheduler step instead of one per request.
void ngram_propose_batch(const int32_t* base, const int64_t* starts,
                         const int64_t* lens, int64_t nreq,
                         int64_t min_n, int64_t max_n, int64_t k,
                         int32_t* out, int32_t* out_lens) {
    for (int64_t i = 0; i < nreq; ++i) {
        out_lens[i] = (int32_t)ngram_propose(base + starts[i], lens[i],
                                             min_n, max_n, k,
                                             out + i * k);
    }
}

}  // extern "C"
