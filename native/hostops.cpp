// hostops: native host-side kernels for legalrag_tpu.
//
// The TPU owns all scoring math; these are the *host* hot loops that feed
// it — feature hashing, sketch accumulation, and ASCII tokenization —
// replacing the numpy-vectorized fallbacks (legalrag_tpu/tokenize,
// models/hash_encoder). Exposed as a plain C ABI consumed via ctypes
// (no pybind11 dependency by design; see pyproject notes).
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cctype>

extern "C" {

// ---------------------------------------------------------------------------
// FNV-1a 64-bit over concatenated UTF-8 strings.
//   data:    concatenated bytes of all strings
//   offsets: n+1 offsets into data (string i = data[offsets[i]..offsets[i+1]))
//   out:     n hashes
void fnv1a64_batch(const uint8_t* data, const int64_t* offsets, int64_t n,
                   uint64_t seed, uint64_t* out) {
    const uint64_t kOffset = 0xCBF29CE484222325ULL;
    const uint64_t kPrime = 0x100000001B3ULL;
    for (int64_t i = 0; i < n; ++i) {
        uint64_t h = kOffset ^ seed;
        const uint8_t* p = data + offsets[i];
        const uint8_t* end = data + offsets[i + 1];
        for (; p != end; ++p) {
            h ^= *p;
            h *= kPrime;
        }
        out[i] = h;
    }
}

// ---------------------------------------------------------------------------
// Signed-count sketch accumulation: for feature j with hash h[j] belonging
// to text row[j], add sign(h) at bucket h % sketch_dim of out[row].
//   out: [n_rows, sketch_dim] float32, zero-initialized by the caller
void sketch_accumulate(const uint64_t* hashes, const int32_t* rows,
                       int64_t n_feats, int64_t sketch_dim, float* out) {
    for (int64_t j = 0; j < n_feats; ++j) {
        uint64_t h = hashes[j];
        int64_t bucket = (int64_t)(h % (uint64_t)sketch_dim);
        float sign = ((h >> 62) & 1ULL) ? 1.0f : -1.0f;
        out[(int64_t)rows[j] * sketch_dim + bucket] += sign;
    }
}

// ---------------------------------------------------------------------------
// ASCII/latin tokenizer: lowercase [A-Za-z0-9]+ runs with an optional
// single '
// -joined suffix (BM25 en parity with the reference regex,
// bm25_builder.py:18-19). Non-ASCII bytes terminate tokens (CJK goes
// through jieba on the Python side).
//   text:       UTF-8 bytes (modified in place to lowercase ASCII)
//   out_starts/out_ends: token byte spans, capacity max_tokens
//   returns number of tokens found
int64_t tokenize_ascii(uint8_t* text, int64_t len, int64_t* out_starts,
                       int64_t* out_ends, int64_t max_tokens) {
    int64_t count = 0;
    int64_t i = 0;
    while (i < len && count < max_tokens) {
        if (isalnum(text[i]) && text[i] < 128) {
            int64_t start = i;
            while (i < len && text[i] < 128 && isalnum(text[i])) {
                text[i] = (uint8_t)tolower(text[i]);
                ++i;
            }
            // optional 'suffix (e.g. seller's)
            if (i + 1 < len && text[i] == '\'' && text[i + 1] < 128 &&
                isalnum(text[i + 1])) {
                ++i;
                while (i < len && text[i] < 128 && isalnum(text[i])) {
                    text[i] = (uint8_t)tolower(text[i]);
                    ++i;
                }
            }
            out_starts[count] = start;
            out_ends[count] = i;
            ++count;
        } else {
            ++i;
        }
    }
    return count;
}

}  // extern "C"
