// vxnative — native host runtime for vectorx_tpu.
//
// Fast CPU implementations of the framework's numeric kernels:
//   - Goldilocks field ops + radix-2 NTT (the prover's dominant kernel)
//   - Poseidon width-12 permutation (constants passed in from Python so the
//     single source of truth stays vectorx_tpu/hashes/poseidon.py)
//   - Blake2b-256 / SHA-256 (header hashing, commitment chains)
//
// Used for: differential-test oracles against the TPU kernels, and fast
// host-side witness preparation (padding/hashing hundreds of headers while
// the device runs the proof pipeline). Loaded via ctypes
// (vectorx_tpu/runtime/native.py); built with plain g++ -O3.
//
// Replaces the role of the reference prover's native CPU path
// (plonky2's rayon kernels — SURVEY.md §2.2) on the host side of our stack.

#include <cstdint>
#include <cstring>
#include <cstddef>

extern "C" {

// ---------------------------------------------------------------------------
// Goldilocks field
// ---------------------------------------------------------------------------

static const uint64_t GL_P = 0xFFFFFFFF00000001ULL;

static inline uint64_t gl_add(uint64_t a, uint64_t b) {
    uint64_t s = a + b;
    if (s < a) s += 0xFFFFFFFFULL;  // overflow: fold 2^64 ≡ 2^32 - 1 (mod P)
    if (s >= GL_P) s -= GL_P;
    return s;
}

static inline uint64_t gl_sub(uint64_t a, uint64_t b) {
    return a >= b ? a - b : a + (GL_P - b);
}

static inline uint64_t gl_mul(uint64_t a, uint64_t b) {
    __uint128_t prod = ( __uint128_t)a * b;
    uint64_t lo = (uint64_t)prod;
    uint64_t hi = (uint64_t)(prod >> 64);
    uint64_t hi_lo = hi & 0xFFFFFFFFULL;
    uint64_t hi_hi = hi >> 32;
    // lo - hi_hi (mod P)
    uint64_t t0 = gl_sub(lo >= GL_P ? lo - GL_P : lo, hi_hi);
    // + hi_lo * (2^32 - 1)
    uint64_t t1 = (hi_lo << 32) - hi_lo;  // < P? hi_lo*(2^32-1) < 2^64, reduce:
    if (t1 >= GL_P) t1 -= GL_P;
    return gl_add(t0, t1);
}

static inline uint64_t gl_pow(uint64_t b, uint64_t e) {
    uint64_t r = 1;
    while (e) {
        if (e & 1) r = gl_mul(r, b);
        b = gl_mul(b, b);
        e >>= 1;
    }
    return r;
}

uint64_t vx_gl_mul(uint64_t a, uint64_t b) { return gl_mul(a % GL_P, b % GL_P); }
uint64_t vx_gl_add(uint64_t a, uint64_t b) { return gl_add(a % GL_P, b % GL_P); }
uint64_t vx_gl_sub(uint64_t a, uint64_t b) { return gl_sub(a % GL_P, b % GL_P); }
uint64_t vx_gl_inv(uint64_t a) { return gl_pow(a % GL_P, GL_P - 2); }

void vx_gl_mul_vec(const uint64_t* a, const uint64_t* b, uint64_t* out, size_t n) {
    for (size_t i = 0; i < n; i++) out[i] = gl_mul(a[i], b[i]);
}

// ---------------------------------------------------------------------------
// Radix-2 NTT (iterative Cooley-Tukey, in-place, natural order in/out)
// ---------------------------------------------------------------------------

void vx_gl_ntt(uint64_t* data, size_t n, uint64_t root, int inverse) {
    // bit-reverse permute
    size_t log_n = 0;
    while (((size_t)1 << log_n) < n) log_n++;
    for (size_t i = 0; i < n; i++) {
        size_t r = 0;
        for (size_t b = 0; b < log_n; b++) r |= ((i >> b) & 1) << (log_n - 1 - b);
        if (r > i) { uint64_t t = data[i]; data[i] = data[r]; data[r] = t; }
    }
    uint64_t w_base = inverse ? gl_pow(root, GL_P - 2) : root;
    for (size_t m = 2; m <= n; m <<= 1) {
        uint64_t w_m = gl_pow(w_base, n / m);
        for (size_t k = 0; k < n; k += m) {
            uint64_t w = 1;
            for (size_t j = 0; j < m / 2; j++) {
                uint64_t t = gl_mul(w, data[k + j + m / 2]);
                uint64_t u = data[k + j];
                data[k + j] = gl_add(u, t);
                data[k + j + m / 2] = gl_sub(u, t);
                w = gl_mul(w, w_m);
            }
        }
    }
    if (inverse) {
        uint64_t n_inv = gl_pow((uint64_t)n, GL_P - 2);
        for (size_t i = 0; i < n; i++) data[i] = gl_mul(data[i], n_inv);
    }
}

// ---------------------------------------------------------------------------
// Poseidon width-12 (constants injected from Python)
// ---------------------------------------------------------------------------

void vx_poseidon_permute(uint64_t* states, size_t batch,
                         const uint64_t* rc,   // 30*12
                         const uint64_t* mds,  // 12*12
                         int full_rounds, int partial_rounds) {
    const int W = 12;
    int half_f = full_rounds / 2;
    for (size_t bidx = 0; bidx < batch; bidx++) {
        uint64_t* s = states + bidx * W;
        uint64_t tmp[12];
        int r = 0;
        auto sbox = [](uint64_t x) {
            uint64_t x2 = gl_mul(x, x);
            uint64_t x3 = gl_mul(x2, x);
            uint64_t x6 = gl_mul(x3, x3);
            return gl_mul(x6, x);
        };
        auto mds_mul = [&](uint64_t* st, uint64_t* out) {
            for (int i = 0; i < W; i++) {
                __uint128_t acc_lo = 0;  // sum of products via 128-bit acc
                uint64_t acc = 0;
                (void)acc_lo;
                for (int j = 0; j < W; j++)
                    acc = gl_add(acc, gl_mul(mds[i * W + j], st[j]));
                out[i] = acc;
            }
        };
        for (int fr = 0; fr < half_f; fr++, r++) {
            for (int i = 0; i < W; i++) s[i] = sbox(gl_add(s[i], rc[r * W + i]));
            mds_mul(s, tmp);
            memcpy(s, tmp, sizeof(tmp));
        }
        for (int pr = 0; pr < partial_rounds; pr++, r++) {
            for (int i = 0; i < W; i++) s[i] = gl_add(s[i], rc[r * W + i]);
            s[0] = sbox(s[0]);
            mds_mul(s, tmp);
            memcpy(s, tmp, sizeof(tmp));
        }
        for (int fr = 0; fr < half_f; fr++, r++) {
            for (int i = 0; i < W; i++) s[i] = sbox(gl_add(s[i], rc[r * W + i]));
            mds_mul(s, tmp);
            memcpy(s, tmp, sizeof(tmp));
        }
    }
}

// ---------------------------------------------------------------------------
// Blake2b-256
// ---------------------------------------------------------------------------

static const uint64_t B2B_IV[8] = {
    0x6a09e667f3bcc908ULL, 0xbb67ae8584caa73bULL, 0x3c6ef372fe94f82bULL,
    0xa54ff53a5f1d36f1ULL, 0x510e527fade682d1ULL, 0x9b05688c2b3e6c1fULL,
    0x1f83d9abfb41bd6bULL, 0x5be0cd19137e2179ULL};

static const uint8_t B2B_SIGMA[12][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0},
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3}};

static inline uint64_t rotr64(uint64_t x, int r) {
    return (x >> r) | (x << (64 - r));
}

static void b2b_compress(uint64_t h[8], const uint8_t* block, uint64_t t,
                         int last) {
    uint64_t v[16], m[16];
    for (int i = 0; i < 8; i++) { v[i] = h[i]; v[i + 8] = B2B_IV[i]; }
    v[12] ^= t;
    if (last) v[14] = ~v[14];
    for (int i = 0; i < 16; i++) memcpy(&m[i], block + 8 * i, 8);
    for (int r = 0; r < 12; r++) {
        const uint8_t* s = B2B_SIGMA[r];
        auto G = [&](int a, int b, int c, int d, uint64_t x, uint64_t y) {
            v[a] = v[a] + v[b] + x;
            v[d] = rotr64(v[d] ^ v[a], 32);
            v[c] = v[c] + v[d];
            v[b] = rotr64(v[b] ^ v[c], 24);
            v[a] = v[a] + v[b] + y;
            v[d] = rotr64(v[d] ^ v[a], 16);
            v[c] = v[c] + v[d];
            v[b] = rotr64(v[b] ^ v[c], 63);
        };
        G(0, 4, 8, 12, m[s[0]], m[s[1]]);
        G(1, 5, 9, 13, m[s[2]], m[s[3]]);
        G(2, 6, 10, 14, m[s[4]], m[s[5]]);
        G(3, 7, 11, 15, m[s[6]], m[s[7]]);
        G(0, 5, 10, 15, m[s[8]], m[s[9]]);
        G(1, 6, 11, 12, m[s[10]], m[s[11]]);
        G(2, 7, 8, 13, m[s[12]], m[s[13]]);
        G(3, 4, 9, 14, m[s[14]], m[s[15]]);
    }
    for (int i = 0; i < 8; i++) h[i] ^= v[i] ^ v[i + 8];
}

void vx_blake2b256(const uint8_t* msg, size_t len, uint8_t* out32) {
    uint64_t h[8];
    memcpy(h, B2B_IV, sizeof(h));
    h[0] ^= 0x01010020ULL;
    size_t n_chunks = len == 0 ? 1 : (len + 127) / 128;
    uint8_t block[128];
    for (size_t i = 0; i < n_chunks; i++) {
        size_t off = i * 128;
        size_t take = len > off ? (len - off > 128 ? 128 : len - off) : 0;
        memset(block, 0, 128);
        if (take) memcpy(block, msg + off, take);
        int last = (i == n_chunks - 1);
        uint64_t t = last ? (uint64_t)len : (uint64_t)(off + 128);
        b2b_compress(h, block, t, last);
    }
    memcpy(out32, h, 32);
}

// batch helper: many equal-buffer messages with per-message lengths
void vx_blake2b256_batch(const uint8_t* msgs, const uint32_t* lens,
                         size_t stride, size_t count, uint8_t* out) {
    for (size_t i = 0; i < count; i++)
        vx_blake2b256(msgs + i * stride, lens[i], out + 32 * i);
}

// ---------------------------------------------------------------------------
// SHA-256
// ---------------------------------------------------------------------------

static const uint32_t SHA_K[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

static inline uint32_t rotr32(uint32_t x, int r) {
    return (x >> r) | (x << (32 - r));
}

void vx_sha256(const uint8_t* msg, size_t len, uint8_t* out32) {
    uint32_t h[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                     0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
    size_t total = len + 1 + 8;
    size_t padded = ((total + 63) / 64) * 64;
    uint8_t block[64];
    for (size_t off = 0; off < padded; off += 64) {
        memset(block, 0, 64);
        for (size_t i = 0; i < 64; i++) {
            size_t p = off + i;
            if (p < len) block[i] = msg[p];
            else if (p == len) block[i] = 0x80;
            else if (p >= padded - 8) {
                uint64_t bits = (uint64_t)len * 8;
                block[i] = (uint8_t)(bits >> (8 * (padded - 1 - p)));
            }
        }
        uint32_t w[64];
        for (int i = 0; i < 16; i++)
            w[i] = (block[4 * i] << 24) | (block[4 * i + 1] << 16) |
                   (block[4 * i + 2] << 8) | block[4 * i + 3];
        for (int i = 16; i < 64; i++) {
            uint32_t s0 = rotr32(w[i - 15], 7) ^ rotr32(w[i - 15], 18) ^ (w[i - 15] >> 3);
            uint32_t s1 = rotr32(w[i - 2], 17) ^ rotr32(w[i - 2], 19) ^ (w[i - 2] >> 10);
            w[i] = w[i - 16] + s0 + w[i - 7] + s1;
        }
        uint32_t a = h[0], b = h[1], c = h[2], d = h[3],
                 e = h[4], f = h[5], g = h[6], hh = h[7];
        for (int i = 0; i < 64; i++) {
            uint32_t s1 = rotr32(e, 6) ^ rotr32(e, 11) ^ rotr32(e, 25);
            uint32_t ch = (e & f) ^ (~e & g);
            uint32_t t1 = hh + s1 + ch + SHA_K[i] + w[i];
            uint32_t s0 = rotr32(a, 2) ^ rotr32(a, 13) ^ rotr32(a, 22);
            uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
            uint32_t t2 = s0 + maj;
            hh = g; g = f; f = e; e = d + t1; d = c; c = b; b = a; a = t1 + t2;
        }
        h[0] += a; h[1] += b; h[2] += c; h[3] += d;
        h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
    }
    for (int i = 0; i < 8; i++) {
        out32[4 * i] = (uint8_t)(h[i] >> 24);
        out32[4 * i + 1] = (uint8_t)(h[i] >> 16);
        out32[4 * i + 2] = (uint8_t)(h[i] >> 8);
        out32[4 * i + 3] = (uint8_t)h[i];
    }
}

}  // extern "C"
