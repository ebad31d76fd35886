// Native batch decoders for the byte/bit-domain algebraic codes
// (GF(2^8) Reed-Solomon and binary BCH) — the host-side hot loops of the
// DVB-T/COFDM receive chains. Mirrors orion_sdr_tpu/fec/galois.py exactly
// (behavioral spec: reference src/fec/{gf,bch,reed_solomon}.rs): primitive
// polynomial 0x11D, RS FCR = 0, BCH syndromes α^1..α^2t, shortened codes at
// the high end of the 255-frame. Per-codeword decode is sequential
// (BM + Chien + Forney); the batch loop is the parallel axis.
//
// C ABI for ctypes. Build: g++ -O3 -shared -fPIC (see native/__init__.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// Codewords are independent → split the batch across hardware threads.
// (The reference is single-core by design; this is the native runtime's
// free parallel axis.) Small batches stay single-threaded: spawn cost
// would dominate.
void parallel_rows(int batch, const std::function<void(int, int)>& fn) {
    unsigned hw = std::thread::hardware_concurrency();
    int nt = (int)std::min<unsigned>(hw ? hw : 1u, 16u);
    nt = std::min(nt, batch / 32);
    if (nt <= 1) {
        fn(0, batch);
        return;
    }
    std::vector<std::thread> pool;
    int per = (batch + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int lo = t * per, hi = std::min(batch, lo + per);
        if (lo >= hi) break;
        pool.emplace_back(fn, lo, hi);
    }
    for (auto& th : pool) th.join();
}

constexpr int PRIM = 0x11D;
constexpr int ORDER = 255;

struct Tables {
    uint8_t exp[512];
    uint8_t log[256];
    Tables() {
        int x = 1;
        for (int i = 0; i < ORDER; ++i) {
            exp[i] = (uint8_t)x;
            log[x] = (uint8_t)i;
            x <<= 1;
            if (x & 0x100) x ^= PRIM;
        }
        for (int i = ORDER; i < 510; ++i) exp[i] = exp[i - ORDER];
        exp[510] = exp[511] = 0;
        log[0] = 0;
    }
};
const Tables GF;

inline uint8_t gmul(uint8_t a, uint8_t b) {
    if (a == 0 || b == 0) return 0;
    return GF.exp[GF.log[a] + GF.log[b]];
}

inline uint8_t ginv(uint8_t a) { return GF.exp[ORDER - GF.log[a]]; }

// Berlekamp–Massey. start = 0 (RS: s[0..2t-1]) or 1 (BCH: s[1..2t]).
// s has length 2t+start. sigma out is low-degree-first, length <= t+1.
int berlekamp_massey(const uint8_t* s, int t, int start, uint8_t* sigma_out,
                     int cap) {
    std::vector<uint8_t> sigma(cap, 0), b(cap, 0), tmp(cap, 0);
    sigma[0] = 1;
    b[0] = 1;
    int l = 0, m = 1;
    int n_lo = start == 1 ? 1 : 0;
    int n_hi = start == 1 ? 2 * t + 1 : 2 * t;
    for (int n = n_lo; n < n_hi; ++n) {
        int delta = s[n];
        for (int i = 1; i <= l && i < cap; ++i)
            if (sigma[i]) delta ^= gmul(sigma[i], s[n - i]);
        bool cond = start == 1 ? (2 * l < n) : (2 * l <= n);
        if (delta == 0) {
            ++m;
        } else if (cond) {
            tmp = sigma;
            uint8_t coef = (uint8_t)delta;
            for (int i = 0; i + m < cap; ++i)
                if (b[i]) sigma[i + m] ^= gmul(coef, b[i]);
            l = start == 1 ? (n - l) : (n + 1 - l);
            uint8_t inv = ginv(coef);
            for (int i = 0; i < cap; ++i) b[i] = gmul(tmp[i], inv);
            m = 1;
        } else {
            uint8_t coef = (uint8_t)delta;
            for (int i = 0; i + m < cap; ++i)
                if (b[i]) sigma[i + m] ^= gmul(coef, b[i]);
            ++m;
        }
    }
    std::memcpy(sigma_out, sigma.data(), cap);
    int deg = 0;
    for (int i = 0; i < cap; ++i)
        if (sigma_out[i]) deg = i;
    return deg;
}

inline uint8_t poly_eval(const uint8_t* p, int len, uint8_t x) {
    uint8_t acc = 0;
    for (int i = len - 1; i >= 0; --i) acc = (uint8_t)(gmul(acc, x) ^ p[i]);
    return acc;
}

}  // namespace

extern "C" {

// RS(n, k = n - n_parity) decode of `batch` codewords. in: batch×n bytes,
// out: batch×k bytes, ok: batch flags (1 = decoded, 0 = uncorrectable —
// out row then holds the systematic prefix, matching the Python fallback).
void rs_decode_batch(int n, int n_parity, const uint8_t* in, int batch,
                     uint8_t* out, uint8_t* ok) {
    const int k = n - n_parity;
    const int t = n_parity / 2;
    const int shift = ORDER - n;
    const int cap = t + 2;

    parallel_rows(batch, [=](int row_lo, int row_hi) {
    std::vector<uint8_t> s(n_parity), sigma(cap), omega(n_parity),
        deriv(cap), word(n);

    for (int bi = row_lo; bi < row_hi; ++bi) {
        const uint8_t* r = in + (size_t)bi * n;
        uint8_t* o = out + (size_t)bi * k;
        std::memcpy(o, r, k);
        ok[bi] = 0;

        // syndromes: S_j = Σ_p r[p] · α^(j·deg(p)), deg(p) = n-1-p+shift
        bool any = false;
        for (int j = 0; j < n_parity; ++j) {
            uint8_t acc = 0;
            for (int p = 0; p < n; ++p) {
                if (!r[p]) continue;
                int deg = (n - 1 - p + shift);
                acc ^= gmul(r[p], GF.exp[((long)j * deg) % ORDER]);
            }
            s[j] = acc;
            any |= acc != 0;
        }
        if (!any) {
            ok[bi] = 1;
            continue;
        }

        std::fill(sigma.begin(), sigma.end(), 0);
        int sdeg = berlekamp_massey(s.data(), t, 0, sigma.data(), cap);
        if (sdeg > t) continue;

        // Chien: error at code degree i where σ(α^{-i}) == 0
        int err_deg[64];
        int n_err = 0;
        for (int i = 0; i < ORDER && n_err <= t; ++i) {
            uint8_t xinv = GF.exp[(ORDER - i % ORDER) % ORDER];
            if (poly_eval(sigma.data(), sdeg + 1, xinv) == 0)
                err_deg[n_err++] = i;
        }
        if (n_err != sdeg) continue;

        // Forney: Ω = S·σ mod x^(2t); σ' = odd terms
        std::fill(omega.begin(), omega.end(), 0);
        for (int i = 0; i < n_parity; ++i)
            if (s[i])
                for (int j = 0; j <= sdeg && i + j < n_parity; ++j)
                    if (sigma[j]) omega[i + j] ^= gmul(s[i], sigma[j]);
        std::fill(deriv.begin(), deriv.end(), 0);
        for (int kk = 1; kk <= sdeg; kk += 2) deriv[kk - 1] = sigma[kk];

        std::memcpy(word.data(), r, n);
        bool bad = false;
        for (int e = 0; e < n_err; ++e) {
            int i = err_deg[e];
            uint8_t x = GF.exp[i % ORDER];
            uint8_t x_inv = ginv(x);
            uint8_t ov = poly_eval(omega.data(), n_parity, x_inv);
            uint8_t dv = poly_eval(deriv.data(), sdeg > 0 ? sdeg : 1, x_inv);
            if (dv == 0) { bad = true; break; }
            uint8_t mag = gmul(x, gmul(ov, ginv(dv)));
            if (shift <= i && i <= n - 1 + shift)
                word[n - 1 + shift - i] ^= mag;
        }
        if (bad) continue;

        // residual check
        bool resid = false;
        for (int j = 0; j < n_parity && !resid; ++j) {
            uint8_t acc = 0;
            for (int p = 0; p < n; ++p) {
                if (!word[p]) continue;
                int deg = (n - 1 - p + shift);
                acc ^= gmul(word[p], GF.exp[((long)j * deg) % ORDER]);
            }
            resid = acc != 0;
        }
        if (resid) continue;
        std::memcpy(o, word.data(), k);
        ok[bi] = 1;
    }
    });
}

// Binary BCH(n, k, t) decode of `batch` codewords of n BITS (one byte per
// bit, 0/1). parity_bits = n - k is derived by the caller; out: batch×k bits.
void bch_decode_batch(int n, int k, int t, const uint8_t* in, int batch,
                      uint8_t* out, uint8_t* ok) {
    const int shift = ORDER - n;
    const int cap = t + 2;

    parallel_rows(batch, [=](int row_lo, int row_hi) {
    std::vector<uint8_t> s(2 * t + 1), sigma(cap), word(n);

    for (int bi = row_lo; bi < row_hi; ++bi) {
        const uint8_t* r = in + (size_t)bi * n;
        uint8_t* o = out + (size_t)bi * k;
        for (int i = 0; i < k; ++i) o[i] = r[i] & 1;
        ok[bi] = 0;

        bool any = false;
        for (int j = 1; j <= 2 * t; ++j) {
            uint8_t acc = 0;
            for (int p = 0; p < n; ++p) {
                if (!(r[p] & 1)) continue;
                int deg = (n - 1 - p + shift);
                acc ^= GF.exp[((long)j * deg) % ORDER];
            }
            s[j] = acc;
            any |= acc != 0;
        }
        if (!any) {
            ok[bi] = 1;
            continue;
        }

        std::fill(sigma.begin(), sigma.end(), 0);
        int sdeg = berlekamp_massey(s.data(), t, 1, sigma.data(), cap);
        (void)sdeg;

        for (int i = 0; i < n; ++i) word[i] = r[i] & 1;
        int n_found = 0;
        for (int d = 0; d < ORDER; ++d) {
            uint8_t xinv = GF.exp[(ORDER - d % ORDER) % ORDER];
            if (poly_eval(sigma.data(), cap, xinv) != 0) continue;
            if (shift <= d && d <= n - 1 + shift) {
                int p = n - 1 + shift - d;
                if (p < n) {
                    word[p] ^= 1;
                    ++n_found;
                }
            }
        }

        bool resid = false;
        for (int j = 1; j <= 2 * t && !resid; ++j) {
            uint8_t acc = 0;
            for (int p = 0; p < n; ++p) {
                if (!word[p]) continue;
                int deg = (n - 1 - p + shift);
                acc ^= GF.exp[((long)j * deg) % ORDER];
            }
            resid = acc != 0;
        }
        if (resid || n_found > t) continue;
        for (int i = 0; i < k; ++i) o[i] = word[i];
        ok[bi] = 1;
    }
    });
}

}  // extern "C"
