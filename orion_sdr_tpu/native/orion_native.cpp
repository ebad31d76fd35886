// Native batch decoders for the byte/bit-domain algebraic codes
// (GF(2^8) Reed-Solomon and binary BCH) — the host-side hot loops of the
// DVB-T/COFDM receive chains. Mirrors orion_sdr_tpu/fec/galois.py exactly
// (behavioral spec: reference src/fec/{gf,bch,reed_solomon}.rs): primitive
// polynomial 0x11D, RS FCR = 0, BCH syndromes α^1..α^2t, shortened codes at
// the high end of the 255-frame. Per-codeword decode is sequential
// (BM + Chien + Forney); the batch loop is the parallel axis.
//
// Perf layout (v2): every hot loop is branchless table algebra over a
// 64 KB full GF multiplication table — syndromes run Horner with a per-root
// row pointer (acc = MUL[α^j][acc] ^ r[p]; 2 L1 ops/byte, no modulo, no
// zero-test), the Chien search steps per-coefficient rows instead of
// re-evaluating σ, and binary-BCH even syndromes come from S_{2j} = S_j²
// (frobenius), halving the syndrome work. The v1 code computed
// exp[(j·deg) % 255] per nonzero byte — an integer divide in the innermost
// loop, which measured BELOW the reference's single-core Rust.
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
// free parallel axis — a no-op on a 1-core host.) Small batches stay
// single-threaded: spawn cost would dominate.
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
    // full multiplication table: MUL[a][b] = a·b in GF(2^8). 64 KB; the hot
    // loops touch only the ~2t rows MUL[α^j], which stay L1-resident.
    uint8_t mul[256][256];
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
        for (int a = 0; a < 256; ++a) {
            mul[0][a] = mul[a][0] = 0;
        }
        for (int a = 1; a < 256; ++a)
            for (int b = 1; b < 256; ++b)
                mul[a][b] = exp[log[a] + log[b]];
    }
};
const Tables GF;

inline uint8_t gmul(uint8_t a, uint8_t b) { return GF.mul[a][b]; }

inline uint8_t ginv(uint8_t a) { return GF.exp[ORDER - GF.log[a]]; }

// row pointer for multiply-by-constant: y = MROW(c)[x]
inline const uint8_t* MROW(uint8_t c) { return GF.mul[c]; }

// α^e for any non-negative e
inline uint8_t apow(long e) { return GF.exp[e % ORDER]; }

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
            delta ^= gmul(sigma[i], s[n - i]);
        bool cond = start == 1 ? (2 * l < n) : (2 * l <= n);
        if (delta == 0) {
            ++m;
        } else if (cond) {
            tmp = sigma;
            const uint8_t* md = MROW((uint8_t)delta);
            for (int i = 0; i + m < cap; ++i) sigma[i + m] ^= md[b[i]];
            l = start == 1 ? (n - l) : (n + 1 - l);
            const uint8_t* mi = MROW(ginv((uint8_t)delta));
            for (int i = 0; i < cap; ++i) b[i] = mi[tmp[i]];
            m = 1;
        } else {
            const uint8_t* md = MROW((uint8_t)delta);
            for (int i = 0; i + m < cap; ++i) sigma[i + m] ^= md[b[i]];
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
    const uint8_t* mx = MROW(x);
    for (int i = len - 1; i >= 0; --i) acc = (uint8_t)(mx[acc] ^ p[i]);
    return acc;
}

// S_j = Σ_p r[p]·α^{j·deg(p)}, deg(p) = n-1-p+shift — as Horner with the
// MUL[α^j] row (branchless, 2 L1 loads/byte) then one α^{j·shift} twist.
// All 2t accumulator chains advance interleaved in ONE pass over the bytes:
// a single Horner chain is a serial string of dependent L1 loads
// (latency-bound at ~5 cycles/byte); 2t independent chains pipeline to the
// load-port limit instead.
constexpr int MAX_SYN = 64;

void rs_syndromes_all(const uint8_t* r, int n, int shift, int n_parity,
                      uint8_t* s) {
    uint8_t acc[MAX_SYN] = {0};
    const uint8_t* rows[MAX_SYN];
    for (int j = 0; j < n_parity; ++j) rows[j] = MROW(apow(j));
    for (int p = 0; p < n; ++p) {
        uint8_t rp = r[p];
        for (int j = 0; j < n_parity; ++j)
            acc[j] = (uint8_t)(rows[j][acc[j]] ^ rp);
    }
    for (int j = 0; j < n_parity; ++j)
        s[j] = gmul(acc[j], apow((long)j * shift));
}

// binary-input variant (bits 0/1 in bytes); computes the ODD syndromes
// s[1], s[3], … s[2t-1] only (evens are frobenius squares of these).
// Bit-sliced for t ≤ 8: the 8 odd syndromes pack into ONE uint64 word per
// position (byte i of W64[p] = α^{(2i+1)·deg(p)}), so the whole syndrome
// pass is one branchless masked-XOR per bit — S_j = Σ_p bit_p·α^{j·deg(p)}
// needs no Horner and no shift twist.
void bch_syndromes_odd(const uint8_t* r, int n, int shift, int t,
                       uint8_t* s, const uint64_t* w64) {
    if (t <= 8 && w64) {
        uint64_t acc = 0;
        for (int p = 0; p < n; ++p)
            acc ^= w64[p] & (uint64_t)(-(int64_t)(r[p] & 1));
        for (int i = 0; i < t; ++i)
            s[2 * i + 1] = (uint8_t)(acc >> (8 * i));
        return;
    }
    uint8_t accs[MAX_SYN] = {0};
    const uint8_t* rows[MAX_SYN];
    for (int i = 0; i < t; ++i) rows[i] = MROW(apow(2 * i + 1));
    for (int p = 0; p < n; ++p) {
        uint8_t rp = (uint8_t)(r[p] & 1);
        for (int i = 0; i < t; ++i)
            accs[i] = (uint8_t)(rows[i][accs[i]] ^ rp);
    }
    for (int i = 0; i < t; ++i) {
        int j = 2 * i + 1;
        s[j] = gmul(accs[i], apow((long)j * shift));
    }
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

    // fixed-size fast-path buffers (acc[MAX_SYN], ch[4][40]) bound the
    // supported code sizes; the Python wrapper falls back to numpy beyond
    if (n_parity > MAX_SYN || t + 2 > 40) {
        for (int bi = 0; bi < batch; ++bi) {
            std::memcpy(out + (size_t)bi * k, in + (size_t)bi * n, k);
            ok[bi] = 0;
        }
        return;
    }

    parallel_rows(batch, [=](int row_lo, int row_hi) {
    std::vector<uint8_t> s(n_parity), sigma(cap), omega(n_parity),
        deriv(cap), word(n);

    for (int bi = row_lo; bi < row_hi; ++bi) {
        const uint8_t* r = in + (size_t)bi * n;
        uint8_t* o = out + (size_t)bi * k;
        std::memcpy(o, r, k);
        ok[bi] = 0;

        rs_syndromes_all(r, n, shift, n_parity, s.data());
        bool any = false;
        for (int j = 0; j < n_parity; ++j) any |= s[j] != 0;
        if (!any) {
            ok[bi] = 1;
            continue;
        }

        std::fill(sigma.begin(), sigma.end(), 0);
        int sdeg = berlekamp_massey(s.data(), t, 0, sigma.data(), cap);
        if (sdeg > t) continue;

        // Chien restricted to the valid degree window [shift, n-1+shift]
        // (roots below it can't be corrected and fail the count either
        // way), stepping σ's terms c_m = σ_m·α^{-m·i} with FOUR independent
        // interleaved chains (strides of 4 positions) — one chain is a
        // serial string of dependent L1 loads; four pipeline. Early exit
        // once all sdeg roots are found (a degree-sdeg σ has no more).
        int err_deg[64];
        int n_err = 0;
        uint8_t ch[4][40];
        for (int kk = 0; kk < 4; ++kk)
            for (int m = 0; m <= sdeg; ++m)
                ch[kk][m] = gmul(sigma[m], apow((long)(ORDER - m) *
                                                (shift + kk) % ORDER));
        const uint8_t* step[40];
        for (int m = 1; m <= sdeg; ++m)
            step[m] = MROW(apow((long)(ORDER - m) * 4 % ORDER));
        bool over = false;
        for (int i = shift; i < ORDER && n_err < sdeg; i += 4) {
            uint8_t v0 = 0, v1 = 0, v2 = 0, v3 = 0;
            for (int m = 0; m <= sdeg; ++m) {
                v0 ^= ch[0][m];
                v1 ^= ch[1][m];
                v2 ^= ch[2][m];
                v3 ^= ch[3][m];
            }
            const uint8_t vs[4] = {v0, v1, v2, v3};
            for (int kk = 0; kk < 4; ++kk)
                if (vs[kk] == 0 && i + kk < ORDER) {
                    if (n_err >= sdeg) { over = true; break; }
                    err_deg[n_err++] = i + kk;
                }
            for (int m = 1; m <= sdeg; ++m) {
                const uint8_t* sm = step[m];
                ch[0][m] = sm[ch[0][m]];
                ch[1][m] = sm[ch[1][m]];
                ch[2][m] = sm[ch[2][m]];
                ch[3][m] = sm[ch[3][m]];
            }
        }
        if (over || n_err != sdeg) continue;

        // Forney: Ω = S·σ mod x^(2t); σ' = odd terms
        std::fill(omega.begin(), omega.end(), 0);
        for (int i = 0; i < n_parity; ++i)
            if (s[i]) {
                const uint8_t* ms = MROW(s[i]);
                for (int j = 0; j <= sdeg && i + j < n_parity; ++j)
                    omega[i + j] ^= ms[sigma[j]];
            }
        std::fill(deriv.begin(), deriv.end(), 0);
        for (int kk = 1; kk <= sdeg; kk += 2) deriv[kk - 1] = sigma[kk];

        std::memcpy(word.data(), r, n);
        bool bad = false;
        for (int e = 0; e < n_err; ++e) {
            int i = err_deg[e];
            uint8_t x = apow(i);
            uint8_t x_inv = ginv(x);
            uint8_t ov = poly_eval(omega.data(), n_parity, x_inv);
            uint8_t dv = poly_eval(deriv.data(), sdeg > 0 ? sdeg : 1, x_inv);
            if (dv == 0) { bad = true; break; }
            uint8_t mag = gmul(x, gmul(ov, ginv(dv)));
            if (shift <= i && i <= n - 1 + shift)
                word[n - 1 + shift - i] ^= mag;
        }
        if (bad) continue;

        // residual check on the corrected word
        rs_syndromes_all(word.data(), n, shift, n_parity, s.data());
        bool resid = false;
        for (int j = 0; j < n_parity; ++j) resid |= s[j] != 0;
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

    // bit-sliced syndrome table (t <= 8): byte i of w64[p] = α^{(2i+1)·deg(p)}
    std::vector<uint64_t> w64;
    if (t <= 8) {
        w64.resize(n);
        for (int p = 0; p < n; ++p) {
            long deg = n - 1 - p + shift;
            uint64_t w = 0;
            for (int i = 0; i < t; ++i)
                w |= (uint64_t)apow((long)(2 * i + 1) * deg) << (8 * i);
            w64[p] = w;
        }
    }
    const uint64_t* w64p = w64.empty() ? nullptr : w64.data();

    if (2 * t + 1 > MAX_SYN || cap > 40) {
        for (int bi = 0; bi < batch; ++bi) {
            for (int i = 0; i < k; ++i)
                out[(size_t)bi * k + i] = in[(size_t)bi * n + i] & 1;
            ok[bi] = 0;
        }
        return;
    }

    parallel_rows(batch, [=](int row_lo, int row_hi) {
    std::vector<uint8_t> s(2 * t + 1), sigma(cap), word(n);

    for (int bi = row_lo; bi < row_hi; ++bi) {
        const uint8_t* r = in + (size_t)bi * n;
        uint8_t* o = out + (size_t)bi * k;
        for (int i = 0; i < k; ++i) o[i] = r[i] & 1;
        ok[bi] = 0;

        // odd syndromes (bit-sliced); even by frobenius S_{2j} = S_j²
        bch_syndromes_odd(r, n, shift, t, s.data(), w64p);
        bool any = false;
        for (int j = 1; j <= 2 * t; j += 2) any |= s[j] != 0;
        for (int j = 2; j <= 2 * t; j += 2) {
            s[j] = gmul(s[j / 2], s[j / 2]);
            any |= s[j] != 0;
        }
        if (!any) {
            ok[bi] = 1;
            continue;
        }

        std::fill(sigma.begin(), sigma.end(), 0);
        int sdeg = berlekamp_massey(s.data(), t, 1, sigma.data(), cap);

        for (int i = 0; i < n; ++i) word[i] = r[i] & 1;
        // Chien over the valid window only, 4 interleaved stride chains
        // (see the RS decoder above), early exit at sdeg roots.
        int n_found = 0;
        uint8_t ch[4][40];
        for (int kk = 0; kk < 4; ++kk)
            for (int m = 0; m < cap; ++m)
                ch[kk][m] = gmul(sigma[m], apow((long)(ORDER - m) *
                                                (shift + kk) % ORDER));
        const uint8_t* step[40];
        for (int m = 1; m < cap; ++m)
            step[m] = MROW(apow((long)(ORDER - m) * 4 % ORDER));
        for (int d = shift; d < ORDER && n_found < sdeg; d += 4) {
            uint8_t v0 = 0, v1 = 0, v2 = 0, v3 = 0;
            for (int m = 0; m < cap; ++m) {
                v0 ^= ch[0][m];
                v1 ^= ch[1][m];
                v2 ^= ch[2][m];
                v3 ^= ch[3][m];
            }
            const uint8_t vs[4] = {v0, v1, v2, v3};
            for (int kk = 0; kk < 4; ++kk)
                if (vs[kk] == 0 && d + kk <= n - 1 + shift) {
                    int p = n - 1 + shift - (d + kk);
                    if (p >= 0 && p < n) {
                        word[p] ^= 1;
                        ++n_found;
                    }
                }
            for (int m = 1; m < cap; ++m) {
                const uint8_t* sm = step[m];
                ch[0][m] = sm[ch[0][m]];
                ch[1][m] = sm[ch[1][m]];
                ch[2][m] = sm[ch[2][m]];
                ch[3][m] = sm[ch[3][m]];
            }
        }

        // odd syndromes zero ⟺ all zero (evens are frobenius squares)
        bch_syndromes_odd(word.data(), n, shift, t, s.data(), w64p);
        bool resid = false;
        for (int j = 1; j <= 2 * t; j += 2) resid |= s[j] != 0;
        if (resid || n_found > t) continue;
        for (int i = 0; i < k; ++i) o[i] = word[i];
        ok[bi] = 1;
    }
    });
}

}  // extern "C"
