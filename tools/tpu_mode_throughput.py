"""Chip throughput rows for the round-3 mode-family device programs.

Measures the new device programs (PFB channelizer, CSS dechirp, WSPR
spectrogram + energy grid, FM stereo/RDS composite, the shared 2-FSK
decision engine) by in-jit scan marginal cost (`bench._marginal_s`) on the
real chip. These modes are beyond the reference's set, so rows are
absolute rates (Msps of input samples), not ratios.

    python tools/tpu_mode_throughput.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _marginal_s, _JITTER_FLOOR_S


def row(name, n_samples, per_s):
    clamped = per_s < _JITTER_FLOOR_S
    rate = n_samples / max(per_s, _JITTER_FLOOR_S) / 1e6
    print(f"{name:44s} {rate:9.0f} Msps"
          f" (marginal {per_s * 1e3:.2f} ms{' — CLAMPED, lower bound' if clamped else ''})",
          flush=True)


def bench_pfb():
    from orion_sdr_tpu.dsp.pfb import pfb_prototype, _pfb_run
    C, n = 64, 1 << 20
    proto = jnp.asarray(pfb_prototype(C))
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    im = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def make():
        def body(carry):
            r, i, acc = carry
            y = _pfb_run(r + 1j * i, proto, C)
            acc = acc + jnp.sum(jnp.abs(y))
            return (jnp.roll(r, 1) + 1e-12 * acc, jnp.roll(i, 1), acc)
        return body, (re, im, jnp.float32(0))

    row(f"PFB channelizer (C={C}, P=12, 1M)", n, _marginal_s(make, n_long=9))


def bench_css():
    from orion_sdr_tpu.demodulate.css import _dechirp_fft, _base
    sf, bw = 9, 125_000.0
    spsym, m, n_sym = 1 << sf, 1 << sf, 128
    n = n_sym * spsym
    up_re, up_im = _base(sf, bw, bw)
    rng = np.random.default_rng(1)
    re = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    im = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    ur, ui = jnp.asarray(up_re), jnp.asarray(up_im)

    def make():
        def body(carry):
            r, i, acc = carry
            mag = _dechirp_fft(r + 1j * i, ur, ui, n_sym, spsym, m)
            acc = acc + jnp.sum(mag)
            return (jnp.roll(r, 1) + 1e-12 * acc, jnp.roll(i, 1), acc)
        return body, (re, im, jnp.float32(0))

    row(f"CSS dechirp+FFT (SF{sf}, {n_sym} sym)", n,
        _marginal_s(make, n_long=9))


def bench_wspr():
    from orion_sdr_tpu.demodulate.wspr import _spectrogram, _energy_grid
    from orion_sdr_tpu.codec.wspr import WSPR_SPS, WSPR_SYMBOLS, WSPR_FS
    n = WSPR_SYMBOLS * WSPR_SPS + 4 * WSPR_SPS
    hop = WSPR_SPS // 4
    n_hops = (n - WSPR_SPS) // hop
    rng = np.random.default_rng(2)
    re = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    im = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def make_spec():
        def body(carry):
            r, i, acc = carry
            s = _spectrogram(r, i, n_hops, hop)
            acc = acc + jnp.sum(s)
            return (jnp.roll(r, 1) + 1e-12 * acc, jnp.roll(i, 1), acc)
        return body, (re, im, jnp.float32(0))

    row(f"WSPR band spectrogram ({n_hops} hops)", n,
        _marginal_s(make_spec, n_long=9))

    dts = tuple(int(d) for d in np.arange(-4, 5) * (WSPR_SPS // 8))
    dfs = np.linspace(-2.0, 2.0, 7)

    def make_grid():
        def body(carry):
            r, i, acc = carry
            g = _energy_grid.__wrapped__(r, i, dts, dfs, WSPR_FS, 1500.0)
            acc = acc + jnp.sum(g)
            return (jnp.roll(r, 1) + 1e-12 * acc, jnp.roll(i, 1), acc)
        return body, (re, im, jnp.float32(0))

    row("WSPR energy grid (7 df x 9 dt)", n, _marginal_s(make_grid, n_long=9))


def bench_stereo():
    from orion_sdr_tpu.demodulate.fm_stereo import _stereo_device
    fs, n = 240_000.0, 1 << 17
    rng = np.random.default_rng(3)
    re = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    im = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def make():
        def body(carry):
            r, i, acc = carry
            mono, sub, pil, rbb = _stereo_device(r, i, fs, 75e3, 15e3,
                                                 0.45, True)
            acc = acc + jnp.sum(mono) + jnp.sum(sub) + jnp.sum(rbb) \
                + jnp.sum(pil)
            return (jnp.roll(r, 1) + 1e-12 * acc, jnp.roll(i, 1), acc)
        return body, (re, im, jnp.float32(0))

    row("FM stereo+RDS composite (240k, 128k)", n,
        _marginal_s(make, n_long=9))


def bench_fsk2():
    from orion_sdr_tpu.demodulate.afsk import fsk2_decision
    fs, n, B = 48_000.0, 1 << 18, 4
    sps = int(fs / 1200.0)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))

    def make():
        def body(carry):
            xx, acc = carry
            d = fsk2_decision(xx, fs, sps)
            acc = acc + jnp.sum(d)
            return (jnp.roll(xx, 1, axis=0) + 1e-12 * acc, acc)
        return body, (x, jnp.float32(0))

    row(f"2-FSK decision engine ({B}ch x 256k)", B * n,
        _marginal_s(make, n_long=9))


def _fetch(x):
    return float(jnp.sum(jnp.asarray(x)))


def bench_gnss():
    from orion_sdr_tpu.gnss import _acquire_grid, _ca_pm_sampled

    fs, n_blocks, n_prn = 2_048_000.0, 4, 32
    spms = 2048
    codes = jnp.asarray(np.stack([_ca_pm_sampled(p, fs)
                                  for p in range(1, n_prn + 1)]))
    dopp = jnp.asarray(np.arange(-5000.0, 5001.0, 250.0, np.float32))
    n = (n_blocks + 1) * spms
    rng = np.random.default_rng(5)
    re = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    im = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def make():
        def body(carry):
            r, i, acc = carry
            g = _acquire_grid(r + 1j * i, codes, dopp, fs, n_blocks)
            acc = acc + jnp.sum(g)
            return (jnp.roll(r, 1) + 1e-12 * acc, jnp.roll(i, 1), acc)
        return body, (re, im, jnp.float32(0))

    # cells searched per program: PRNs x dopplers x code phases
    cells = n_prn * dopp.shape[0] * spms
    per = _marginal_s(make, n_long=9)
    row(f"GNSS acquisition grid ({n_prn} PRN x 41 dopp)", cells, per)


def bench_burst():
    from orion_sdr_tpu.modulate.digital import rrc_taps
    from orion_sdr_tpu.dsp.fir import fir_filter_aligned
    from orion_sdr_tpu.demodulate.digital import _dd_pll_kernel

    sps, n_sym, B = 8, 2048, 4
    n = n_sym * sps
    taps = rrc_taps(sps, 0.35, 8)
    rng = np.random.default_rng(6)
    re = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))

    def make():
        def body(carry):
            r, i, acc = carry
            zf = fir_filter_aligned(r + 1j * i, taps)
            grid = zf[..., : n_sym * sps].reshape(B, n_sym, sps)
            e = jnp.mean(jnp.abs(grid) ** 2, axis=1)
            ph = jnp.argmax(e, axis=-1)
            syms = jnp.take_along_axis(
                grid, ph[:, None, None], axis=-1)[..., 0]
            y = jax.vmap(lambda s: _dd_pll_kernel.__wrapped__(
                s.real, s.imag, "qam16", 0.03))(syms)
            acc = acc + jnp.sum(jnp.abs(y))
            return (jnp.roll(r, 1, axis=0) + 1e-12 * acc,
                    jnp.roll(i, 1, axis=0), acc)
        return body, (re, im, jnp.float32(0))

    row(f"burst modem RRC+timing+DD-PLL ({B}ch x {n_sym} sym)", B * n,
        _marginal_s(make, n_long=9))


def bench_hier_rx():
    from orion_sdr_tpu.demodulate.dvb_t_frame import _receive_frame_body

    cp_len, vbits, alpha, B = 256, 4, 2, 2
    sps = 2048 + cp_len
    rng = np.random.default_rng(7)

    def make(n_symbols):
        nn = n_symbols * sps
        re = jnp.asarray(rng.standard_normal((B, nn)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((B, nn)).astype(np.float32))

        @jax.jit
        def f(r, i):
            llrs, cells = _receive_frame_body(r + 1j * i, n_symbols,
                                              cp_len, 0, vbits, alpha)
            return jnp.sum(llrs) + jnp.sum(jnp.abs(cells))
        return f, (re, im)

    # size-marginal over n_symbols: a scan around the fused receive
    # crashes the relay worker (CLAUDE.md), and B-marginals below 8 are
    # invisible under sublane padding
    lo, hi = 68, 612
    fs_, args_s = make(lo)
    fb_, args_b = make(hi)
    _fetch(fs_(*args_s))
    _fetch(fb_(*args_b))
    ds, db = [], []
    for _ in range(9):
        t0 = time.perf_counter()
        _fetch(fs_(*args_s))
        ds.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _fetch(fb_(*args_b))
        db.append(time.perf_counter() - t0)
    d = float(np.median(db)) - float(np.median(ds))
    row(f"hier DVB-T receive (a=2 16QAM, B={B})",
        B * (hi - lo) * sps, max(d, 0.0))


if __name__ == "__main__":
    t0 = time.time()
    s = float(jnp.sum(jnp.ones((64, 64), jnp.float32)))
    print(f"relay probe: {s} in {time.time() - t0:.1f}s "
          f"(backend {jax.default_backend()})", flush=True)
    only = sys.argv[1:] or None
    for nm, fn in [("pfb", bench_pfb), ("css", bench_css),
                   ("wspr", bench_wspr), ("stereo", bench_stereo),
                   ("fsk2", bench_fsk2), ("gnss", bench_gnss),
                   ("burst", bench_burst), ("hier", bench_hier_rx)]:
        if only and nm not in only:
            continue
        try:
            fn()
        except Exception as e:                             # noqa: BLE001
            print(f"{nm}: ERROR {e}", flush=True)
    print("DONE", flush=True)
