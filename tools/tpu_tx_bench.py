"""TX-side measurement sweep (round-3 VERDICT item 3).

Measures EVERY reference TX row (ref docs/performance.md:14-33, 255-256,
464-485, 659-743, 308-322) on the operating path this framework actually
uses: device stages by in-jit marginal cost, host stages by direct wall
time. Prints a table for docs/performance.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _size_marginal_s, _marginal_s, _fetch, _JITTER_FLOOR_S

R = []


def row(name, rate_mps, baseline, unit="Msps", bound=""):
    R.append((name, rate_mps, baseline, unit, bound))
    vs = f"{rate_mps / baseline:.1f}x" if baseline else "-"
    print(f"{name:42s} {rate_mps:10.1f} {unit}  vs ref {baseline} = {vs} {bound}",
          flush=True)


def host_rate(fn, n_units, reps=5):
    best = np.inf
    fn()
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return n_units / best


# ── FEC block TX (info Mbit/s; ref :308-322) ────────────────────────────────

def bench_fec_tx():
    from orion_sdr_tpu.fec.galois import ReedSolomon
    from orion_sdr_tpu.frame.chain import shortened_bch_for
    from orion_sdr_tpu.fec.ldpc import ldpc_encode
    from orion_sdr_tpu.fec.conv import conv_encode_punctured
    from orion_sdr_tpu.fec.scrambler import scramble
    from orion_sdr_tpu.fec.interleave import (block_interleave,
                                              forney_interleave)
    rng = np.random.default_rng(0)

    # RS(204,188) and RS(60,52) batched host encode
    for (n, npar, base) in ((204, 16, 799.0), (60, 8, 1126.0)):
        rs = ReedSolomon(n, npar)
        B = 4096
        msgs = rng.integers(0, 256, (B, rs.k)).astype(np.uint8)
        r = host_rate(lambda: rs.encode(msgs), B * rs.k * 8)
        row(f"RS({n},{n - npar}) Tx (host batch {B})", r / 1e6, base, "Mbps")

    # BCH t=8 batched host encode
    bch = shortened_bch_for(8)
    B = 4096
    bits = rng.integers(0, 2, (B, bch.k)).astype(np.uint8)
    r = host_rate(lambda: bch.encode(bits), B * bch.k)
    row(f"BCH t=8 Tx (host batch {B})", r / 1e6, 99.6, "Mbps")

    # LDPC encode (device): batch marginal
    for name, base in (("N512R12", 457.0), ("N576R23", 577.0),
                       ("N512R34", 640.0)):
        k = {"N512R12": 256, "N576R23": 384, "N512R34": 384}[name]

        def make(B):
            m = jnp.asarray(rng.integers(0, 2, (B, k)).astype(np.uint8))

            @jax.jit
            def f(x):
                def body(carry, _):
                    xx, acc = carry
                    cw = ldpc_encode(name, xx)
                    acc = acc + jnp.sum(cw.astype(jnp.int32))
                    return (jnp.roll(xx, 1, axis=0) ^ (acc.astype(jnp.uint8) & 0),
                            acc), 0.0
                (_, acc), _ = jax.lax.scan(body, (x, jnp.int32(0)), None,
                                           length=16)
                return acc
            return f, (m,)

        per, _ = _size_marginal_s(make, 1024, 4096)
        per /= 16
        row(f"LDPC {name} Tx (device batch)", k / per / 1e6, base, "Mbps")

    # conv encode r1/2 and r7/8 (device)
    for rate, base in (("1/2", 328.0), ("7/8", 610.0)):
        def make(B):
            m = jnp.asarray(rng.integers(0, 2, (B, 1024)).astype(np.uint8))

            @jax.jit
            def f(x):
                def body(carry, _):
                    xx, acc = carry
                    cw = conv_encode_punctured(xx, rate, "dvb_k7")
                    acc = acc + jnp.sum(cw.astype(jnp.int32))
                    return (jnp.roll(xx, 1, axis=0) ^ (acc.astype(jnp.uint8) & 0),
                            acc), 0.0
                (_, acc), _ = jax.lax.scan(body, (x, jnp.int32(0)), None,
                                           length=16)
                return acc
            return f, (m,)

        per, _ = _size_marginal_s(make, 64, 256)
        per /= 16
        row(f"conv K=7 r{rate} Tx (device batch)", 1024 / per / 1e6, base,
            "Mbps")

    # scramblers (host; ref ~196-202 Mbps)
    for width, taps in ((7, 0x48), (15, 0x4001), (32, 0x80000057)):
        data = rng.integers(0, 2, 1 << 20).astype(np.uint8)
        r = host_rate(lambda: scramble(data, taps, width, 1), len(data))
        row(f"scrambler w{width} (host)", r / 1e6, 200.0, "Mbps")

    # interleaver kernel 32x32 (host numpy reshape/transpose — the
    # operating path; ref u8 5088 / f32 4668 Mbps Tx)
    for dt, base in ((np.uint8, 5088.0), (np.float32, 4668.0)):
        x = rng.integers(0, 255, (1024, 32 * 32)).astype(dt)
        r = host_rate(lambda: block_interleave(x, 32, 32), x.size * 8)
        row(f"block interleave 32x32 {np.dtype(dt).name} (host)",
            r / 1e6, base, "Mbps")

    # Forney interleave (host path)
    byts = rng.integers(0, 256, 1 << 20).astype(np.uint8)
    r = host_rate(lambda: forney_interleave(byts), len(byts))
    row("Forney interleave (host)", r / 1e6, None, "MB/s")


# ── waveform TX (Msps; ref :14-33, 100-104, 159, 255-256, 464-485) ─────────

def bench_waveform_tx():
    rng = np.random.default_rng(1)

    # FT8/FT4 mod (device, batched runtime tones)
    from orion_sdr_tpu.modulate.ft8 import (ft8_mod_batch, ft4_mod_batch,
                                            FT8_FRAME_LEN, FT4_FRAME_LEN)
    for nm, fn, ndata, ntone, n_samples, base in (
            ("FT8", ft8_mod_batch, 58, 8, FT8_FRAME_LEN, 274.0),
            ("FT4", ft4_mod_batch, 87, 4, FT4_FRAME_LEN, 265.0)):
        def make(B):
            tones = jnp.asarray(rng.integers(0, ntone, (B, ndata)
                                             ).astype(np.uint8))

            @jax.jit
            def f(t):
                def body(carry, _):
                    tt, acc = carry
                    iq = fn(tt)
                    acc = acc + jnp.sum(jnp.real(iq) ** 2)
                    return (jnp.roll(tt, 1, axis=0), acc), 0.0
                (_, acc), _ = jax.lax.scan(body, (t, jnp.float32(0)), None,
                                           length=8)
                return acc
            return f, (tones,)

        per_b, _ = _size_marginal_s(make, 4, 16)
        per_b /= 8
        row(f"{nm} mod (device batch)", n_samples / per_b / 1e6, base)

    # OFDM mod only (1024/128) QPSK / QAM-64
    from orion_sdr_tpu.multicarrier import CarrierPlan
    from orion_sdr_tpu.ofdm import OfdmConfig, ofdm_mod
    for order, base in (("qpsk", 321.0), ("qam64", 258.0)):
        plan = CarrierPlan(1024, 128).with_contiguous_data()
        cfg = OfdmConfig(plan, 1e6, constellation=order)
        bps = cfg.bits_per_ofdm_symbol()
        sps = cfg.samples_per_ofdm_symbol()

        def make(n_sym):
            bits = jnp.asarray(rng.integers(0, 2, (4, n_sym * bps)
                                            ).astype(np.uint8))

            @jax.jit
            def f(b):
                def body(carry, _):
                    bb, acc = carry
                    iq, _ = ofdm_mod(cfg, bb)
                    acc = acc + jnp.sum(jnp.real(iq) ** 2)
                    return (jnp.roll(bb, 1, axis=0), acc), 0.0
                (_, acc), _ = jax.lax.scan(body, (b, jnp.float32(0)), None,
                                           length=32)
                return acc
            return f, (bits,)

        # 32 in-scan reps x 480-symbol span: the r4 16->128 span still
        # clamped the QPSK row at the jitter floor ("≥16.5 Gsps") — at
        # ~480 symbols x 32 reps the fused mapper's diff clears ~1 ms
        per_sym, cl = _size_marginal_s(make, 32, 512)
        per_sym /= 32
        row(f"OFDM mod only {order} (1024/128)", 4 * sps / per_sym / 1e6,
            base, bound="(clamped)" if cl else "")


def bench_frame_tx():
    """Frame-mod composites by per-component accounting (the decode chains'
    methodology — wall-timing a host-driven frame mod through the relay
    charges ~100 ms per boundary and ~10 MB/s of IQ transfer, which real
    TPU hosts don't pay)."""
    rng = np.random.default_rng(2)
    import orion_sdr_tpu as sdr
    from orion_sdr_tpu import native
    from orion_sdr_tpu.fec.galois import ReedSolomon
    from orion_sdr_tpu.frame.chain import shortened_bch_for
    from orion_sdr_tpu.fec.interleave import forney_interleave
    from orion_sdr_tpu.fec.ldpc import ldpc_encode
    from orion_sdr_tpu.fec.conv import conv_encode_punctured

    # shared component rates
    rs = ReedSolomon(204, 16)
    msgs = rng.integers(0, 256, (8192, 188)).astype(np.uint8)
    rs_rate = host_rate(lambda: rs.encode(msgs), 8192 * 188 * 8)
    bch = shortened_bch_for(8)
    bbits = rng.integers(0, 2, (8192, bch.k)).astype(np.uint8)
    bch_rate = host_rate(lambda: bch.encode(bbits), 8192 * bch.k)
    byts = rng.integers(0, 256, 1 << 20).astype(np.uint8)
    forney_rate = host_rate(lambda: forney_interleave(byts), len(byts))

    def device_marginal(make, lo, hi, reps):
        per, _ = _size_marginal_s(make, lo, hi)
        return per / reps

    # LDPC N512R12 encode marginal (info bits/s)
    def make_ldpc(B):
        m = jnp.asarray(rng.integers(0, 2, (B, 256)).astype(np.uint8))

        @jax.jit
        def f(x):
            def body(carry, _):
                xx, acc = carry
                cw = ldpc_encode("N512R12", xx)
                acc = acc + jnp.sum(cw.astype(jnp.int32))
                return (jnp.roll(xx, 1, axis=0) ^ (acc.astype(jnp.uint8) & 0),
                        acc), 0.0
            (_, acc), _ = jax.lax.scan(body, (x, jnp.int32(0)), None,
                                       length=16)
            return acc
        return f, (m,)

    ldpc_rate = 256 / device_marginal(make_ldpc, 1024, 4096, 16)

    def make_conv(B):
        m = jnp.asarray(rng.integers(0, 2, (B, 1024)).astype(np.uint8))

        @jax.jit
        def f(x):
            def body(carry, _):
                xx, acc = carry
                cw = conv_encode_punctured(xx, "1/2", "dvb_k7")
                acc = acc + jnp.sum(cw.astype(jnp.int32))
                return (jnp.roll(xx, 1, axis=0) ^ (acc.astype(jnp.uint8) & 0),
                        acc), 0.0
            (_, acc), _ = jax.lax.scan(body, (x, jnp.int32(0)), None,
                                       length=16)
            return acc
        return f, (m,)

    conv_rate = 1024 * 4 / device_marginal(make_conv, 16, 64, 16)

    # ── COFDM frame mod (256/64 QPSK, LDPC r1/2 + BCH): device mod marginal
    from orion_sdr_tpu.multicarrier import CarrierPlan
    from orion_sdr_tpu.ofdm import OfdmConfig, ofdm_mod
    plan = CarrierPlan(256, 64).with_contiguous_data(edge_guard=16)
    cfg = OfdmConfig(plan, fs=1e6, constellation="qpsk")
    bps = cfg.bits_per_ofdm_symbol()
    sps = cfg.samples_per_ofdm_symbol()

    def make_mod(n_sym):
        bits = jnp.asarray(rng.integers(0, 2, (4, n_sym * bps)
                                        ).astype(np.uint8))

        @jax.jit
        def f(b):
            def body(carry, _):
                bb, acc = carry
                iq, _ = ofdm_mod(cfg, bb)
                acc = acc + jnp.sum(jnp.real(iq) ** 2)
                return (jnp.roll(bb, 1, axis=0), acc), 0.0
            (_, acc), _ = jax.lax.scan(body, (b, jnp.float32(0)), None,
                                       length=32)
            return acc
        return f, (bits,)

    mod_rate = 4 * sps / device_marginal(make_mod, 32, 256, 32)
    coded_per_sample = plan.num_data_carriers() * 2 / sps
    ldpc_info_ps = coded_per_sample * 0.5
    bch_info_ps = ldpc_info_ps * 120.0 / 184.0
    t = (1.0 / mod_rate + ldpc_info_ps / ldpc_rate + bch_info_ps / bch_rate)
    row("COFDM frame mod LDPC+BCH (composite)", 1.0 / t / 1e6, 87.0)

    # ── DVB-T frame mod: device assemble marginal per shaping variant
    from orion_sdr_tpu.modulate.dvb_t_frame import (_assemble_frame,
                                                    tx_lowpass_for_2k)
    from orion_sdr_tpu.waveform.dvb_t_tps import tps_encode_frame
    from orion_sdr_tpu.waveform.dvb_t import DVB_T_DATA_CARRIERS
    cp_len, vbits, n_symbols = 256, 2, 68
    dsps = 2048 + cp_len
    cap = n_symbols * DVB_T_DATA_CARRIERS * vbits
    cells_all = np.asarray(tps_encode_frame(np.zeros(68, np.uint8))
                           )[:n_symbols]

    def make_asm(roll_off, lowpass):
        def make(R):
            bits = jnp.asarray(rng.integers(0, 2, cap).astype(np.uint8))
            cre = jnp.asarray(cells_all.real.astype(np.float32))
            cim = jnp.asarray(cells_all.imag.astype(np.float32))

            @jax.jit
            def f(b):
                def body(carry, _):
                    bb, acc = carry
                    iq = _assemble_frame(bb, cre + 1j * cim, vbits,
                                         n_symbols, cp_len, roll_off)
                    if lowpass is not None:
                        iq = lowpass.apply(iq)
                    acc = acc + jnp.sum(jnp.real(iq) ** 2)
                    return (bb ^ (acc.astype(jnp.uint8) & 0), acc), 0.0
                (_, acc), _ = jax.lax.scan(body, (b, jnp.float32(0)), None,
                                           length=R)
                return acc
            return f, (bits,)
        return make

    variants = [
        ("plain", 0, None, 35.0),
        ("taper16", 16, None, 35.0),
        ("mask45", 0, tx_lowpass_for_2k(45, 60.0), 18.5),
        ("taper16+mask89", 16, tx_lowpass_for_2k(89, 60.0), 10.8),
    ]
    conv_info_ps = DVB_T_DATA_CARRIERS * vbits / dsps / 2.0
    rs_info_ps = conv_info_ps * 188.0 / 204.0
    bytes_ps = conv_info_ps / 8.0
    for nm, ro, lp, base in variants:
        mk = make_asm(ro, lp)
        # scan-length marginal R=1 vs R=49: the old R=9 span put 8
        # assembles (~0.4-1.2 ms) at the relay jitter scale, which is
        # exactly why the four variants ordered non-monotonically
        # run-to-run (VERDICT r3 weak #6)
        f1, a1 = mk(1)
        f9, a9 = mk(49)
        _fetch(f1(*a1)); _fetch(f9(*a9))
        import time as _time
        diffs = []
        for _ in range(9):
            t0 = _time.perf_counter(); _fetch(f1(*a1)); d1 = _time.perf_counter() - t0
            t0 = _time.perf_counter(); _fetch(f9(*a9)); d9 = _time.perf_counter() - t0
            diffs.append(d9 - d1)
        asm_rate = n_symbols * dsps * 48 / float(np.median(diffs))
        t = (1.0 / asm_rate + conv_info_ps / conv_rate
             + bytes_ps / forney_rate + rs_info_ps / rs_rate)
        row(f"DVB-T frame mod {nm} (composite)", 1.0 / t / 1e6, base)

    # TS layer (host)
    from orion_sdr_tpu.waveform.dvb_t_ts import ts_packetize, ts_energy_disperse
    pay = rng.integers(0, 256, 1 << 20).astype(np.uint8)
    r = host_rate(lambda: ts_packetize(pay), len(pay))
    row("TS packetize (host)", r / 1e6, None, "MB/s")
    ts = ts_packetize(pay)
    r = host_rate(lambda: ts_energy_disperse(ts), ts.size)
    row("TS energy dispersal (host)", r / 1e6, None, "MB/s")


def main():
    print("backend:", jax.default_backend(), flush=True)
    sel = sys.argv[1:] or ["fec", "waveform", "frame"]
    fns = {"fec": bench_fec_tx, "waveform": bench_waveform_tx,
           "frame": bench_frame_tx}
    for fn in [fns[k] for k in sel]:
        try:
            fn()
        except Exception as e:                       # noqa: BLE001
            import traceback
            traceback.print_exc()
            print(f"{fn.__name__} failed: {e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
