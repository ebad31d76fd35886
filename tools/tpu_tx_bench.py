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

        per = _size_marginal_s(make, 1024, 4096) / 16
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

        per = _size_marginal_s(make, 64, 256) / 16
        row(f"conv K=7 r{rate} Tx (device batch)", 1024 / per / 1e6, base,
            "Mbps")

    # scramblers (host; ref ~196-202 Mbps)
    for width, taps in ((7, 0x48), (15, 0x4001), (32, 0x80000057)):
        data = rng.integers(0, 2, 1 << 20).astype(np.uint8)
        r = host_rate(lambda: scramble(data, taps, width, 1), len(data))
        row(f"scrambler w{width} (host)", r / 1e6, 200.0, "Mbps")

    # interleaver kernel 32x32 (ref u8 5088 / f32 4668 Mbps Tx)
    for dt, base in ((np.uint8, 5088.0), (np.float32, 4668.0)):
        x = rng.integers(0, 255, 1 << 20).astype(dt)

        def make(B):
            xx = jnp.asarray(np.tile(x, (B, 1)))

            @jax.jit
            def f(v):
                def body(carry, _):
                    vv, acc = carry
                    y = block_interleave(vv.reshape(B, -1, 32 * 32
                                                    ).reshape(-1, 32 * 32),
                                         32, 32)
                    acc = acc + jnp.sum(y.astype(jnp.float32))
                    return (vv, acc), 0.0
                (_, acc), _ = jax.lax.scan(body, (v, jnp.float32(0)), None,
                                           length=8)
                return acc
            return f, (xx,)

        per = _size_marginal_s(make, 1, 4) / 8
        row(f"block interleave 32x32 {np.dtype(dt).name} (device)",
            (1 << 20) * 8 / per / 1e6 / 8, base, "Mbps")

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

        per_b = _size_marginal_s(make, 4, 16) / 8
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
                                           length=8)
                return acc
            return f, (bits,)

        per_sym = _size_marginal_s(make, 16, 64) / 8
        row(f"OFDM mod only {order} (1024/128)", 4 * sps / per_sym / 1e6,
            base)


def bench_frame_tx():
    rng = np.random.default_rng(2)

    # COFDM frame mod (host chain + device mod composite; ref ~87 Msps)
    import orion_sdr_tpu as sdr
    from orion_sdr_tpu.multicarrier import CarrierPlan
    from orion_sdr_tpu.ofdm import OfdmConfig
    from orion_sdr_tpu.frame.modulator import OfdmFrameMod
    from orion_sdr_tpu.sync.ofdm_sync import OfdmPreamble

    plan = CarrierPlan(256, 64).with_contiguous_data(edge_guard=16)
    cfg = OfdmConfig(plan, fs=1e6, constellation="qpsk")
    table = sdr.McsTable.default_ladder()
    pre = OfdmPreamble(repeat_len=128, num_repeats=4
                       ).with_training_symbol(256, 64)
    mod = OfdmFrameMod(cfg, table, pre)
    payload = rng.integers(0, 256, 8192).astype(np.uint8)
    pkt = sdr.FramePacket(sdr.FrameMetadata(1, 1), payload)
    iq = np.asarray(mod.modulate_frame(pkt, 1))
    n = len(iq)
    r = host_rate(lambda: np.asarray(mod.modulate_frame(pkt, 1)), n, reps=4)
    row("COFDM frame mod LDPC+BCH (composite)", r / 1e6, 87.0)

    mcs_rs = None
    for idx in range(16):
        m = table.get(idx)
        if m is not None and m.outer_fec.kind == "rs" \
                and m.inner_fec.kind == "conv":
            mcs_rs = idx
            break
    if mcs_rs is not None:
        iq = np.asarray(mod.modulate_frame(pkt, mcs_rs))
        n = len(iq)
        r = host_rate(lambda: np.asarray(mod.modulate_frame(pkt, mcs_rs)), n,
                      reps=4)
        row("COFDM frame mod Conv+RS (composite)", r / 1e6, 97.0)

    # DVB-T frame mod + the shaping-cost trio (ref ~33 plain; 35/35/18.5/10.8)
    from orion_sdr_tpu.modulate.dvb_t_frame import (DvbTFrameMod,
                                                    tx_lowpass_for_2k)

    link = sdr.DvbTLinkParams(guard="1/8", constellation="qpsk",
                              code_rate="1/2")
    params = sdr.DvbTFrameParams(link, frame_number=0, cell_id=0)
    payload_b = bytes(rng.integers(0, 256, 184).astype(np.uint8))
    variants = [
        ("plain", DvbTFrameMod(params), 35.0),
        ("taper16", DvbTFrameMod(params).with_symbol_window(16), 35.0),
        ("mask45", DvbTFrameMod(params).with_tx_lowpass(
            tx_lowpass_for_2k(45, 60.0)), 18.5),
        ("taper16+mask89", DvbTFrameMod(params).with_symbol_window(16)
         .with_tx_lowpass(tx_lowpass_for_2k(89, 60.0)), 10.8),
    ]
    for nm, m, base in variants:
        f = m.modulate(payload_b)
        n = len(np.asarray(f.iq))
        r = host_rate(lambda: m.modulate(payload_b), n, reps=4)
        row(f"DVB-T frame mod {nm} (composite)", r / 1e6, base)

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
    for fn in (bench_fec_tx, bench_waveform_tx, bench_frame_tx):
        try:
            fn()
        except Exception as e:                       # noqa: BLE001
            import traceback
            traceback.print_exc()
            print(f"{fn.__name__} failed: {e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
