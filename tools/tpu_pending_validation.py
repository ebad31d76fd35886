"""Chip validation queued during the 2026-08-18 relay outage. Run on a
live TPU (takes ~10-20 min through the relay):

    python tools/tpu_pending_validation.py

Validates on real hardware what this session added and could only test on
CPU: the hierarchical DVB-T receive (alpha LLR path), the FM stereo + RDS
device program, the blind DVB-T receive, and the 2-FSK engines; then
attempts to RESOLVE the FT8 bench lower bound by raising the in-scan rep
count (the recorded "≥8640 Msps" clamps at the relay jitter floor at
REPS=12; REPS=64 puts the marginal ~5 ms above it)."""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def probe():
    t0 = time.time()
    s = float(jnp.sum(jnp.ones((64, 64), jnp.float32)))
    print(f"relay probe: {s} in {time.time() - t0:.1f}s "
          f"(backend {jax.default_backend()})", flush=True)


def validate_modes():
    import orion_sdr_tpu as o
    from orion_sdr_tpu.codec import rds as R

    rng = np.random.default_rng(0)
    link = o.DvbTHierLinkParams(guard="1/8", constellation="qam16", alpha=2,
                                code_rate_hp="1/2", code_rate_lp="3/4")
    params = o.DvbTHierFrameParams(link=link, frame_number=1, cell_id=0x42)
    hp = rng.integers(0, 256, 400).astype(np.uint8)
    lp = rng.integers(0, 256, 1200).astype(np.uint8)
    fr = o.DvbTHierFrameMod(params).modulate(hp, lp)
    rx = o.DvbTHierFrameDemod(params).decode(fr.iq, fr.n_symbols,
                                             len(hp), len(lp))
    print("hier chip:", np.array_equal(rx.hp_payload, hp),
          rx.lp_payload is not None and np.array_equal(rx.lp_payload, lp),
          flush=True)

    blind = o.dvb_t_blind_decode(
        np.concatenate([np.zeros(999, np.complex64), fr.iq]))
    print("blind chip:", blind.guard, blind.tps.hierarchy,
          np.array_equal(blind.payload[:len(hp)], hp), flush=True)

    fs, n = 240_000.0, 1 << 17
    t = np.arange(n) / fs
    L = (0.8 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    Rr = (0.8 * np.sin(2 * np.pi * 2500 * t)).astype(np.float32)
    bits = R.rds_encode_groups(R.rds_groups_0a(0x52A1, ps_name="ORIONFM "))
    iq, _ = o.fm_stereo_mod(L, Rr, fs, rds_bits=bits)
    out = o.fm_stereo_demod(np.asarray(iq), fs, decode_rds=True)
    print(f"stereo chip: pilot={out.pilot_level:.4f} "
          f"PS={out.rds.ps_name!r}", flush=True)

    f1 = o.Ax25Frame(dest="APRS", src="W1AW-5", payload=b"chip check")
    audio = o.ax25_beacon([f1], 48_000.0)
    print("afsk chip:", o.ax25_decode(audio, 48_000.0) == [f1], flush=True)


def resolve_ft8_bound():
    from orion_sdr_tpu.sync.ft8_sync import _sync_grid_device, _MODE
    from orion_sdr_tpu.codec.ft8_ldpc import ldpc_decode_soft

    fs, base_hz, max_hz = 12000.0, 200.0, 3000.0
    n = 180_000
    m = _MODE["ft8"]
    num_bins = int(np.ceil((max_hz - base_hz) / m["spacing"])) \
        + m["n_tones"] + 1
    k = 4
    rng = np.random.default_rng(2)

    def fetch(x):
        return float(jnp.sum(jnp.asarray(x)))

    def make(B, reps):
        re = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
        im = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
        llr = jnp.asarray(rng.standard_normal((B * k, 174)
                                              ).astype(np.float32))

        @jax.jit
        def f(r, i, ll):
            def body(carry, _):
                rr, ii, l2, acc = carry
                wf, vals, _ = _sync_grid_device(rr + 1j * ii, fs, base_hz,
                                                "ft8", num_bins,
                                                m["total_syms"], 0, 0, k)
                bits, _ = ldpc_decode_soft(l2, 20)
                acc = acc + jnp.sum(vals) + jnp.sum(bits) + jnp.sum(wf)
                rr = jnp.roll(rr, 1, axis=0) + 1e-9 * acc
                return (rr, jnp.roll(ii, 1, axis=0), l2, acc), 0.0
            (_, _, _, acc), _ = jax.lax.scan(
                body, (r, i, ll, jnp.float32(0)), None, length=reps)
            return acc
        return f, (re, im, llr)

    for reps in (12, 64):
        fsm, asm = make(2, reps)
        fbg, abg = make(6, reps)
        fetch(fsm(*asm))
        fetch(fbg(*abg))
        ds, db = [], []
        for _ in range(7):
            t0 = time.perf_counter()
            fetch(fsm(*asm))
            ds.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            fetch(fbg(*abg))
            db.append(time.perf_counter() - t0)
        d = float(np.median(db)) - float(np.median(ds))
        per_window = d / (4 * reps)
        print(f"ft8 REPS={reps}: marginal={d * 1e3:.2f} ms "
              f"rate={n / per_window / 1e6:.0f} Msps "
              f"clamped={d < 1e-3}", flush=True)


if __name__ == "__main__":
    probe()
    validate_modes()
    resolve_ft8_bound()
    print("DONE", flush=True)
