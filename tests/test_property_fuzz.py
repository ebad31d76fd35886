"""Property fuzz: randomized-but-seeded geometry sweeps — every valid
numerology must roundtrip bit-exactly (the caller-owned-plan contract)."""

import numpy as np
import pytest

import orion_sdr_tpu as sdr
from orion_sdr_tpu.multicarrier import CarrierPlan
from orion_sdr_tpu.ofdm import OfdmConfig
from orion_sdr_tpu.frame.chain import block_plan, encode_chain, decode_chain
from orion_sdr_tpu.frame.types import (OuterFec, InnerFec, InterleaverKind,
                                       ScramblerKind, SCRAMBLER_BEFORE_OUTER)


@pytest.mark.parametrize("seed", range(6))
def test_random_plan_ofdm_roundtrip(seed):
    rng = np.random.default_rng(1000 + seed)
    n_fft = int(rng.choice([64, 128, 256, 512]))
    cp = n_fft // int(rng.choice([4, 8, 16]))
    guard = int(rng.integers(1, max(n_fft // 8, 2)))
    order = str(rng.choice(["bpsk", "qpsk", "qam16", "qam64"]))
    plan = CarrierPlan(n_fft, cp).with_contiguous_data(edge_guard=guard)
    cfg = OfdmConfig(plan, fs=1e6, constellation=order)
    cfg.validate()
    n_sym = int(rng.integers(1, 6))
    bits = rng.integers(0, 2, cfg.bits_per_ofdm_symbol() * n_sym
                        ).astype(np.uint8)
    iq, _ = sdr.ofdm_mod(cfg, bits)
    soft, _ = sdr.ofdm_demod(cfg, np.asarray(iq), n_symbols=n_sym)
    out = np.asarray(sdr.ofdm_decide(cfg, soft))
    assert np.array_equal(out[:len(bits)], bits), (n_fft, cp, guard, order)


@pytest.mark.parametrize("seed", range(6))
def test_random_chain_scheme_roundtrip(seed):
    rng = np.random.default_rng(2000 + seed)
    outer = [OuterFec.none(), OuterFec.bch(int(rng.choice([2, 4, 8]))),
             OuterFec.reed_solomon(int(rng.choice([60, 204])),
                                   int(rng.choice([8, 16])))][
                                       int(rng.integers(0, 3))]
    inner = [InnerFec.ldpc(str(rng.choice(["N512R12", "N576R23"]))),
             InnerFec.convolutional(str(rng.choice(["1/2", "2/3", "3/4"])),
                                    str(rng.choice(["k5", "dvb_k7"])))][
                                        int(rng.integers(0, 2))]
    oil = [InterleaverKind.none(), InterleaverKind.block(8, 16),
           InterleaverKind.convolutional(4, 3)][int(rng.integers(0, 3))]
    iil = [InterleaverKind.none(),
           InterleaverKind.block(16, 32)][int(rng.integers(0, 2))]
    scr = [ScramblerKind.none(),
           ScramblerKind.additive(0b1001, 15, 0x3C3)][
               int(rng.integers(0, 2))]
    crc = str(rng.choice(["none", "crc16", "crc32"]))
    n_bytes = int(rng.integers(20, 400))
    data = rng.integers(0, 256, n_bytes).astype(np.uint8)
    plan = block_plan(n_bytes, crc, outer, inner, oil, iil)
    coded = encode_chain(data, crc, outer, inner, oil, iil, scr,
                         SCRAMBLER_BEFORE_OUTER, 5)
    assert len(coded) == plan.coded_bits, (outer, inner, oil, iil)
    llrs = (1.0 - 2.0 * coded.astype(np.float32)) * 4.0
    out, ok = decode_chain(llrs, plan, crc, outer, inner, oil, iil, scr,
                           SCRAMBLER_BEFORE_OUTER, 5)
    assert ok and np.array_equal(np.asarray(out)[:n_bytes], data), \
        (outer, inner, oil, iil, scr, crc)


@pytest.mark.parametrize("seed", range(4))
def test_random_pilot_plan_interp_roundtrip(seed):
    """Random pilot spacings with pilots bracketing the data span: the
    generic pilot-interp equalizer decodes a static-multipath capture."""
    rng = np.random.default_rng(3000 + seed)
    spacing = int(rng.choice([4, 8, 16]))
    n_fft = 256
    lim = int(rng.choice([96, 100]))
    lim = (lim // spacing) * spacing
    plan = (CarrierPlan(n_fft, 64)
            .with_pilot_carriers([(i, 1.0 + 0j)
                                  for i in range(-lim, lim + 1, spacing)])
            .with_contiguous_data(edge_guard=n_fft // 2 - lim - 1))
    cfg = (OfdmConfig(plan, fs=1e6, constellation="qpsk")
           .with_equalizer_method("pilot_interp"))
    cfg.validate()
    bits = rng.integers(0, 2, cfg.bits_per_ofdm_symbol() * 4
                        ).astype(np.uint8)
    iq = np.asarray(sdr.ofdm_mod(cfg, bits)[0])
    h = np.zeros(6, np.complex64)
    h[0], h[3] = 1.0, 0.4 * np.exp(1j * float(rng.uniform(0, 6.28)))
    rx = np.convolve(iq, h)[:len(iq)].astype(np.complex64)
    from orion_sdr_tpu.multicarrier import CarrierGrid, symbol_fft, \
        grid_extract
    from orion_sdr_tpu.ofdm import channel_estimate_pilots, zf_equalize
    g = CarrierGrid(plan)
    freq = symbol_fft(rx, n_fft, 64, n_symbols=4)
    est = channel_estimate_pilots(freq, g.pilot_bins, g.pilot_values, n_fft)
    soft = grid_extract(g, zf_equalize(freq, est))
    out = np.asarray(sdr.ofdm_decide(cfg, soft))
    assert np.array_equal(out[:len(bits)], bits), (spacing, lim)


@pytest.mark.parametrize("seed", range(6))
def test_random_cpe_walk_roundtrip(seed):
    """Random constellation × random walk scale × random grid: cpe_correct
    recovers the symbols whenever per-symbol increments stay in-range."""
    from orion_sdr_tpu.ofdm import cpe_correct
    from orion_sdr_tpu.constellation import map_bits, BITS_PER_SYMBOL
    rng = np.random.default_rng(1000 + seed)
    constel = rng.choice(["bpsk", "qpsk", "qam16", "qam64"])
    n_sym = int(rng.integers(2, 40))
    n_data = int(rng.integers(32, 256))
    bits = BITS_PER_SYMBOL[constel]
    raw = rng.integers(0, 2, n_sym * n_data * bits).astype(np.uint8)
    pts = np.asarray(map_bits(raw, constel)).reshape(n_sym, n_data)
    # per-symbol increments well inside the unwrap capture (π/2·constel)
    step = 0.25 if constel == "bpsk" else 0.12
    walk = np.cumsum(rng.uniform(-step, step, n_sym)).astype(np.float32)
    rx = pts * np.exp(1j * walk)[:, None]
    out, phases = cpe_correct(rx, constel)
    err = np.angle(np.exp(1j * (np.asarray(phases) - walk)))
    assert np.max(np.abs(err)) < 0.12, (constel, n_sym, n_data)


@pytest.mark.parametrize("seed", range(4))
def test_random_channelizer_chunking_invariance(seed):
    """Any split of the same wideband stream produces identical channelizer
    output (absolute-aligned internal blocks)."""
    from orion_sdr_tpu.dsp import Channelizer
    rng = np.random.default_rng(2000 + seed)
    m = int(rng.choice([2, 4, 8]))
    fs_out = 1e6
    fs_wide = m * fs_out
    n_ch = int(rng.integers(1, 4))
    centers = rng.uniform(-0.4, 0.4, n_ch) * fs_wide
    n = int(rng.integers(30_000, 90_000))
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)

    def run(cuts):
        ch = Channelizer(fs_wide, fs_out, centers)
        parts = []
        prev = 0
        for c in list(cuts) + [n]:
            parts.append(ch.push(x[prev:c]))
            prev = c
        parts.append(ch.flush())
        return np.concatenate([p for p in parts if p.shape[-1]], axis=-1)

    a = run([])
    cuts = sorted(rng.integers(0, n, int(rng.integers(1, 5))).tolist())
    b = run(cuts)
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_rds_group_roundtrip(seed):
    from orion_sdr_tpu.codec import rds as R
    rng = np.random.default_rng(seed)
    pi = int(rng.integers(0, 1 << 16))
    ps = "".join(chr(rng.integers(32, 127)) for _ in range(8))
    rt = "".join(chr(rng.integers(32, 127))
                 for _ in range(int(rng.integers(1, 60))))
    rt = rt.rstrip()
    groups = R.rds_groups_0a(pi, pty=int(rng.integers(0, 32)), ps_name=ps) \
        + R.rds_groups_2a(pi, radiotext=rt)
    d = R.rds_decode_bits(R.rds_encode_groups(groups))
    assert d.pi == pi and d.ps_name == ps and d.radiotext == rt


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_ax25_hdlc_roundtrip(seed):
    from orion_sdr_tpu.codec.ax25 import Ax25Frame, hdlc_encode, hdlc_decode
    rng = np.random.default_rng(seed)
    payload = bytes(rng.integers(0, 256, int(rng.integers(0, 200))
                                 ).astype(np.uint8))
    f = Ax25Frame(dest="CQ", src=f"N{seed}ABC-{seed % 15 + 1}",
                  payload=payload)   # SSID 0 normalizes away on parse
    got = hdlc_decode(hdlc_encode([f.encode()]))
    assert got == [f]


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_pocsag_codeword_two_random_flips_detected_or_corrected(seed):
    from orion_sdr_tpu.codec.pocsag import pocsag_codeword, pocsag_check
    rng = np.random.default_rng(seed)
    cw = pocsag_codeword(int(rng.integers(0, 2)),
                         int(rng.integers(0, 1 << 20)))
    assert pocsag_check(cw) == cw >> 1
    bad = cw ^ (1 << int(rng.integers(0, 32)))
    got = pocsag_check(bad)
    # a single flip either corrects back or (parity-bit flip) stays valid
    assert got is None or got == cw >> 1 or got == bad >> 1


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_adsb_messages_roundtrip(seed):
    from orion_sdr_tpu.codec import adsb as A
    rng = np.random.default_rng(seed)
    icao = int(rng.integers(0, 1 << 24))
    cs = "".join("ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"[rng.integers(0, 36)]
                 for _ in range(int(rng.integers(1, 9))))
    m = A.adsb_decode_frame(A.adsb_encode_identification(icao, cs))
    assert m.icao == icao and m.callsign == cs
    lat = float(rng.uniform(-85, 85))
    lon = float(rng.uniform(-179, 179))
    alt = int(rng.integers(0, 2000)) * 25 - 1000
    me = A.adsb_decode_frame(A.adsb_encode_position(icao, lat, lon, alt, 0))
    mo = A.adsb_decode_frame(A.adsb_encode_position(icao, lat, lon, alt, 1))
    assert me.altitude_ft == alt
    A.adsb_pair_positions([me, mo])
    if mo.position is not None:          # zone-straddling pairs return None
        assert abs(mo.position[0] - lat) < 0.01
        assert abs(mo.position[1] - lon) < 0.01


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_baudot_printable_roundtrip(seed):
    from orion_sdr_tpu.codec.rtty import baudot_encode, baudot_decode
    rng = np.random.default_rng(seed)
    alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 -()/:.,'?!\"#$&;"
    msg = "".join(alphabet[rng.integers(0, len(alphabet))]
                  for _ in range(40))
    assert baudot_decode(baudot_encode(msg)) == msg
