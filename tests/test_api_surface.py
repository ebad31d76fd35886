"""Flat-namespace API surface + Morse encoder tests (mirrors the reference's
python/orion_sdr/__init__.py allowlist and tests/unit/morse.rs)."""

import numpy as np

import orion_sdr_tpu as sdr


def test_flat_namespace_covers_reference_surface():
    # functional counterparts of every reference symbol group
    surface = [
        # analog (CwEnvelopeDemod..PmQuadratureDemod / *Mod)
        "cw_mod", "cw_demod", "am_mod", "am_demod", "ssb_mod", "ssb_demod",
        "fm_mod", "fm_demod", "pm_mod", "pm_demod",
        # digital (BpskMod..QamDemod + mappers/deciders)
        "map_bits", "decide", "soft_llr", "digital_mod", "digital_demod",
        # FT8/FT4
        "ft8_mod", "ft8_demod", "ft4_mod", "ft4_demod",
        "ft8_encode", "ft8_decode_soft", "ft4_encode", "ft4_decode_soft",
        "ft8_sync", "ft4_sync", "Ft8StreamDecoder",
        "ft8_decode_multi_signal", "ft4_decode_multi_signal",
        "pack77", "unpack77", "CallsignHashTable",
        # PSK31
        "VaricodeEncoder", "VaricodeDecoder", "MorseEncoder",
        "morse_decode", "morse_decode_band", "MorseBandResult",
        "cw_envelope_multi",
        "bpsk31_mod_text", "qpsk31_mod_text", "bpsk31_demod", "qpsk31_demod",
        "bpsk31_decide", "Psk31Stream", "psk31_sync", "best_psk31_sync",
        "psk31_decode_band",
        # OFDM
        "OfdmConfig", "ofdm_mod", "ofdm_demod", "ofdm_decide",
        "ofdm_soft_demod", "OfdmRxFrame", "build_ofdm_rx_frame",
        "ofdm_sync", "generate_ofdm_preamble", "CarrierPlan", "TxLowpass",
        "dft_precode", "dft_deprecode",
        # spectrum scanning (beyond the reference)
        "spectrum_scan", "SpectrumSegment",
        # GNSS (beyond the reference)
        "gps_ca_code", "gps_ca_mod", "gps_acquire", "gps_track",
        "gps_nav_frame_sync", "GpsAcquisition", "GpsTrack",
        # frame layer
        "FramePacket", "McsTable", "OfdmFrameMod", "OfdmFrameDemod",
        "OfdmFrameStreamDemod", "RxError",
        # DVB-T
        "DvbTFrameParams", "DvbTFrame", "DvbTRxFrame", "TpsWord",
        "DvbTFrameMod", "DvbTFrameDemod", "DvbTSuperFrameParams",
        "DvbTSuperFrame", "DvbTRxSuperFrame", "DvbTSuperFrameMod",
        "DvbTSuperFrameDemod", "DvbTFrameStreamDemod",
        # NB/bandwidth helpers
        "nb_bandwidth_fs", "nb_bandwidth_occupied_hz", "dvb_t_cp_len",
        "dvb_t_max_rx_window_backoff", "dvb_t_tx_lowpass_suggested_taps",
        "dvb_t_tx_lowpass_group_delay", "dvb_t_tx_lowpass_fits_guard",
        # measurement
        "rms", "tone", "gen_complex_tone", "snr_db_at", "power_spectrum",
        "nb_spectrum_snr_db", "wb_spectrum_snr_db", "spectrum_bw_hz", "awgn",
        # checkpoint / resume (beyond the reference)
        "save_checkpoint", "load_checkpoint", "state_dict", "load_state_dict",
        # channel impairment simulator (beyond the reference)
        "cfo_apply", "phase_noise_apply", "iq_imbalance_apply",
        "multipath_apply", "fading_taps", "fading_apply", "watterson_apply",
    ]
    missing = [s for s in surface if not hasattr(sdr, s)]
    assert not missing, missing


def test_nb_helpers_consistent():
    fs = sdr.nb_bandwidth_fs(1_000_000.0)
    assert abs(sdr.nb_bandwidth_occupied_hz(fs) - 1_000_000.0) < 1e-3
    assert sdr.dvb_t_cp_len("1/4") == 512
    assert sdr.dvb_t_max_rx_window_backoff() == 85
    gd = sdr.dvb_t_tx_lowpass_group_delay(89)
    assert gd == 44
    assert sdr.dvb_t_tx_lowpass_fits_guard(89, 256, 20, 85)
    assert not sdr.dvb_t_tx_lowpass_fits_guard(89, 64, 40, 32)


# ── Morse ────────────────────────────────────────────────────────────────────

def test_morse_paris_timing():
    # PARIS = 50 units incl. trailing word gap; encoder emits 43 units
    # (no trailing gap): 10 dit + 4 dah(3u) + 9 intra + 4 char gaps(3u)
    enc = sdr.MorseEncoder(8000.0, 20.0)
    env = enc.encode_text("PARIS")
    unit = 1200.0 / 20.0 * 1e-3 * 8000.0    # 480 samples
    assert len(env) == round(43 * unit)
    assert set(np.unique(env)) <= {0.0, 1.0}


def test_morse_e_is_one_dit():
    enc = sdr.MorseEncoder(8000.0, 20.0)
    env = enc.encode_text("E")
    assert len(env) == 480 and np.all(env == 1.0)


def test_morse_word_gap_and_unknown_chars():
    enc = sdr.MorseEncoder(8000.0, 20.0)
    a = enc.encode_text("E E")
    # dit + word gap (7u) + dit
    assert len(a) == 480 + 7 * 480 + 480
    b = sdr.MorseEncoder(8000.0, 20.0).encode_text("E#E")   # '#' skipped
    assert len(b) == 480 + 3 * 480 + 480                    # char gap instead


def test_morse_jitter_deterministic():
    e1 = sdr.MorseEncoder(8000.0, 25.0).with_jitter(10.0)
    e2 = sdr.MorseEncoder(8000.0, 25.0).with_jitter(10.0)
    a, b = e1.encode_text("CQ TEST"), e2.encode_text("CQ TEST")
    assert np.array_equal(a, b)
    c = sdr.MorseEncoder(8000.0, 25.0).encode_text("CQ TEST")
    assert len(a) != len(c)   # jitter changed timing


def test_morse_feeds_cw_chain():
    enc = sdr.MorseEncoder(8000.0, 30.0)
    env = enc.encode_text("CQ")
    iq, _ = sdr.cw_mod(env, fs=8000.0, tone_hz=700.0)
    audio, _ = sdr.cw_demod(np.asarray(iq), fs=8000.0)
    audio = np.asarray(audio)
    # envelope recovered: key-down regions carry energy
    assert np.asarray(iq).shape[-1] == len(env)
    assert float(np.max(audio)) > 0.1


def test_trace_profiler_context(tmp_path):
    # SURVEY §5: tracing via jax.profiler; must capture device programs
    # and be a safe no-op if the profiler is unavailable.
    import os
    with sdr.trace(str(tmp_path)):
        y, _ = sdr.dsp.rotate(np.ones(1024, np.complex64), 100.0, 8000.0)
        float(np.asarray(y)[0].real)
    files = [f for r, _, fs in os.walk(tmp_path) for f in fs]
    assert files, "profiler trace produced no files"


def test_reference_dropin_wrappers():
    # python/ft8.rs:386-505 convenience surface + CodecCache slot
    p = sdr.ft8_pack_standard("CQ", "KA1ABC", "FN42")
    assert isinstance(p, bytes) and len(p) == 10
    out = sdr.ft8_unpack(p)
    assert out == {"type": "standard", "call_to": "CQ",
                   "call_de": "KA1ABC", "extra": "FN42"}
    t = sdr.ft8_unpack(sdr.ft8_pack_free_text("TNX 73"))
    assert t == {"type": "free_text", "text": "TNX 73"}
    data = bytes(range(9))
    tel = sdr.ft8_unpack(sdr.ft8_pack_telemetry(data))
    assert tel["type"] == "telemetry" and tel["data"][1:] == data[1:]
    try:
        sdr.ft8_pack_telemetry(b"short")
        assert False
    except ValueError:
        pass
    # CodecCache accepted (and inert) by the frame constructors
    from orion_sdr_tpu.multicarrier import CarrierPlan
    from orion_sdr_tpu.ofdm import OfdmConfig
    from orion_sdr_tpu.sync.ofdm_sync import OfdmPreamble
    plan = CarrierPlan(64, 16).with_contiguous_data()
    cfg = OfdmConfig(plan, fs=48e3)
    pre = OfdmPreamble(repeat_len=32, num_repeats=2)
    cache = sdr.CodecCache()
    sdr.OfdmFrameMod(cfg, sdr.McsTable.default_ladder(), pre, cache=cache)
    sdr.OfdmFrameDemod(cfg, sdr.McsTable.default_ladder(), cache=cache)
    sdr.OfdmFrameStreamDemod(cfg, sdr.McsTable.default_ladder(), pre,
                             cache=cache)


def test_ofdm_config_builder_parity():
    """The reference's full with_* builder surface (modulate/ofdm.rs:171-310)
    plus its validate() checks (:332-358)."""
    import pytest
    from orion_sdr_tpu.multicarrier import CarrierPlan
    from orion_sdr_tpu.ofdm import OfdmConfig
    from orion_sdr_tpu.frame import OuterFec, InnerFec, InterleaverKind, \
        ScramblerKind

    plan = CarrierPlan(256, 64).with_contiguous_data(edge_guard=24)
    cfg = OfdmConfig(plan, fs=1e6)
    assert cfg.header_crc == "crc16"      # ref default (modulate/ofdm.rs:158)

    c = cfg.with_fs(2e6)
    assert c.fs == 2e6
    c = cfg.with_outer_fec(OuterFec.bch(8)).with_inner_fec(
        InnerFec.ldpc("N512R12"))
    assert c.outer_fec.kind == "bch" and c.inner_fec.kind == "ldpc"
    c.validate()

    # symbol-window conventions: raw samples, beta·guard, beta·Tu
    assert cfg.with_symbol_window(16).carrier_plan.window_roll_off == 16
    assert cfg.with_symbol_window_beta_guard(
        0.5).carrier_plan.window_roll_off == 32     # cp_len/2, max transparent
    assert cfg.with_symbol_window_beta_guard(
        9.0).carrier_plan.window_roll_off == 32     # clamped to 0.5
    assert cfg.with_symbol_window_beta_tu(
        0.05).carrier_plan.window_roll_off == round(0.05 * 256)

    c = cfg.with_tx_lowpass_null_band(45, 60.0)
    assert c.tx_lowpass is not None and c.tx_lowpass.num_taps == 45
    c.validate()

    # equalizer method selection (demodulate/ofdm.rs:241-266)
    assert cfg.equalizer_method == "training_symbol"
    assert cfg.with_equalizer_method(
        "pilot_interp").equalizer_method == "pilot_interp"
    with pytest.raises(ValueError):
        cfg.with_equalizer_method("bogus").validate()

    # validate() rejections (ref FrameConfigError, modulate/ofdm.rs:332-358)
    with pytest.raises(ValueError):   # per-frame seed needs a header block
        cfg.with_scrambler(ScramblerKind.additive(0b1001, 15, per_frame=True)
                           ).with_header_format("no_header").validate()
    with pytest.raises(ValueError):   # zero interleaver dims
        cfg.with_inner_interleaver(InterleaverKind.block(0, 8)).validate()
    with pytest.raises(ValueError):
        cfg.with_outer_interleaver(
            InterleaverKind.convolutional(12, 0)).validate()
    with pytest.raises(ValueError):   # zero BCH t
        cfg.with_outer_fec(OuterFec.bch(0)).validate()
    for n, p in ((0, 16), (300, 16), (204, 0), (10, 12), (204, 15)):
        with pytest.raises(ValueError):   # bad RS configs incl. odd parity
            cfg.with_outer_fec(OuterFec.reed_solomon(n, p)).validate()


def test_typed_stub_covers_flat_namespace():
    """PEP 561 stub parity (ref python/orion_sdr/__init__.pyi): the generated
    stub parses and declares every public flat-namespace symbol."""
    import ast, os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "orion_sdr_tpu", "__init__.pyi")
    tree = ast.parse(open(path).read())
    declared = set()
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)):
            declared.add(node.name)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            declared.add(node.target.id)
        elif isinstance(node, ast.ImportFrom):
            declared.update(a.asname or a.name for a in node.names)
    import types
    # submodules appear in dir(sdr) as a side effect of OTHER tests
    # importing them (e.g. orion_sdr_tpu.native) — only the symbols the
    # package itself re-exports belong in the stub
    public = {n for n in dir(sdr) if not n.startswith("_")
              and not (isinstance(getattr(sdr, n), types.ModuleType)
                       and n not in declared)}
    missing = public - declared - {"ofdm_mod_api"}
    assert not missing, f"stub missing: {sorted(missing)}"
    assert os.path.exists(os.path.join(root, "orion_sdr_tpu", "py.typed"))
