"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The story the reference never had (SURVEY.md §4 'multi-node story: N/A'):
sharded outputs must match single-device outputs.
"""

import numpy as np
import pytest
import jax

from orion_sdr_tpu import dsp
from orion_sdr_tpu.parallel import (
    make_mesh, shard_channels, fir_overlap_save_sharded, fm_demod_sharded,
)
import orion_sdr_tpu as sdr


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return make_mesh(8, shape=(2, 4))  # 2 channel groups × 4 time blocks


class TestSharding:
    def test_fir_overlap_save_matches_single_device(self, mesh8):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((2, 4096)) + 1j * rng.standard_normal((2, 4096))
             ).astype(np.complex64)
        taps = dsp.kaiser_lowpass_taps(63, 0.2, 60.0)
        ref, _ = dsp.fir_apply(x, taps)
        out = fir_overlap_save_sharded(x, taps, mesh8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_channel_sharded_pipeline(self, mesh8):
        rng = np.random.default_rng(1)
        x = (rng.standard_normal((8, 1024)) + 1j * rng.standard_normal((8, 1024))
             ).astype(np.complex64)
        mesh = make_mesh(8, shape=(8, 1))

        def pipeline(z):
            y, _ = dsp.rotate(z, -1000.0, 48e3)
            return (y.real ** 2 + y.imag ** 2)

        f = shard_channels(pipeline, mesh)
        out = np.asarray(f(x))
        ref = np.asarray(pipeline(x))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_fm_demod_sharded_matches_reference_chain(self, mesh8):
        # time+channel sharded FM discriminator ≈ single-device result
        fs = 48e3
        n = 8192
        t = np.arange(n) / fs
        audio = 0.5 * np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
        from orion_sdr_tpu.modulate import fm_mod
        iq, _ = fm_mod(np.stack([audio, audio]), fs, 2500.0)
        iq = np.asarray(iq)
        taps = dsp.kaiser_lowpass_taps(31, 0.25, 50.0)

        out = np.asarray(fm_demod_sharded(iq, taps, mesh8, fs, 2500.0))
        # single-device reference of the same chain
        y, _ = dsp.fir_apply(iq, taps)
        y = np.asarray(y)
        prev = np.concatenate([np.zeros((2, 1), np.complex64), y[:, :-1]], axis=1)
        prod = y * np.conj(prev)
        ref = np.arctan2(prod.imag, prod.real) / 2500.0
        np.testing.assert_allclose(out[:, 1:], ref[:, 1:], atol=1e-4)

    def test_ofdm_soft_demap_sharded_matches(self, mesh8):
        # symbol-aligned time+channel sharding: no halo, exact equivalence
        from orion_sdr_tpu.frame.demodulator import soft_demap
        from orion_sdr_tpu.parallel import ofdm_soft_demap_sharded
        plan = sdr.CarrierPlan(128, 32).with_contiguous_data(edge_guard=8)
        cfg = sdr.OfdmConfig(plan, fs=1e6)
        rng = np.random.default_rng(3)
        n_sym = 16
        iq = (rng.standard_normal((2, n_sym * 160)) +
              1j * rng.standard_normal((2, n_sym * 160))).astype(np.complex64)
        ref = soft_demap(cfg, "qpsk", iq, n_sym)
        out = ofdm_soft_demap_sharded(cfg, "qpsk", iq, n_sym, mesh8)
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_dvb_t_receive_sharded_matches(self, mesh8):
        # service-parallel DVB-T: 8 aligned frames, one per device,
        # sharded fused receive == single-device receive
        from orion_sdr_tpu.parallel import dvb_t_receive_sharded
        from orion_sdr_tpu.demodulate.dvb_t_frame import _receive_frame
        from orion_sdr_tpu.waveform.dvb_t import guard_cp_len_2k
        from orion_sdr_tpu.modulate.dvb_t_frame import DvbTFrameMod
        import orion_sdr_tpu as sdr

        link = sdr.DvbTLinkParams(guard="1/32", constellation="qpsk",
                                  code_rate="1/2")
        cp = guard_cp_len_2k(link.guard)
        rng = np.random.default_rng(5)
        frames = []
        n_sym = None
        for i in range(8):
            params = sdr.DvbTFrameParams(link, frame_number=i % 4, cell_id=i)
            f = DvbTFrameMod(params).modulate(bytes(rng.integers(
                0, 256, 100).astype(np.uint8)))
            n_sym = f.n_symbols
            frames.append(np.asarray(f.iq)[: n_sym * (2048 + cp)])
        segs = np.stack(frames)
        llrs, cells = dvb_t_receive_sharded(segs, n_sym, cp, 0, 2, mesh8)
        ref_l, ref_c = _receive_frame(segs, n_sym, cp, 0, 2)
        np.testing.assert_allclose(llrs, np.asarray(ref_l), atol=1e-3)
        np.testing.assert_allclose(cells, np.asarray(ref_c), atol=1e-4)
