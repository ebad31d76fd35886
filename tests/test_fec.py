"""FEC layer tests (mirrors reference tests/unit/fec.rs: known answers,
roundtrips with injected errors, interleaver/scrambler inverses)."""

import numpy as np
import pytest

from orion_sdr_tpu import fec


class TestLdpc:
    @pytest.mark.parametrize("name", ["N512R12", "N576R23", "N512R34"])
    def test_encode_valid_codeword(self, name):
        rng = np.random.default_rng(0)
        n, k, _ = fec.LDPC_CODES[name]
        msg = rng.integers(0, 2, k).astype(np.uint8)
        cw = np.asarray(fec.ldpc_encode(name, msg))
        assert cw.shape == (n,)
        assert int(fec.ldpc_syndrome_weight(name, cw)) == 0
        np.testing.assert_array_equal(cw[:k], msg)  # systematic

    def test_graph_properties(self):
        g = fec.ldpc_graph("N512R12")
        assert g.A.sum(axis=0).min() == 3 and g.A.sum(axis=0).max() == 3

    @pytest.mark.parametrize("name", ["N512R12", "N576R23", "N512R34"])
    def test_decode_with_errors(self, name):
        rng = np.random.default_rng(1)
        n, k, _ = fec.LDPC_CODES[name]
        msg = rng.integers(0, 2, (3, k)).astype(np.uint8)
        cw = np.asarray(fec.ldpc_encode(name, msg)).astype(np.float32)
        llr = (1.0 - 2.0 * cw) * 4.0
        # flip 10 strong LLRs per codeword
        flips = rng.choice(n, size=10, replace=False)
        llr[:, flips] *= -1
        dec, unsat = fec.ldpc_decode(name, llr, max_iter=50)
        assert np.asarray(unsat).max() == 0
        np.testing.assert_array_equal(np.asarray(dec), msg)

    def test_decode_rules(self):
        rng = np.random.default_rng(2)
        msg = rng.integers(0, 2, 256).astype(np.uint8)
        cw = np.asarray(fec.ldpc_encode("N512R12", msg)).astype(np.float32)
        y = (1 - 2 * cw) + 0.6 * rng.standard_normal(512).astype(np.float32)
        llr = 2 * y / 0.36
        for rule in ["sum_product", "min_sum", "scaled_min_sum"]:
            dec, unsat = fec.ldpc_decode("N512R12", llr, 50, rule=rule)
            np.testing.assert_array_equal(np.asarray(dec), msg)


class TestConv:
    @pytest.mark.parametrize("code", ["k5", "dvb_k7"])
    @pytest.mark.parametrize("rate", ["1/2", "2/3", "3/4", "5/6", "7/8"])
    def test_punctured_roundtrip(self, code, rate):
        rng = np.random.default_rng(3)
        info = rng.integers(0, 2, 96).astype(np.uint8)
        coded = np.asarray(fec.conv_encode_punctured(info, rate, code))
        assert len(coded) == fec.punctured_coded_len(96, rate, code)
        llr = (1.0 - 2.0 * coded.astype(np.float32)) * 4.0
        dec = np.asarray(fec.viterbi_decode_soft(llr, 96, rate, code))
        np.testing.assert_array_equal(dec, info)

    def test_soft_viterbi_corrects_noise(self):
        rng = np.random.default_rng(4)
        info = rng.integers(0, 2, 200).astype(np.uint8)
        coded = np.asarray(fec.conv_encode_punctured(info, "1/2", "dvb_k7")).astype(np.float32)
        y = (1 - 2 * coded) + 0.8 * rng.standard_normal(coded.shape).astype(np.float32)
        dec = np.asarray(fec.viterbi_decode_soft(2 * y / 0.64, 200, "1/2", "dvb_k7"))
        np.testing.assert_array_equal(dec, info)


class TestGalois:
    def test_gf_identities(self):
        a = np.arange(1, 256, dtype=np.uint8)
        np.testing.assert_array_equal(fec.gf_mul(a, fec.gf_inv(a)), np.ones(255, np.uint8))
        np.testing.assert_array_equal(fec.gf_mul(a, 1), a)
        np.testing.assert_array_equal(fec.gf_mul(a, 0), np.zeros(255, np.uint8))

    def test_rs_dvb_roundtrip_with_errors(self):
        rng = np.random.default_rng(5)
        rs = fec.ReedSolomon.dvb()
        assert (rs.n, rs.k, rs.t) == (204, 188, 8)
        msg = rng.integers(0, 256, 188).astype(np.uint8)
        cw = rs.encode(msg)
        # corrupt 8 byte positions
        pos = rng.choice(204, 8, replace=False)
        cw_bad = cw.copy()
        cw_bad[pos] ^= rng.integers(1, 256, 8).astype(np.uint8)
        np.testing.assert_array_equal(rs.decode(cw_bad), msg)
        # 9 errors must raise
        cw_bad2 = cw.copy()
        pos9 = rng.choice(204, 9, replace=False)
        cw_bad2[pos9] ^= rng.integers(1, 256, 9).astype(np.uint8)
        with pytest.raises(fec.RsError):
            rs.decode(cw_bad2)

    def test_rs_small_code(self):
        rng = np.random.default_rng(6)
        rs = fec.ReedSolomon(60, 8)  # RS(60,52) t=4 — the Conv+RS concat code
        msg = rng.integers(0, 256, 52).astype(np.uint8)
        cw = rs.encode(msg)
        cw[[3, 17, 40, 59]] ^= 0xA5
        np.testing.assert_array_equal(rs.decode(cw), msg)

    def test_bch_t8_roundtrip(self):
        rng = np.random.default_rng(7)
        bch = fec.Bch(t=8)
        msg = rng.integers(0, 2, bch.k).astype(np.uint8)
        cw = bch.encode(msg)
        assert not np.asarray(bch._syndromes(cw)).any()
        pos = rng.choice(bch.n, 8, replace=False)
        cw[pos] ^= 1
        np.testing.assert_array_equal(bch.decode(cw), msg)

    def test_bch_shortened(self):
        rng = np.random.default_rng(8)
        bch = fec.Bch(t=4, n=140)
        msg = rng.integers(0, 2, bch.k).astype(np.uint8)
        cw = bch.encode(msg)
        cw[[5, 60, 100, 139]] ^= 1
        np.testing.assert_array_equal(bch.decode(cw), msg)


class TestInterleavers:
    def test_block_roundtrip_u8_and_f32(self):
        rng = np.random.default_rng(9)
        for arr in [rng.integers(0, 256, 32 * 32).astype(np.uint8),
                    rng.standard_normal(32 * 32).astype(np.float32)]:
            il = np.asarray(fec.block_interleave(arr, 32, 32))
            assert not np.array_equal(il, arr)
            out = np.asarray(fec.block_deinterleave(il, 32, 32))
            np.testing.assert_array_equal(out, arr)

    def test_block_spreads_bursts(self):
        x = np.zeros(8 * 16, np.uint8)
        il = np.asarray(fec.block_interleave(np.arange(128, dtype=np.uint8), 8, 16))
        # a burst of 8 adjacent interleaved elements lands in 8 distinct rows
        burst = il[:8]
        rows = set(int(v) // 16 for v in burst)
        assert len(rows) == 8

    def test_forney_roundtrip(self):
        rng = np.random.default_rng(10)
        data = rng.integers(0, 256, 1024).astype(np.uint8)
        il, st = fec.forney_interleave(data, 12, 17)
        tail, st = fec.forney_flush(12, 17, st)
        stream = np.concatenate([np.asarray(il), np.asarray(tail)])
        dil, dst = fec.forney_deinterleave(stream, 12, 17)
        d = fec.conv_roundtrip_delay(12, 17)
        assert d == 12 * 11 * 17
        np.testing.assert_array_equal(np.asarray(dil)[d:d + 1024], data)

    def test_forney_chunk_invariance(self):
        rng = np.random.default_rng(11)
        data = rng.integers(0, 256, 600).astype(np.uint8)
        full, _ = fec.forney_interleave(data, 12, 17)
        a, st = fec.forney_interleave(data[:250], 12, 17)
        b, _ = fec.forney_interleave(data[250:], 12, 17, state=st)
        np.testing.assert_array_equal(
            np.concatenate([np.asarray(a), np.asarray(b)]), np.asarray(full))


class TestScramblerCrc:
    def test_scrambler_self_inverse(self):
        rng = np.random.default_rng(12)
        data = rng.integers(0, 256, 500).astype(np.uint8)
        s = fec.scramble(data, taps=0b1001000, width=7, seed=0x5A)
        assert not np.array_equal(s, data)
        np.testing.assert_array_equal(fec.scramble(s, 0b1001000, 7, 0x5A), data)

    def test_scrambler_stream_matches_oneshot(self):
        rng = np.random.default_rng(13)
        data = rng.integers(0, 256, 300).astype(np.uint8)
        one = fec.scramble(data, fec.DVB_TAPS, 15, 0x100)
        st = fec.PnScramblerStream(fec.DVB_TAPS, 15, 0x100)
        chunks = np.concatenate([st.feed(data[:100]), st.feed(data[100:])])
        np.testing.assert_array_equal(chunks, one)

    def test_crc_known_answers(self):
        assert fec.crc16(b"123456789") == 0x29B1
        assert fec.crc32(b"123456789") == 0xCBF43926


def test_native_encoders_match_numpy():
    """Round-3 TX tier: the native table-LFSR RS/BCH encoders are bit-exact
    vs the numpy reference LFSRs (which remain the fallback)."""
    from orion_sdr_tpu import native
    from orion_sdr_tpu.fec.galois import ReedSolomon
    from orion_sdr_tpu.frame.chain import shortened_bch_for
    if not native.AVAILABLE:
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)
    for n, npar in ((204, 16), (60, 8)):
        rs = ReedSolomon(n, npar)
        msgs = rng.integers(0, 256, (257, rs.k)).astype(np.uint8)
        a = np.asarray(native.rs_encode_batch(n, npar, msgs))
        # force the numpy reference path via 1-D rows
        b = np.stack([ReedSolomon(n, npar).encode(m) for m in msgs[:16]])
        assert np.array_equal(a[:16], b)
        # decode roundtrip through the native decoder
        dec, ok = native.rs_decode_batch(n, npar, a)
        assert ok.all() and np.array_equal(dec, msgs)
    bch = shortened_bch_for(8)
    bits = rng.integers(0, 2, (129, bch.k)).astype(np.uint8)
    a = np.asarray(native.bch_encode_batch(bch.n, bch.k, 8, bits))
    b = np.stack([bch.encode(r) for r in bits[:8]])
    assert np.array_equal(a[:8], b)
    dec, ok = native.bch_decode_batch(bch.n, bch.k, 8, a)
    assert ok.all() and np.array_equal(dec, bits)
