"""POCSAG radio paging (ITU-R M.584) — beyond the reference. BCH(31,21)
codewords (validated against the published sync/idle words), alpha +
numeric pages, FSK capture decode with polarity ambiguity."""

import numpy as np
import pytest

from orion_sdr_tpu.codec.pocsag import (POCSAG_SYNC, POCSAG_IDLE, PocsagPage,
                                        pocsag_codeword, pocsag_check,
                                        pocsag_encode_batches)
from orion_sdr_tpu.modulate.pocsag import pocsag_mod
from orion_sdr_tpu.demodulate.pocsag import pocsag_decode

FS = 38_400.0


def test_published_words_are_valid_codewords():
    """The standard's sync (0x7CD215D8) and idle (0x7A89C197) words must
    pass the BCH+parity check — proves the generator polynomial."""
    assert pocsag_check(POCSAG_SYNC) == POCSAG_SYNC >> 1
    assert pocsag_check(POCSAG_IDLE) == POCSAG_IDLE >> 1


def test_codeword_single_bit_correction():
    cw = pocsag_codeword(1, 0xABCDE)
    assert pocsag_check(cw) == cw >> 1
    for bit in (0, 5, 13, 31):
        assert pocsag_check(cw ^ (1 << bit)) == cw >> 1 or bit == 0
    # 1-bit data error corrected exactly
    assert pocsag_check(cw ^ (1 << 13)) == cw >> 1


def test_address_slots_at_frame_index():
    p = PocsagPage(address=0x12345, function=1)     # frame = 5
    words = pocsag_encode_batches([p])
    assert words[0] == POCSAG_SYNC
    body = words[1:17]
    idx = next(i for i, w in enumerate(body) if w != POCSAG_IDLE)
    assert idx // 2 == (0x12345 & 7)


def test_end_to_end_alpha_numeric():
    pages = [PocsagPage(address=0x12345, function=3, text="CALL HOME ASAP"),
             PocsagPage(address=0x00FA7, function=0, digits="5551234 88")]
    iq = pocsag_mod(pages, FS)
    got = pocsag_decode(iq, FS)
    assert len(got) == 2
    assert got[0].address == 0x12345 and got[0].text == "CALL HOME ASAP"
    assert got[1].address == 0x00FA7 and got[1].digits == "5551234 88"


def test_end_to_end_inverted_polarity_awgn():
    pages = [PocsagPage(address=0x0BEEF, function=2, text="HELLO PAGER")]
    iq = np.conj(pocsag_mod(pages, FS))             # inverted discriminator
    rng = np.random.default_rng(0)
    iq = iq + ((rng.standard_normal(len(iq)) + 1j * rng.standard_normal(
        len(iq))).astype(np.complex64) * 0.15)
    got = pocsag_decode(iq, FS)
    assert len(got) == 1 and got[0].text == "HELLO PAGER"


def test_validation_and_empty():
    with pytest.raises(ValueError):
        pocsag_mod([PocsagPage(address=1, function=0)], 10_000.0)
    assert pocsag_decode(np.zeros(1000, np.complex64), FS) == []
