"""OFDM frame modulator (behavioral spec: modulate/ofdm_frame.rs:735-912).

Assembles [preamble+training][header][payload] as one flat IQ stream. The
header is a fixed BPSK + rate-1/2 LDPC block (wire layout: mcs 1B,
payload_len 4B, seq 4B, flags 1B, seed 4B, big-endian + CRC); the payload is
coded per the selected MCS. Symbol windowing tapers every CP-bearing symbol
(training onward) but never the raw S&C repeats; the TX lowpass runs last
over the whole burst.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ofdm import OfdmConfig, ofdm_mod
from ..multicarrier import symbol_taper
from ..sync.ofdm_sync import OfdmPreamble, generate_ofdm_preamble
from .types import (FramePacket, Mcs, McsTable, OuterFec, InnerFec,
                    InterleaverKind, ScramblerKind, header_has_block,
                    SCRAMBLER_BEFORE_OUTER)
from .chain import encode_chain

HEADER_FIELD_BYTES = 14
HEADER_CONSTELLATION = "bpsk"
HEADER_LDPC = "N512R12"


def pack_header_fields(mcs_index: int, payload_len: int, sequence_num: int,
                       flags: int, scrambler_seed: int) -> np.ndarray:
    """14 header bytes, big-endian (ref pack_header_fields)."""
    out = np.zeros(HEADER_FIELD_BYTES, np.uint8)
    out[0] = mcs_index & 0xFF
    out[1:5] = np.frombuffer(int(payload_len).to_bytes(4, "big"), np.uint8)
    out[5:9] = np.frombuffer(int(sequence_num).to_bytes(4, "big"), np.uint8)
    out[9] = flags & 0xFF
    out[10:14] = np.frombuffer(int(scrambler_seed).to_bytes(4, "big"), np.uint8)
    return out


def header_block_plan(cfg: OfdmConfig):
    from .chain import block_plan
    return block_plan(HEADER_FIELD_BYTES, cfg.header_crc, OuterFec.none(),
                      InnerFec.ldpc(HEADER_LDPC), InterleaverKind.none(),
                      InterleaverKind.none())


def symbols_for_coded_bits(cfg: OfdmConfig, constellation: str,
                           bits: int) -> int:
    from ..constellation import BITS_PER_SYMBOL
    bps = cfg.carrier_plan.num_data_carriers() * BITS_PER_SYMBOL[constellation]
    return -(-bits // bps)


def _map_bits(cfg: OfdmConfig, constellation: str, bits) -> np.ndarray:
    from dataclasses import replace
    sym_cfg = replace(cfg, constellation=constellation, tx_lowpass=None)
    iq, _ = ofdm_mod(sym_cfg, jnp.asarray(np.asarray(bits, np.uint8)))
    return np.asarray(iq)


class OfdmFrameMod:
    """Frame modulator over a config, MCS table and acquisition preamble."""

    def __init__(self, cfg: OfdmConfig, mcs_table: McsTable,
                 preamble: OfdmPreamble, cache=None) -> None:
        # ``cache``: reference-compat CodecCache slot (codes memoize
        # process-wide here; accepted and ignored)
        self.cfg = cfg
        self.mcs_table = mcs_table
        self.preamble = preamble

    def modulate_frame(self, frame: FramePacket,
                       per_frame_seed: int = 0) -> np.ndarray:
        cfg = self.cfg
        parts = []

        # 1. S&C repeats + training symbol; the training symbol is windowed
        #    below with the data symbols, the raw repeats are not.
        pre = generate_ofdm_preamble(self.preamble) * cfg.gain
        parts.append(pre.astype(np.complex64))

        # 2. Header block (OrionSdr format only).
        if header_has_block(cfg.header_format):
            fields = pack_header_fields(
                frame.metadata.mcs_index, len(frame.payload),
                frame.metadata.sequence_num, frame.metadata.flags,
                per_frame_seed)
            header_bits = encode_chain(
                fields, cfg.header_crc, OuterFec.none(),
                InnerFec.ldpc(HEADER_LDPC), InterleaverKind.none(),
                InterleaverKind.none(), ScramblerKind.none(),
                SCRAMBLER_BEFORE_OUTER, 0)
            parts.append(_map_bits(cfg, HEADER_CONSTELLATION, header_bits))

        # 3. Payload at the frame's MCS.
        mcs = self.mcs_table.get(frame.metadata.mcs_index)
        assert mcs is not None, "mcs_index must be in the MCS table"
        payload_bits = encode_chain(
            frame.payload, cfg.payload_crc, mcs.outer_fec, mcs.inner_fec,
            cfg.outer_interleaver, cfg.inner_interleaver, cfg.scrambler,
            cfg.scrambler_pos, per_frame_seed)
        parts.append(_map_bits(cfg, mcs.constellation, payload_bits))

        out = np.concatenate(parts)

        # 4. Symbol windowing post-pass over CP-bearing symbols. ofdm_mod
        #    already tapered header/payload symbols via the plan, so only the
        #    training symbol still needs its taper here.
        roll_off = cfg.carrier_plan.window_roll_off
        t = self.preamble.training_symbol
        if roll_off and t is not None:
            start = self.preamble.num_repeats * self.preamble.repeat_len
            sps = t.n_fft + t.cp_len
            taper = symbol_taper(sps, roll_off)
            if taper is not None:
                out[start:start + sps] *= taper

        # 5. TX spectral mask over the entire burst (S&C included — a real
        #    transmitter band-limits everything it emits).
        if cfg.tx_lowpass is not None:
            out = np.asarray(cfg.tx_lowpass.apply(jnp.asarray(out)))
        return out.astype(np.complex64)
