"""FM broadcast stereo receiver (pilot-tone system) with RDS — beyond the
reference (its FM demod is mono: demodulate/fm.rs).

RX chain: quadrature discriminator → MPX; the 19 kHz pilot is lowpass-
isolated at complex baseband and its UNIT PHASOR u = p/|p| regenerates the
38 kHz (u²) and 57 kHz (u³) subcarrier references — the same power-of-one-
phasor construction the TX uses, so ramp rounding cancels and the stereo
difference channel demodulates fully coherently. Everything through the
RDS baseband is ONE batched device program; RDS bit timing + group decode
are host-side (text-rate work).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from ..dsp.device import cjit as _cjit
from ..dsp.fir import (kaiser_lowpass_taps, kaiser_num_taps,
                       fir_filter_aligned, fir_filter_aligned_bank)
from ..dsp.osc import TAU
from ..dsp.recurrence import first_order
from ..modulate.fm_stereo import FM_STEREO_PILOT_HZ, FM_STEREO_MIN_FS
from .analog import _delay_conj_product


class FmStereoAudio(NamedTuple):
    """Stereo receive result. ``pilot_level`` is the recovered 19 kHz pilot
    amplitude relative to full-scale MPX (TX default 0.09; ≈0 on a mono
    signal — gate stereo blend on it). ``rds`` is a codec.rds.RdsData when
    ``decode_rds=True`` and the subcarrier carried decodable groups."""
    left: np.ndarray
    right: np.ndarray
    mono: np.ndarray
    pilot_level: float
    rds: Optional[object]
    rds_bits: Optional[np.ndarray]


@_cjit
def _stereo_device(re, im, fs: float, deviation_hz: float,
                   audio_bw_hz: float, audio_level: float, want_rds: bool):
    """Discriminator → pilot phasor → coherent mono/difference (+ RDS
    baseband) in one program. Returns (mono, sub, pilot_mag, rds_bb) —
    the RDS baseband is already real (the coherent Re() happens in-jit)."""
    z = re + 1j * im
    prod = _delay_conj_product(z, jnp.ones(z.shape[:-1], jnp.complex64))
    mpx = (jnp.arctan2(prod.imag, prod.real)
           * (fs / (TAU * deviation_hz))).astype(jnp.float32)
    n = mpx.shape[-1]
    w = TAU * FM_STEREO_PILOT_HZ / fs
    e1 = jnp.exp(-1j * w * jnp.arange(1, n + 1, dtype=jnp.float32))
    # Kaiser designs throughout: the reference-parity "minimal" Hann-sinc
    # design keeps its center tap 1/(2fc)× too heavy (faithful to
    # dsp/fir.rs:14-45) and degenerates toward a delta at the narrow
    # relative cutoffs a 240 kHz composite needs.
    pil_taps = kaiser_lowpass_taps(kaiser_num_taps(900.0 / fs, 60.0),
                                   500.0 / fs, 60.0)
    aud_taps = kaiser_lowpass_taps(kaiser_num_taps(5000.0 / fs, 60.0),
                                   (audio_bw_hz + 1000.0) / fs, 60.0)
    rds_taps = kaiser_lowpass_taps(kaiser_num_taps(2400.0 / fs, 50.0),
                                   2100.0 / fs, 50.0)
    # all four long FIRs fuse into ONE overlap-save bank program: a
    # single-channel call is latency-bound (~1.5-3 ms each on chip; the
    # four summed to ~10.9 ms — profiled round 4), the fused bank runs
    # them as one batched FFT triple
    pairs = [(mpx * e1, pil_taps), (mpx, aud_taps),
             (mpx * (e1 * e1), aud_taps)]
    if want_rds:
        pairs.append((mpx * (e1 * e1 * e1), rds_taps))
    outs = fir_filter_aligned_bank(pairs)
    p, mono, v = outs[0], outs[1] / audio_level, outs[2]
    u = p / jnp.maximum(jnp.abs(p), 1e-12)
    pilot_mag = 2.0 * jnp.mean(jnp.abs(p), axis=-1)
    sub = 2.0 * (v * jnp.conj(u * u)).real / audio_level

    if want_rds:
        rbb = 2.0 * (outs[3] * jnp.conj(u * u * u)).real
    else:
        rbb = jnp.zeros_like(mono)
    return (mono.astype(jnp.float32), sub.astype(jnp.float32),
            pilot_mag.astype(jnp.float32), rbb.astype(jnp.float32))


def _rds_bits_from_baseband(rbb: np.ndarray, fs: float) -> np.ndarray:
    """Manchester baseband → bits: half-bit integrate-and-dump with a
    timing-offset search (the aligned offset maximizes |first − second|
    half energy), then differential decode."""
    from ..codec.rds import RDS_SYMBOL_RATE
    sps = fs / RDS_SYMBOL_RATE
    n_bits = int(len(rbb) / sps) - 2
    if n_bits < 8:
        return np.zeros(0, np.uint8)
    t_idx = np.arange(len(rbb))
    best = None
    for off in np.arange(0.0, sps, sps / 16.0):
        k = np.floor((t_idx - off) / sps).astype(np.int64)   # floor, not
        half = ((t_idx - off) / sps - k) >= 0.5              # truncation:
        # pre-offset samples must land at k = −1 and fail the valid gate,
        # not pour into bit 0
        valid = (k >= 0) & (k < n_bits)
        first = np.bincount(k[valid & ~half], rbb[valid & ~half],
                            minlength=n_bits)
        second = np.bincount(k[valid & half], rbb[valid & half],
                             minlength=n_bits)
        diff = first - second
        score = float(np.mean(np.abs(diff)))
        if best is None or score > best[0]:
            best = (score, diff)
    d = (best[1] < 0).astype(np.uint8)        # symbol = differential bit d_i
    return d[1:] ^ d[:-1]                     # b_i = d_i ^ d_{i-1}


def fm_stereo_demod(iq, fs, deviation_hz: float = 75e3,
                    audio_bw_hz: float = 15e3, de_emphasis_us: float = 0.0,
                    audio_level: float = 0.9,
                    decode_rds: bool = False) -> FmStereoAudio:
    """Broadcast-FM stereo receive: (…, n) IQ at ``fs`` (≥120 kHz, the
    composite rate) → left/right audio at the same rate (decimate
    downstream), pilot measurement, optional RDS text. Batched leading
    dims demodulate together in one device program; RDS group decode runs
    per channel on the host."""
    if fs < FM_STEREO_MIN_FS:
        raise ValueError(f"fm_stereo_demod needs fs ≥ {FM_STEREO_MIN_FS:.0f},"
                         f" got {fs}")
    z = np.asarray(iq)
    mono, sub, pilot_mag, rbb = _stereo_device(
        np.ascontiguousarray(z.real, dtype=np.float32),
        np.ascontiguousarray(z.imag, dtype=np.float32),
        float(fs), float(deviation_hz), float(audio_bw_hz),
        float(audio_level), bool(decode_rds))
    left = mono + sub
    right = mono - sub
    if de_emphasis_us > 0.0:
        a = float(np.exp(-1.0 / (fs * de_emphasis_us * 1e-6)))
        left = np.asarray(first_order(a, (1.0 - a) * left)[0])
        right = np.asarray(first_order(a, (1.0 - a) * right)[0])
        mono = np.asarray(first_order(a, (1.0 - a) * mono)[0])
    rds_data, rds_bits = None, None
    if decode_rds:
        from ..codec.rds import rds_decode_bits
        if z.ndim == 1:
            rds_bits = _rds_bits_from_baseband(np.asarray(rbb), fs)
            rds_data = rds_decode_bits(rds_bits)
        else:
            rds_bits = [_rds_bits_from_baseband(np.asarray(r), fs)
                        for r in np.asarray(rbb).reshape(-1, rbb.shape[-1])]
            rds_data = [rds_decode_bits(b) for b in rds_bits]
    return FmStereoAudio(left=left, right=right, mono=mono,
                         pilot_level=(float(pilot_mag) if z.ndim == 1
                                      else np.asarray(pilot_mag)),
                         rds=rds_data, rds_bits=rds_bits)


class FmStation(NamedTuple):
    """One broadcast station recovered by :func:`fm_band_demod`."""
    center_hz: float
    audio: FmStereoAudio


def fm_band_demod(iq, fs, stations_hz=None, deviation_hz: float = 75e3,
                  de_emphasis_us: float = 0.0, decode_rds: bool = False,
                  scan_threshold_db: float = 10.0,
                  min_station_bw_hz: float = 100e3) -> list:
    """Gateway receive of a whole FM broadcast band: scan (or take) station
    centers, channelize every station out of the wideband capture in ONE
    batched device program (dsp.Channelizer), then stereo-demodulate all of
    them together as one batched program. Beyond the reference, whose FM
    demod is one mono channel at a time.

    ``stations_hz``: offsets from the capture center; None = blind
    :func:`orion_sdr_tpu.spectrum_scan` keeping segments wider than
    ``min_station_bw_hz``. Returns [FmStation], strongest first when
    scanned. Audio comes back at the channel rate fs/m (m chosen so the
    channel rate lands in [240k, 480k))."""
    from ..dsp.channelizer import Channelizer
    z = np.asarray(iq)
    if z.ndim != 1:
        raise ValueError("fm_band_demod takes a 1-D wideband capture")
    if stations_hz is None:
        from ..util import spectrum_scan
        segs = spectrum_scan(z, fs, threshold_db=scan_threshold_db,
                             min_bw_hz=min_station_bw_hz)
        stations_hz = [s.center_hz for s in segs]
    stations_hz = list(stations_hz)
    if not stations_hz:
        return []
    m = max(1, int(fs // 240_000.0))
    ch_fs = fs / m
    if ch_fs < FM_STEREO_MIN_FS:
        raise ValueError(f"capture rate {fs} too low for the 57 kHz "
                         f"composite (channel rate {ch_fs:.0f})")
    chan = Channelizer(fs, ch_fs, stations_hz, passband_hz=60_000.0)
    parts = [chan.push(z), chan.flush()]
    chans = np.concatenate([p for p in parts if p.shape[-1]], axis=-1)
    out = fm_stereo_demod(chans, ch_fs, deviation_hz=deviation_hz,
                          de_emphasis_us=de_emphasis_us,
                          decode_rds=decode_rds)
    result = []
    for i, c_hz in enumerate(stations_hz):
        audio = FmStereoAudio(
            left=out.left[i], right=out.right[i], mono=out.mono[i],
            pilot_level=float(out.pilot_level[i]),
            rds=(out.rds[i] if decode_rds else None),
            rds_bits=(out.rds_bits[i] if decode_rds else None))
        result.append(FmStation(center_hz=float(c_hz), audio=audio))
    return result
