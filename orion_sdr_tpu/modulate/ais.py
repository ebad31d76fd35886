"""AIS transmitter (beyond the reference): GMSK at 9600 bps — NRZI bits →
Gaussian-filtered NRZ frequency track (BT = 0.4) → FM phase accumulator
(h = 0.5 ⇒ ±2400 Hz deviation). One device program per burst."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..dsp.device import cjit
from ..dsp.osc import TAU
from .afsk import nrzi_encode

AIS_BAUD = 9600.0
AIS_DEVIATION_HZ = AIS_BAUD / 4.0          # modulation index h = 0.5
AIS_BT = 0.4


def _gauss_taps(fs: float, baud: float, bt: float) -> np.ndarray:
    sps = fs / baud
    sigma = np.sqrt(np.log(2.0)) / (2.0 * np.pi * bt) * sps
    half = int(np.ceil(3 * sigma))
    t = np.arange(-half, half + 1, dtype=np.float64)
    g = np.exp(-0.5 * (t / sigma) ** 2)
    return (g / g.sum()).astype(np.float32)


@cjit
def _gmsk_iq(line, fs: float, sps: float, dev: float, taps: tuple, n: int):
    t_idx = jnp.arange(n, dtype=jnp.float32)
    k = jnp.minimum(jnp.floor(t_idx / sps).astype(jnp.int32),
                    line.shape[-1] - 1)
    nrz = 2.0 * jnp.asarray(line)[k].astype(jnp.float32) - 1.0
    from ..dsp.fir import fir_filter_aligned
    shaped = fir_filter_aligned(nrz, np.asarray(taps, np.float32))
    phase = jnp.cumsum(jnp.float32(TAU / fs) * dev * shaped)
    return jnp.exp(1j * phase).astype(jnp.complex64)


def ais_mod(positions, fs: float = 96_000.0) -> np.ndarray:
    """Position reports (codec.ais.AisPosition) → one GMSK burst at
    ``fs`` (≥4× the 9600 baud)."""
    from ..codec.ais import ais_encode_position, ais_frames_to_bits
    if fs < 4 * AIS_BAUD:
        raise ValueError(f"fs must be ≥ {4 * AIS_BAUD:.0f} for GMSK 9600")
    payloads = [ais_encode_position(p) for p in positions]
    bits = ais_frames_to_bits(payloads)
    line = nrzi_encode(bits)
    sps = fs / AIS_BAUD
    n = int(round(len(line) * sps))
    taps = tuple(_gauss_taps(fs, AIS_BAUD, AIS_BT).tolist())  # static: the
    return np.asarray(_gmsk_iq(jnp.asarray(line), float(fs), float(sps),
                               float(AIS_DEVIATION_HZ), taps, n))
