"""orion_sdr_tpu — a TPU-native SDR/DSP framework (JAX/XLA/Pallas).

Brand-new implementation of the capability set of the reference library
``skynavga/orion-sdr`` (single-core Rust block graph), re-designed TPU-first:

* signals are batched arrays with the time axis last; blocks are pure
  functions ``y, state = f(x, ..., state)`` with explicit carried state;
* linear recurrences (IIR, DC block, one-pole envelopes) run as O(log n)
  associative scans; genuinely data-dependent loops (AGC, PLLs, Viterbi)
  are ``lax.scan`` batched over channels;
* FIR/FFT/mixing are whole-capture fused XLA ops; hot irregular kernels
  use Pallas (orion_sdr_tpu.ops);
* multi-device scaling shards channels and time-blocks over a
  ``jax.sharding.Mesh`` with halo exchange (orion_sdr_tpu.parallel).

The flat namespace mirrors the reference's Python API surface
(/root/reference/docs/api.md) so users can switch directly.
"""

from . import util
from .util import (
    rms, hann, tone, gen_complex_tone, snr_db_at, power_spectrum,
    nb_spectrum_snr_db, wb_spectrum_snr_db, spectrum_bw_hz,
    SIGNAL_THRESHOLD, PSK31_BW_HZ, awgn,
)
from . import dsp
from . import constellation
from .constellation import map_bits, decide, soft_llr, BITS_PER_SYMBOL

__version__ = "0.1.0"

from . import codec
from .codec import (
    varicode_encode, varicode_decode, VaricodeEncoder, VaricodeDecoder,
    Psk31Stream,
)
from . import modulate, demodulate, sync
from . import message
from .message import pack77, unpack77, CallsignHashTable
from .codec import Ft8StreamDecoder
from . import frame, waveform
from .frame import (
    FramePacket, FrameMetadata, RxError, Mcs, McsTable,
    OfdmFrameMod, OfdmFrameDemod, OfdmFrameStreamDemod,
)
from . import ofdm as _ofdm_mod
from .ofdm import OfdmConfig
from .multicarrier import CarrierPlan, CarrierGrid, TxLowpass
from .sync.ofdm_sync import OfdmPreamble, TrainingSymbol
from .waveform import (
    DvbTLinkParams, DvbTFrameParams, dvb_t_config, dvb_t_scattered_config,
    dvb_t_mcs_table, TpsWord,
)
from .modulate import DvbTFrameMod, DvbTSuperFrameMod, DvbTSuperFrameParams
from .demodulate import (
    DvbTFrameDemod, DvbTSuperFrameDemod, DvbTFrameStreamDemod,
    DvbTRxError,
)
