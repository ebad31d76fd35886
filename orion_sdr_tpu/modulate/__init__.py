from .analog import (
    cw_mod, CwState,
    am_mod,
    ssb_mod, SsbState,
    fm_mod, FmState,
    pm_mod,
)
from .digital import psk_qam_mod, digital_mod
from .psk31 import (
    PSK31_BAUD, PSK31_SPS_8000, PSK31_SPS_12000,
    PSK31_PREAMBLE_BITS, PSK31_POSTAMBLE_BITS,
    psk31_sps, psk31_hann,
    bpsk31_mod_bits, qpsk31_mod_bits, bpsk31_mod_text, qpsk31_mod_text,
)
