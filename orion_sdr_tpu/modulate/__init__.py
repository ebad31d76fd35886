from .analog import (
    cw_mod, CwState,
    am_mod,
    ssb_mod, SsbState,
    fm_mod, FmState,
    pm_mod,
)
from .digital import psk_qam_mod, digital_mod
