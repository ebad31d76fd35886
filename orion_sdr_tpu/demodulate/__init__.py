from .analog import (
    cw_demod,
    am_demod,
    ssb_demod, SsbDemodState,
    fm_demod, pm_demod, QuadDemodState,
)
from .digital import psk_qam_demod, digital_demod
