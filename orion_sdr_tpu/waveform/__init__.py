from .dvb_t import (
    dvb_t_prbs_bits, dvb_t_prbs_bytes, energy_disperse,
)
