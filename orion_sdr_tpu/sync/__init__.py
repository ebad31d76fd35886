from .ofdm_sync import (
    OfdmPreamble,
    TrainingSymbol,
    OfdmSyncResult,
    ofdm_sync,
    sc_metric,
    generate_ofdm_preamble,
    training_symbol_freq_pattern,
    pseudo_random_unit_sequence,
    estimate_integer_cfo_bins,
)
from .waterfall import compute_waterfall
from .psk31_sync import psk31_sync, best_sync, Psk31SyncResult
from .costas import Candidate, costas_score, find_candidates
from .ft8_sync import ft8_sync, ft4_sync, FtSyncResult
from .dvb_t_gi_sync import (
    GiSyncConfig, GiSyncResult, dvb_t_gi_sync, dvb_t_gi_refine,
    IntegerCfoResult, dvb_t_integer_cfo,
)
