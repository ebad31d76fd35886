from .sharding import (
    make_mesh,
    shard_channels,
    fir_overlap_save_sharded,
    fm_demod_sharded,
    ofdm_soft_demap_sharded,
    dvb_t_receive_sharded,
)
