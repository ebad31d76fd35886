"""Probe: fused vs unfused QAM-64 OFDM mod at SUSTAINED spans.

The fused `map_bits_grid` won its dispatch on short spans (r4). At the
round-5 sustained span the QAM-64 row reads 1.13 Gsps vs QPSK's 8-9 G —
the fused form's k−1 prefix-XOR rolls + k−1 contribution rolls are ~10
extra passes over the 6×-longer bit stream. This measures both forms of
the FULL ofdm_mod (1024/128, QAM-64 and QPSK) with the bench's sustained
methodology to check whether the dispatch is still right at scale.

    python tools/tpu_qam64_mod_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import _size_marginal_s

from orion_sdr_tpu.multicarrier import CarrierPlan, grid_map, map_bits_grid
from orion_sdr_tpu.constellation import map_bits
from orion_sdr_tpu.ofdm import OfdmConfig, ofdm_assemble
from orion_sdr_tpu.multicarrier.ops import symbol_taper


def probe(order):
    plan = CarrierPlan(1024, 128).with_contiguous_data()
    cfg = OfdmConfig(plan, 1e6, constellation=order)
    g = cfg.grid()
    bps = cfg.bits_per_ofdm_symbol()
    sps = cfg.samples_per_ofdm_symbol()
    nd = g.num_data_carriers
    rng = np.random.default_rng(1)
    taper = symbol_taper(sps, plan.window_roll_off)

    def run_form(fused):
        def make(n_sym):
            bits = jnp.asarray(rng.integers(0, 2, (4, n_sym * bps)
                                            ).astype(np.uint8))

            @jax.jit
            def f(b):
                def body(carry, _):
                    bb, acc = carry
                    if fused:
                        freq = map_bits_grid(g, bb, order)
                    else:
                        syms = map_bits(bb, order)
                        syms = syms.reshape(syms.shape[:-1] + (-1, nd))
                        freq = grid_map(g, syms)
                    iq = ofdm_assemble(freq, plan.cp_len, taper=taper)
                    acc = acc + jnp.sum(jnp.real(iq) ** 2)
                    return (jnp.roll(bb, 1, axis=0), acc), 0.0
                (_, acc), _ = jax.lax.scan(body, (b, jnp.float32(0)),
                                           None, length=32)
                return acc
            return f, (bits,)

        per_sym, cl = _size_marginal_s(make, 32, 512, trials=9)
        rate = 4 * sps / (per_sym / 32)
        print(f"{order:6s} {'fused' if fused else 'unfused':8s}: "
              f"{rate / 1e9:.2f} Gsps clamped={cl}", flush=True)
        return rate

    fused = run_form(True)
    unfused = run_form(False)
    print(f"{order}: unfused/fused = {unfused / fused:.2f}x", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    probe("qam64")
    probe("qpsk")
