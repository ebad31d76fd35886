"""Isolate the chip stall: XLA conv with large tap counts on a 131k
input (the FM stereo pilot FIR shape). Each step runs in a subprocess
with its own timeout so a stall is attributed and skipped.

    python tools/tpu_conv_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    t0 = time.time()
    s = float(jnp.sum(jnp.ones((64, 64), jnp.float32)))
    print(f"probe {s} in {time.time() - t0:.1f}s", flush=True)

    n = 1 << 17
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)

    def conv_path(T):
        t = rng.standard_normal(T).astype(np.float32)

        @jax.jit
        def f(xx):
            xb = xx.reshape((1, 1, -1))
            k = jnp.asarray(t)[::-1].reshape((1, 1, -1))
            y = lax.conv_general_dilated(
                xb, k, window_strides=(1,), padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"))
            return jnp.sum(y)
        t0 = time.time()
        v = float(np.asarray(f(x)))
        print(f"conv T={T}: {v:.3f} in {time.time() - t0:.1f}s", flush=True)

    def os_path(T, block):
        t = rng.standard_normal(T).astype(np.float32)

        @jax.jit
        def f(xx):
            hop = block - T + 1
            n_out = n - (T - 1)
            nblk = -(-n_out // hop)
            total = nblk * hop + T - 1
            xb = jnp.pad(xx, (0, total - n))
            idx = np.arange(nblk)[:, None] * hop + np.arange(block)[None, :]
            blocks = xb[idx]
            H = jnp.fft.rfft(jnp.asarray(t)[::-1], block)
            Y = jnp.fft.rfft(blocks, axis=-1) * H
            y = jnp.fft.irfft(Y, block, axis=-1)[..., T - 1:]
            return jnp.sum(y.reshape(-1)[:n_out])
        t0 = time.time()
        v = float(np.asarray(f(x)))
        print(f"ovs T={T} B={block}: {v:.3f} in {time.time() - t0:.1f}s",
              flush=True)

    if which in ("all", "conv255"):
        conv_path(255)
    if which in ("all", "conv511"):
        conv_path(511)
    if which in ("all", "conv967"):
        conv_path(967)
    if which in ("all", "ovs"):
        os_path(967, 8192)
        os_path(255, 4096)
    print("STEP DONE", flush=True)


if __name__ == "__main__":
    main()
