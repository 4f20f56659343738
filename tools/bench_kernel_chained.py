"""On-chip A/B: v4 pair kernel vs v5 chained-pair kernel (corner packing).

Equal work per timed batch: v4 runs 2R lanes (one per pair), v5 runs R
lanes (two chained problems per lane) — both score R reads against a
ref+alt haplotype pair. Inputs are generated ON DEVICE with a fresh seed
per step (the axon relay caches identical computations) and the result is
materialized to host (block_until_ready is unreliable through the relay).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vartrix_tpu.ops.sw_pallas import _on_tpu
from vartrix_tpu.ops.sw_pallas_v2 import _sw_pallas_v2, _sw_pallas_v5


def main(lx=152, ly=208, R=32768, n_iter=8):
    interpret = not _on_tpu()
    if interpret:
        R, n_iter = 128, 2
    B4 = 2 * R   # v4 lanes (one pair per lane)
    B5 = R       # v5 lanes (ref+alt chained per lane)

    @jax.jit
    def step_v4(seed):
        kx, ky = jax.random.split(jax.random.key(seed))
        x = jax.random.randint(kx, (lx, B4), 65, 69, jnp.int32)
        ybuf = jax.random.randint(ky, (7 + 2 * lx + ly, B4), 65, 69,
                                  jnp.int32)
        return jnp.sum(_sw_pallas_v2(x, ybuf, lx=lx, ly=ly,
                                     interpret=interpret))

    @jax.jit
    def step_v5(seed):
        kx, ky = jax.random.split(jax.random.key(seed))
        x = jax.random.randint(kx, (lx, B5), 65, 69, jnp.int32)
        ybuf = jax.random.randint(ky, (7 + 2 * lx + 2 * ly, B5), 65, 69,
                                  jnp.int32)
        return jnp.sum(_sw_pallas_v5(x, ybuf, lx=lx, ly=ly,
                                     interpret=interpret))

    aligns = 2 * R           # pair scores per batch
    cells = aligns * lx * ly  # useful DP cells per batch

    for name, step in (("v4-pair", step_v4), ("v5-chained", step_v5)):
        t0 = time.time()
        _ = int(step(0))
        print(f"{name} compile+warm: {time.time()-t0:.1f}s", flush=True)

    for window in range(3):
        for name, step in (("v4-pair", step_v4), ("v5-chained", step_v5)):
            t0 = time.time()
            tot = step(10_000 * window + (1 if name == "v4-pair" else 5001))
            for i in range(2, n_iter + 1):
                tot = tot + step(10_000 * window + i
                                 + (0 if name == "v4-pair" else 5000))
            _ = int(tot)
            dt = (time.time() - t0) / n_iter
            print(f"{name} window {window}: {dt*1e3:.1f} ms/batch "
                  f"({aligns} aligns) -> {aligns/dt/1e6:.3f} M aligns/s "
                  f"({cells/dt/1e9:.1f} Gcells/s useful)", flush=True)


if __name__ == "__main__":
    main()
