"""On-chip A/B: v5 chained-pair kernel vs v6 quad-chain kernel (k=4).

Equal work per timed batch: v5 runs R lanes (one read vs ref++alt per
lane), v6 runs R/2 lanes (two reads, four chained segments per lane) —
both score R reads against a ref+alt haplotype pair. Inputs are
generated ON DEVICE with a fresh seed per step (the axon relay caches
identical computations) and the result is materialized to host
(block_until_ready is unreliable through the relay).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vartrix_tpu.ops.sw_pallas import _on_tpu
from vartrix_tpu.ops.sw_pallas_v2 import (_sw_pallas_v5, _sw_pallas_v6,
                                          quad_feasible)


def main(lx=152, ly=208, R=32768, n_iter=8):
    interpret = not _on_tpu()
    if interpret:
        R, n_iter = 256, 2
    assert quad_feasible(lx, ly)
    B5 = R        # v5 lanes (ref+alt chained per lane)
    B6 = R // 2   # v6 lanes (2 reads x ref+alt per lane)

    @jax.jit
    def step_v5(seed):
        kx, ky = jax.random.split(jax.random.key(seed))
        x = jax.random.randint(kx, (lx, B5), 65, 69, jnp.int32)
        ybuf = jax.random.randint(ky, (7 + 2 * lx + 2 * ly, B5), 65, 69,
                                  jnp.int32)
        return jnp.sum(_sw_pallas_v5(x, ybuf, lx=lx, ly=ly,
                                     interpret=interpret))

    @jax.jit
    def step_v6(seed):
        kx, ky = jax.random.split(jax.random.key(seed))
        x = jax.random.randint(kx, (2 * lx, B6), 65, 69, jnp.int32)
        ybuf = jax.random.randint(ky, (7 + 2 * lx + 4 * ly, B6), 65, 69,
                                  jnp.int32)
        return jnp.sum(_sw_pallas_v6(x, ybuf, lx=lx, ly=ly,
                                     interpret=interpret))

    aligns = 2 * R            # pair scores per batch
    cells = aligns * lx * ly  # useful DP cells per batch

    for name, step in (("v5-chained", step_v5), ("v6-quad", step_v6)):
        t0 = time.time()
        _ = int(step(0))
        print(f"{name} compile+warm: {time.time()-t0:.1f}s", flush=True)

    for window in range(3):
        for name, step in (("v5-chained", step_v5), ("v6-quad", step_v6)):
            t0 = time.time()
            tot = step(10_000 * window + (1 if name == "v5-chained" else 5001))
            for i in range(2, n_iter + 1):
                tot = tot + step(10_000 * window + i
                                 + (0 if name == "v5-chained" else 5000))
            _ = int(tot)
            dt = (time.time() - t0) / n_iter
            print(f"{name} window {window}: {dt*1e3:.1f} ms/batch "
                  f"({aligns} aligns) -> {aligns/dt/1e6:.3f} M aligns/s "
                  f"({cells/dt/1e9:.1f} Gcells/s useful)", flush=True)


if __name__ == "__main__":
    main()
