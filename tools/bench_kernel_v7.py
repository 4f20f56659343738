"""On-chip A/B: v6 quad-chain (nr=2) vs v7 generalized chain at nr=4.

Equal work per timed batch: both arms score R reads against a ref+alt
pair; v6 uses R/2 lanes (4 segments), v7(nr=4) uses R/4 lanes (8
segments; issued diagonals per 4 pairs lx+8ly-1 vs 2*(lx+4ly-1),
-7.7% at 152x208). Fresh on-device inputs per step; result materialized
to host.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vartrix_tpu.ops.sw_pallas import _on_tpu
from vartrix_tpu.ops.sw_pallas_v2 import (_sw_pallas_v6, _sw_pallas_v7,
                                          chainN_feasible)


def main(lx=152, ly=208, R=32768, n_iter=8):
    interpret = not _on_tpu()
    if interpret:
        R, n_iter = 512, 2
    assert chainN_feasible(lx, ly, 4)

    @jax.jit
    def step_v6(seed):
        kx, ky = jax.random.split(jax.random.key(seed))
        x = jax.random.randint(kx, (2 * lx, R // 2), 65, 69, jnp.int32)
        ybuf = jax.random.randint(ky, (7 + 2 * lx + 4 * ly, R // 2),
                                  65, 69, jnp.int32)
        return jnp.sum(_sw_pallas_v6(x, ybuf, lx=lx, ly=ly,
                                     interpret=interpret))

    @jax.jit
    def step_v7(seed):
        kx, ky = jax.random.split(jax.random.key(seed))
        x = jax.random.randint(kx, (4 * lx, R // 4), 65, 69, jnp.int32)
        ybuf = jax.random.randint(ky, (7 + 2 * lx + 8 * ly, R // 4),
                                  65, 69, jnp.int32)
        return jnp.sum(_sw_pallas_v7(x, ybuf, lx=lx, ly=ly, nr=4,
                                     interpret=interpret))

    aligns = 2 * R
    cells = aligns * lx * ly

    for name, step in (("v6-quad", step_v6), ("v7-nr4", step_v7)):
        t0 = time.time()
        _ = int(step(0))
        print(f"{name} compile+warm: {time.time()-t0:.1f}s", flush=True)

    for window in range(3):
        for name, step in (("v6-quad", step_v6), ("v7-nr4", step_v7)):
            t0 = time.time()
            tot = step(10_000 * window + (1 if name == "v6-quad" else 5001))
            for i in range(2, n_iter + 1):
                tot = tot + step(10_000 * window + i
                                 + (0 if name == "v6-quad" else 5000))
            _ = int(tot)
            dt = (time.time() - t0) / n_iter
            print(f"{name} window {window}: {dt*1e3:.1f} ms/batch "
                  f"({aligns} aligns) -> {aligns/dt/1e6:.3f} M aligns/s "
                  f"({cells/dt/1e9:.1f} Gcells/s useful)", flush=True)


if __name__ == "__main__":
    main()
