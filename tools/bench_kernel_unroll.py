"""On-chip unroll sweep for the v5 chained-pair kernel (u4/u8/u16).

The v4 sweep picked unroll 8; v5 has one more best tile and a 3-phase
loop, so re-verify. Fresh device-generated inputs per step (relay caches
identical computations); result materialized to host.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vartrix_tpu.ops.sw_pallas import _on_tpu
from vartrix_tpu.ops.sw_pallas_v2 import _sw_pallas_v5


def main(lx=152, ly=208, R=32768, n_iter=8):
    interpret = not _on_tpu()
    if interpret:
        R, n_iter = 128, 2
    aligns = 2 * R
    cells = aligns * lx * ly
    steps = {}
    for u in (4, 8, 16):
        pad_top = u - 1

        @jax.jit
        def step(seed, _u=u, _pt=pad_top):
            kx, ky = jax.random.split(jax.random.key(seed))
            x = jax.random.randint(kx, (lx, R), 65, 69, jnp.int32)
            ybuf = jax.random.randint(ky, (_pt + 2 * lx + 2 * ly, R),
                                      65, 69, jnp.int32)
            return jnp.sum(_sw_pallas_v5(x, ybuf, lx=lx, ly=ly,
                                         interpret=interpret, unroll=_u))

        t0 = time.time()
        _ = int(step(0))
        print(f"u{u} compile+warm: {time.time()-t0:.1f}s", flush=True)
        steps[u] = step

    for window in range(3):
        for u, step in steps.items():
            t0 = time.time()
            tot = step(10_000 * window + u * 100 + 1)
            for i in range(2, n_iter + 1):
                tot = tot + step(10_000 * window + u * 100 + i)
            _ = int(tot)
            dt = (time.time() - t0) / n_iter
            print(f"u{u} window {window}: {dt*1e3:.1f} ms/batch -> "
                  f"{cells/dt/1e9:.1f} Gcells/s useful", flush=True)


if __name__ == "__main__":
    main()
