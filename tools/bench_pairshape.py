"""Microbenchmark: per-shift (C, K, K) pair blocks vs one concatenated
(C, K, S*K) block.  K = 65 pads the minor dim to 128 lanes (~2x wasted
VPU work per shift); concatenating the S = 27 shift views along the
neighbour axis pads 1755 -> 1792 (~2%).

    python tools/bench_pairshape.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    C = int(os.environ.get("PAIR_C", "8000"))      # cells
    K = int(os.environ.get("PAIR_K", "65"))
    S = 27
    reps = int(os.environ.get("PROFILE_REPS", "5"))
    key = jax.random.PRNGKey(0)
    r_i = jax.random.normal(key, (C, K, 3), jnp.float32)
    v_i = jax.random.normal(key, (C, K, 3), jnp.float32)
    h_i = jnp.abs(jax.random.normal(key, (C, K), jnp.float32)) + 0.5

    # neighbour tables per shift / concatenated
    r_nb = jax.random.normal(key, (C, S, K, 3), jnp.float32)
    v_nb = jax.random.normal(key, (C, S, K, 3), jnp.float32)
    m_nb = jnp.abs(jax.random.normal(key, (C, S, K), jnp.float32))

    def pair_math(r_t, v_t, h_t, r_j, v_j, m_j):
        """Representative force-pass op chain (w1-style piecewise kernel,
        viscosity branch, 3 reductions)."""
        dr = r_j[:, None, :, :] - r_t[:, :, None, :]
        drsqd = jnp.sum(dr * dr, axis=-1)
        inv_d = jnp.where(drsqd > 1e-24,
                          jax.lax.rsqrt(jnp.maximum(drsqd, 1e-24)), 0.0)
        drmag = drsqd * inv_d
        unit = dr * inv_d[..., None]
        s = drmag / h_t[:, :, None]
        # m4-like piecewise cubic
        w1 = jnp.where(s < 1.0, s * (2.25 * s - 3.0),
                       jnp.where(s < 2.0, -0.75 * (2.0 - s) ** 2, 0.0))
        dvdr = jnp.sum((v_j[:, None, :, :] - v_t[:, :, None, :]) * unit, -1)
        approach = dvdr < 0.0
        visc = jnp.where(approach, (1.0 - dvdr) * dvdr * w1, 0.0)
        paux = w1 * inv_d * inv_d + visc
        a = jnp.sum((m_j[:, None, :] * paux)[..., None] * unit, axis=-2)
        dudt = jnp.sum(m_j[:, None, :] * visc * dvdr, axis=-1)
        divv = jnp.sum(m_j[:, None, :] * dvdr * w1, axis=-1)
        return a, dudt, divv

    def per_shift(args):
        r_t, v_t, h_t, r_nb, v_nb, m_nb = args
        a = jnp.zeros_like(r_t)
        dudt = jnp.zeros_like(h_t)
        divv = jnp.zeros_like(h_t)
        for si in range(S):
            da, du, dv = pair_math(r_t, v_t, h_t, r_nb[:, si], v_nb[:, si],
                                   m_nb[:, si])
            a += da
            dudt += du
            divv += dv
        return a.sum() + dudt.sum() + divv.sum()

    def concat(args):
        r_t, v_t, h_t, r_nb, v_nb, m_nb = args
        a, du, dv = pair_math(r_t, v_t, h_t,
                              r_nb.reshape(C, S * K, 3),
                              v_nb.reshape(C, S * K, 3),
                              m_nb.reshape(C, S * K))
        return a.sum() + du.sum() + dv.sum()

    args = (r_i, v_i, h_i, r_nb, v_nb, m_nb)
    for name, fn in (("per-shift (C,K,K)x27", per_shift),
                     ("concat (C,K,27K)", concat)):
        jf = jax.jit(fn)
        t0 = time.perf_counter()
        v = jf(args)
        jax.block_until_ready(v)
        ct = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            v = jf(args)
        jax.block_until_ready(v)
        dt = (time.perf_counter() - t0) / reps
        gpairs = C * K * S * K / dt / 1e9
        print(f"{name:24s} {dt * 1e3:8.1f} ms  {gpairs:7.2f} Gpair/s "
              f"(compile {ct:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
