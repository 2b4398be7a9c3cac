"""Grad-h SPH self-gravity (all-pairs, kernel-softened, zeta-corrected).

Vectorisation of GradhSph::ComputeSphGravForces + ComputeDirectGravForces
(src/GradhSph/GradhSph.cpp:598-695).  Because wgrav(s) -> 1/s^2 and
w1(s) -> 0 beyond kernel support, the symmetric smoothed-pair formula
degenerates to the Newtonian direct sum automatically, so one all-pairs
evaluation covers both the "SPH neighbour" and "direct" branches of the
reference's tree walk.  G = 1 internal units.

The Barnes-Hut multipole far-field (ops.tree) replaces the direct sum at
scale; this module remains the small-N path and the tree's oracle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..kernels.smoothing import SmoothingKernel

Array = jnp.ndarray


class SphGravityResult(NamedTuple):
    a: Array        # (N, ndim) gravitational acceleration
    gpot: Array     # (N,) potential magnitude (positive, reference sign)


def direct_sph_gravity(kern: SmoothingKernel,
                       r: Array, m: Array, h: Array,
                       zeta: Array, hfactor: Array) -> SphGravityResult:
    """Symmetric smoothed gravity over all pairs.

    paux = 0.5*[ wgrav(s_i)/h_i^2 + zeta_i*hfactor_i*w1(s_i)
               + wgrav(s_j)/h_j^2 + zeta_j*hfactor_j*w1(s_j) ]
    a_i += m_j * paux * dr_hat;  gpot_i += m_j * 0.5*(wpot_i/h_i + wpot_j/h_j)
    (GradhSph.cpp:598-640)
    """
    N = r.shape[0]
    dr = r[None, :, :] - r[:, None, :]
    drsqd = jnp.sum(dr * dr, axis=-1)
    eye = jnp.eye(N, dtype=bool)
    drmag = jnp.sqrt(jnp.where(eye, 1.0, drsqd))
    inv_drmag = jnp.where(eye, 0.0, 1.0 / drmag)
    unit = dr * inv_drmag[..., None]

    invh_i = (1.0 / h)[:, None]
    invh_j = (1.0 / h)[None, :]
    s_i = drmag * invh_i
    s_j = drmag * invh_j
    paux = 0.5 * (
        invh_i * invh_i * kern.wgrav(s_i)
        + (zeta * hfactor)[:, None] * kern.w1(s_i)
        + invh_j * invh_j * kern.wgrav(s_j)
        + (zeta * hfactor)[None, :] * kern.w1(s_j)
    )
    gaux = 0.5 * (invh_i * kern.wpot(s_i) + invh_j * kern.wpot(s_j))
    paux = jnp.where(eye, 0.0, paux)
    gaux = jnp.where(eye, 0.0, gaux)
    a = jnp.sum((m[None, :] * paux)[..., None] * unit, axis=1)
    gpot = jnp.sum(m[None, :] * gaux, axis=1)
    return SphGravityResult(a=a, gpot=gpot)
