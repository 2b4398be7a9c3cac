"""Gravity operators: direct summation (stars / small N) and SPH softened
pair gravity.

Direct summation is the TPU sweet spot for N-body: the O(N^2) pairwise sums
are dense, regular and MXU/VPU-friendly (reference
Nbody::CalculateDirectGravForces, src/Nbody/Nbody.cpp:233-280, evaluates the
same sums with OpenMP loops).  G = 1 in internal units (reference SimUnits
convention).

Tree (Barnes-Hut multipole) gravity lives in gandalf_tpu.ops.tree.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..kernels.smoothing import SmoothingKernel

Array = jnp.ndarray


class GravityResult(NamedTuple):
    a: Array        # (N, ndim) gravitational acceleration
    adot: Array     # (N, ndim) jerk (zero when not requested)
    gpot: Array     # (N,) potential magnitude (positive, as reference)


def direct_nbody(r: Array, v: Array, m: Array,
                 compute_jerk: bool = True) -> GravityResult:
    """Unsoftened direct-sum gravity + jerk over all pairs.

    a_i    = sum_j m_j dr / |dr|^3
    adot_i = sum_j m_j [dv/|dr|^3 - 3 (dr.dv) dr / |dr|^5]
    gpot_i = sum_j m_j / |dr|      (positive magnitude, reference convention)
    """
    dr = r[None, :, :] - r[:, None, :]          # (N, N, ndim), j - i
    drsqd = jnp.sum(dr * dr, axis=-1)
    eye = jnp.eye(r.shape[0], dtype=bool)
    inv_dr = jnp.where(eye, 0.0, 1.0 / jnp.sqrt(jnp.where(eye, 1.0, drsqd)))
    inv_dr3 = inv_dr * inv_dr * inv_dr
    a = jnp.sum((m[None, :] * inv_dr3)[..., None] * dr, axis=1)
    gpot = jnp.sum(m[None, :] * inv_dr, axis=1)
    if compute_jerk:
        dv = v[None, :, :] - v[:, None, :]
        drdv = jnp.sum(dr * dv, axis=-1)
        adot = jnp.sum(
            (m[None, :] * inv_dr3)[..., None]
            * (dv - (3.0 * drdv * inv_dr * inv_dr)[..., None] * dr),
            axis=1)
    else:
        adot = jnp.zeros_like(a)
    return GravityResult(a=a, adot=adot, gpot=gpot)


def direct_softened(r: Array, v: Array, m: Array, h: Array,
                    kern: SmoothingKernel,
                    compute_jerk: bool = False) -> GravityResult:
    """Kernel-softened direct gravity with mean-h softening
    (reference grav_kernel = "mean_h"; Nbody.cpp softened variants):

    a_i = sum_j m_j wgrav(s) / hbar^2 * dr_hat,  s = |dr| / hbar,
    hbar = (h_i + h_j)/2; potential uses wpot(s)/hbar.
    """
    dr = r[None, :, :] - r[:, None, :]
    drsqd = jnp.sum(dr * dr, axis=-1)
    eye = jnp.eye(r.shape[0], dtype=bool)
    drmag = jnp.sqrt(jnp.where(eye, 1.0, drsqd))
    inv_drmag = jnp.where(eye, 0.0, 1.0 / drmag)
    hbar = 0.5 * (h[:, None] + h[None, :])
    invh = 1.0 / hbar
    s = drmag * invh
    wg = kern.wgrav(s) * invh * invh
    unit = dr * inv_drmag[..., None]
    a = jnp.sum((m[None, :] * wg * jnp.where(eye, 0.0, 1.0))[..., None]
                * unit, axis=1)
    gpot = jnp.sum(jnp.where(eye, 0.0, m[None, :] * kern.wpot(s) * invh),
                   axis=1)
    if compute_jerk:
        # softened jerk approximated with the Newtonian form outside the
        # kernel; adequate because softened systems use P(EC)^n iteration
        dv = v[None, :, :] - v[:, None, :]
        drdv = jnp.sum(dr * dv, axis=-1)
        inv_dr3 = inv_drmag ** 3
        adot = jnp.sum(
            (m[None, :] * inv_dr3)[..., None]
            * (dv - (3.0 * drdv * inv_drmag * inv_drmag)[..., None] * dr),
            axis=1)
    else:
        adot = jnp.zeros_like(a)
    return GravityResult(a=a, adot=adot, gpot=gpot)


def external_potential_accel(name: str, params, r: Array) -> Array:
    """External analytic potentials (reference ExternalPotential.h:45-173)."""
    if name == "none":
        return jnp.zeros_like(r)
    if name == "plummer":
        mpl = params.floatparams["mplummer_extpot"]
        rpl = params.floatparams["rplummer_extpot"]
        rsqd = jnp.sum(r * r, axis=-1, keepdims=True)
        return -mpl * r / (rsqd + rpl * rpl) ** 1.5
    if name == "vertical":
        # constant vertical acceleration avert along the last dimension
        avert = params.floatparams["avert"]
        a = jnp.zeros_like(r)
        return a.at[:, -1].set(avert)
    if name == "silcc":
        # the reference SilccPotential::AddExternalPotential body is empty
        # (ExternalPotential.h SilccPotential) — parity: no force
        return jnp.zeros_like(r)
    raise ValueError(f"Unrecognised external_potential: {name!r}")
