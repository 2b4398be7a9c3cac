"""Saitoh & Makino (2012) density-independent SPH.

TPU-native vectorisation of SM2012Sph (src/SM2013/SM2012Sph.cpp): the
pressure force is built from the smoothed internal-energy density
q_i = (1/h^ndim) sum_j m_j u_j W(r_ij, h_i) instead of rho, which removes
the spurious surface tension at contact discontinuities:

  paux  = (gamma-1)/2 u_i u_j (1/q_i + 1/q_j) (w1_i hfac_i + w1_j hfac_j)
  a_i  += m_j paux r_hat
  dudt_i += (gamma-1)/2 u_i/q_i sum_j m_j u_j dvdr (w1_i hfac_i + w1_j hfac_j)

plus the standard mon97 artificial viscosity (SM2012Sph.cpp:293-415).
The h iteration is the plain h-rho fixed point (no grad-h Omega/zeta
corrections; SM2012Sph.cpp:133-240).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..kernels.smoothing import SmoothingKernel
from ..state import DomainBox
from .density import compute_h
from .forces import AVISC_MON97MM97, AVISC_NONE, ArtificialViscosity

Array = jnp.ndarray


class Sm2012Density(NamedTuple):
    h: Array
    rho: Array
    q: Array           # smoothed internal-energy density
    hfactor: Array     # 1/h^(ndim+1)


def sm2012_density(kern: SmoothingKernel, box: DomainBox,
                   h_fac: float, h_converge: float,
                   r: Array, m: Array, u: Array, h_init: Array,
                   r_ext: Array, m_ext: Array, u_ext: Array,
                   active: Optional[Array] = None) -> Sm2012Density:
    """h-rho iteration + the q sum at the converged h
    (SM2012Sph::ComputeH, SM2012Sph.cpp:133-240)."""
    ndim = box.ndim
    dr = box.min_image(r_ext[None, :, :] - r[:, None, :])
    drsqd = jnp.sum(dr * dr, axis=-1)
    dens = compute_h(kern, ndim, h_fac, h_converge, m, h_init,
                     drsqd, m_ext, mask=None, active=active)
    invh = 1.0 / dens.h
    ssqd = drsqd * (invh * invh)[:, None]
    w0 = kern.w0_s2(ssqd)
    q = (invh ** ndim) * jnp.sum((m_ext * u_ext)[None, :] * w0, axis=-1)
    return Sm2012Density(h=dens.h, rho=dens.rho, q=q,
                         hfactor=invh ** (ndim + 1))


class Sm2012Forces(NamedTuple):
    a: Array
    dudt: Array
    div_v: Array


def sm2012_forces(kern: SmoothingKernel, visc: ArtificialViscosity,
                  gamma: float, box: DomainBox,
                  r: Array, v: Array, m: Array, u: Array,
                  h: Array, rho: Array, q: Array, hfactor: Array,
                  sound: Array, alpha: Array,
                  r_ext: Array, v_ext: Array, m_ext: Array, u_ext: Array,
                  h_ext: Array, rho_ext: Array, q_ext: Array,
                  hfactor_ext: Array, sound_ext: Array, alpha_ext: Array
                  ) -> Sm2012Forces:
    """All-pairs SM2012 hydro force (SM2012Sph::ComputeSphHydroForces)."""
    dr = box.min_image(r_ext[None, :, :] - r[:, None, :])
    drsqd = jnp.sum(dr * dr, axis=-1)
    valid = drsqd > 0.0
    drmag = jnp.sqrt(jnp.where(valid, drsqd, 1.0))
    unit = jnp.where(valid[..., None], dr / drmag[..., None], 0.0)

    invh_i = (1.0 / h)[:, None]
    invh_j = (1.0 / h_ext)[None, :]
    wkerni = hfactor[:, None] * kern.w1(drmag * invh_i)
    wkernj = hfactor_ext[None, :] * kern.w1(drmag * invh_j)
    wkerni = jnp.where(valid, wkerni, 0.0)
    wkernj = jnp.where(valid, wkernj, 0.0)

    dv = v_ext[None, :, :] - v[:, None, :]
    dvdr = jnp.sum(dv * unit, axis=-1)
    div_v = -jnp.sum(m_ext[None, :] * dvdr * wkerni, axis=-1) \
        / jnp.maximum(rho, 1e-30)

    invq_i = (1.0 / jnp.maximum(q, 1e-30))[:, None]
    invq_j = 1.0 / jnp.maximum(q_ext, 1e-30)[None, :]
    paux = 0.5 * (gamma - 1.0) * u[:, None] * u_ext[None, :] \
        * (invq_i + invq_j) * (wkerni + wkernj)

    # adiabatic compression term (SM2012Sph.cpp:400-410):
    # dudt_i += (gamma-1)/2 u_i/q_i m_j u_j dvdr (wk_i + wk_j)
    dudt = 0.5 * (gamma - 1.0) * u * (1.0 / jnp.maximum(q, 1e-30)) \
        * jnp.sum(m_ext[None, :] * u_ext[None, :] * dvdr
                  * (wkerni + wkernj), axis=-1)

    if visc.avisc != AVISC_NONE:
        invrho_i = (1.0 / jnp.maximum(rho, 1e-30))[:, None]
        invrho_j = 1.0 / jnp.maximum(rho_ext, 1e-30)[None, :]
        winvrho = 0.25 * (wkerni + wkernj) * (invrho_i + invrho_j)
        if visc.avisc == AVISC_MON97MM97:
            alpha_eff = 0.5 * (alpha[:, None] + alpha_ext[None, :])
        else:
            alpha_eff = visc.alpha_visc
        vsignal = (sound[:, None] + sound_ext[None, :]
                   - visc.beta_visc * alpha_eff * dvdr)
        approach = valid & (dvdr < 0.0)
        paux = paux - jnp.where(
            approach, alpha_eff * vsignal * dvdr * winvrho, 0.0)
        dudt = dudt - jnp.sum(
            jnp.where(approach, 0.5 * m_ext[None, :] * alpha_eff
                      * vsignal * dvdr * dvdr * winvrho, 0.0), axis=-1)

    a = jnp.sum((m_ext[None, :] * paux)[..., None] * unit, axis=-2)
    return Sm2012Forces(a=a, dudt=dudt, div_v=div_v)
