"""Dust dynamics: semi-implicit gas-dust drag (Loren-Aguilar & Bate 2014).

TPU-native vectorisation of DustSemiImplictForces::ComputeDragForces and the
test-particle interpolant (src/Common/Dust.cpp:812-1145) plus the stopping-
time laws (src/Headers/DragLaws.h:27-108).

The reference walks gas<->dust neighbour lists; here one dense (N, N) pass
evaluates every cross-type pair with the pairwise, angular-momentum-
conserving projection along the separation vector.  The scheme integrates
the linear drag exactly over the step (unconditionally stable):

  Xi     = (1 - e^-tau) / (dt rho),   tau = dt / t_s,  rho = rho_g + rho_d
  Lambda = (dt + t_s) Xi - 1/rho
  S      = (dv.r + dt da.r) Xi - (da.r) Lambda
  a_i   -= ndim rho_j S r_hat wdrag(q) m_j / (rho_j h_gas^ndim)

Gas particles convert the lost kinetic energy into heat; dust deposits its
share onto its gas neighbours (energy conserving).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..kernels.smoothing import SmoothingKernel
from ..state import DUST_TYPE, GAS_TYPE, DomainBox

Array = jnp.ndarray

EPSTEIN_NORM = 0.4699928014933126      # 3 sqrt(pi/8)/4 (DragLaws.h:73)


@dataclasses.dataclass(frozen=True)
class DragLaw:
    """Stopping-time prescription (DragLaws.h)."""

    law: str = "fixed"                 # fixed | density | epstein | lp12
    coeff: float = 1.0
    use_energy_term: bool = True

    @staticmethod
    def from_params(params) -> "DragLaw":
        return DragLaw(law=params.stringparams["drag_law"],
                       coeff=params.floatparams["drag_coeff"],
                       use_energy_term=params.stringparams["gas_eos"]
                       != "isothermal")

    def t_stop(self, grho: Array, drho: Array, gsound: Array) -> Array:
        K = self.coeff
        if self.law == "fixed":
            return jnp.full_like(grho, 1.0 / K)
        if self.law == "density":
            return 1.0 / ((grho + drho) * K)
        if self.law == "epstein":
            return EPSTEIN_NORM / ((grho + drho) * gsound * K)
        if self.law in ("lp12", "LP12"):
            return drho * grho / ((grho + drho) * K)
        raise ValueError(f"unknown drag_law {self.law!r}")


class DragResult(NamedTuple):
    a_drag: Array      # (N, ndim)
    dudt: Array        # (N,) drag heating for gas particles
    sound: Array       # (N,) dust timestep sound speed (max gas neighbour)
    div_v: Array       # (N,) dust |dv|/h for the timestep criterion


def drag_twofluid(kern: SmoothingKernel, law: DragLaw, box: DomainBox,
                  dt: Array,
                  r: Array, v: Array, a: Array, a0: Array,
                  m: Array, h: Array,
                  rho: Array, sound: Array, ptype: Array,
                  alive: Optional[Array] = None,
                  test_particle: bool = False) -> DragResult:
    """Dense all-pairs semi-implicit drag between gas and dust
    (DustSemiImplictForces::ComputeDragForces, Dust.cpp:1004-1135).

    All inputs at the force-evaluation point of the step; `a` is the
    non-drag (hydro + gravity) acceleration, `a0` the start-of-step
    acceleration (the kick-start velocity is v - dt/2 a0,
    Dust.cpp:41-55); dt = 0 yields the instantaneous drag force (used
    at bootstrap)."""
    N, ndim = r.shape
    is_gas = ptype == GAS_TYPE
    is_dust = ptype == DUST_TYPE
    if alive is not None:
        is_gas = is_gas & alive
        is_dust = is_dust & alive

    dr = box.min_image(r[:, None, :] - r[None, :, :])        # r_i - r_j
    drsqd = jnp.sum(dr * dr, axis=-1)
    pair = (is_gas[:, None] & is_dust[None, :]) \
        | (is_dust[:, None] & is_gas[None, :])
    pair = pair & (drsqd > 0.0)
    drmag = jnp.sqrt(jnp.where(drsqd > 0, drsqd, 1.0))
    unit = dr / drmag[..., None]

    # drag kernel evaluated with the GAS side's smoothing length
    # (Dust.cpp:1046-1050)
    h_gas = jnp.where(is_gas[:, None], h[:, None], h[None, :])
    invh = 1.0 / h_gas
    wraw = (invh ** ndim) * kern.wdrag(drmag * invh)
    wraw = jnp.where(pair, wraw, 0.0)
    wkern = wraw * m[None, :] / jnp.maximum(rho[None, :], 1e-30)

    # velocity difference at the start of the kick (Dust.cpp:52-55)
    v_kick = v - 0.5 * dt * a0
    dv = v_kick[:, None, :] - v_kick[None, :, :]
    da = a[:, None, :] - a[None, :, :]
    dvdr = jnp.sum(dv * unit, axis=-1)
    dadr = jnp.sum(da * unit, axis=-1)

    grho = jnp.where(is_gas[:, None], rho[:, None], rho[None, :])
    drho = jnp.where(is_gas[:, None], rho[None, :], rho[:, None])
    gsound = jnp.where(is_gas[:, None], sound[:, None], sound[None, :])
    if test_particle:
        # dust feels the gas but not vice versa (DustTestParticle,
        # Dust.cpp:357-381; t_stop called with drho = 0, :963)
        drho = jnp.zeros_like(drho)
    t_s = jnp.maximum(law.t_stop(grho, drho, gsound), 1e-30)

    rho_t = grho + drho
    tau = dt / t_s
    # exact integral vs series for small tau (Dust.cpp:1084-1093)
    dt_safe = jnp.maximum(dt, 1e-30)
    xi_big = (1.0 - jnp.exp(-tau)) / (dt_safe * rho_t)
    lam_big = (dt + t_s) * xi_big - 1.0 / rho_t
    xi_small0 = (1.0 - 0.5 * tau * (1.0 - tau / 3.0)) / rho_t
    lam_small = (1.0 + tau) * xi_small0 - 1.0 / rho_t
    xi_small = xi_small0 / t_s
    big = tau > 1e-3
    Xi = jnp.where(big, xi_big, xi_small)
    Lam = jnp.where(big, lam_big, lam_small)

    S = (dvdr + dt * dadr) * Xi - dadr * Lam
    contrib = jnp.where(pair, ndim * rho[None, :] * S * wkern, 0.0)
    a_drag = -jnp.sum(contrib[..., None] * unit, axis=1)
    if test_particle:
        a_drag = jnp.where(is_dust[:, None], a_drag, 0.0)

    # dust timestep criteria (Dust.cpp:1070-1076)
    dvmag = jnp.sqrt(jnp.maximum(drsqd * 0 + jnp.sum(dv * dv, -1), 0.0))
    sound_d = jnp.max(jnp.where(pair, gsound, 0.0), axis=1)
    div_v_d = jnp.max(jnp.where(pair, dvmag, 0.0), axis=1) \
        / jnp.maximum(h, 1e-30)

    # drag heating (Dust.cpp:1109-1133): each particle's kinetic-energy
    # change; gas keeps its own, dust deposits onto gas neighbours
    dudt = jnp.zeros_like(m)
    if law.use_energy_term and not test_particle:
        # v0 + a dt with v0 the kick-start velocity (Dust.cpp:110-111)
        v_end = v - 0.5 * dt * a0 + a * dt
        dEk = jnp.sum(a_drag * (v_end + 0.5 * a_drag * dt), axis=-1)   # (N,)
        dudt = jnp.where(is_gas, -dEk, 0.0)
        # deposit weight uses the RAW drag kernel over the m/rho-weighted
        # norm so that sum_j m_j w~_ij = 1 exactly (Dust.cpp:1119-1127)
        norm = jnp.sum(wkern, axis=1)
        spread = wraw / (jnp.maximum(norm, 1e-30)[:, None]
                         * jnp.maximum(rho[None, :], 1e-30))
        # dust i deposits -m_i * dEk_i onto each gas j
        dep = jnp.where(is_dust[:, None], spread
                        * (m * dEk)[:, None], 0.0)
        dudt = dudt - jnp.sum(dep, axis=0)
    return DragResult(a_drag=a_drag, dudt=dudt,
                      sound=sound_d, div_v=div_v_d)
