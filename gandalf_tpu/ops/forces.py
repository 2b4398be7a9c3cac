"""Pairwise grad-h SPH hydro forces.

Vectorisation of GradhSph::ComputeSphHydroForces
(src/GradhSph/GradhSph.cpp:361-460): Springel-Hernquist / Price-Monaghan
conservative grad-h pressure force, Monaghan (1997) artificial viscosity
(optionally time-dependent MM97 alpha), Wadsley (2008) / Price (2008)
artificial conductivity, velocity divergence and compressive heating.

The physics is expressed over (N, K) neighbour blocks so the same function
serves the all-pairs oracle (K = M, no mask) and the gathered cell-list path
(K = fixed capacity, with a validity mask).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..kernels.smoothing import SmoothingKernel
from ..state import DomainBox

Array = jnp.ndarray

# artificial viscosity / conductivity options (reference Sph.h enums)
AVISC_NONE = 0
AVISC_MON97 = 1
AVISC_MON97MM97 = 2      # time-dependent alpha (Morris & Monaghan 97)
ACOND_NONE = 0
ACOND_WADSLEY2008 = 1
ACOND_PRICE2008 = 2

_AVISC_CODES = {"none": AVISC_NONE, "mon97": AVISC_MON97,
                "mon97mm97": AVISC_MON97MM97, "mon97cd2010": AVISC_MON97MM97}
_ACOND_CODES = {"none": ACOND_NONE, "wadsley2008": ACOND_WADSLEY2008,
                "price2008": ACOND_PRICE2008}


@dataclasses.dataclass(frozen=True)
class ArtificialViscosity:
    """Static dissipation configuration."""

    avisc: int = AVISC_MON97
    acond: int = ACOND_NONE
    alpha_visc: float = 1.0
    alpha_visc_min: float = 0.1
    beta_visc: float = 2.0

    @staticmethod
    def from_params(params) -> "ArtificialViscosity":
        avisc = params.stringparams["avisc"]
        # reference splits the scheme across two params: avisc = mon97 +
        # time_dependent_avisc = mm97/cd2010 (Simulation.cpp:252-257)
        if (avisc == "mon97"
                and params.stringparams["time_dependent_avisc"] != "none"):
            avisc = "mon97mm97"
        return ArtificialViscosity(
            avisc=_AVISC_CODES[avisc],
            acond=_ACOND_CODES[params.stringparams["acond"]],
            alpha_visc=params.floatparams["alpha_visc"],
            alpha_visc_min=params.floatparams["alpha_visc_min"],
            beta_visc=params.floatparams["beta_visc"],
        )


class HydroForces(NamedTuple):
    a: Array          # (N, ndim) hydro acceleration
    dudt: Array       # (N,) du/dt
    div_v: Array      # (N,) velocity divergence
    dalphadt: Array   # (N,) time-dependent viscosity evolution (MM97)


class NeighborView(NamedTuple):
    """Gathered neighbour fields, shape (N, K) (+ ndim for vectors)."""

    dr: Array        # displacement r_j - r_i, min-imaged: (N, K, ndim)
    v: Array         # neighbour velocity (image-corrected): (N, K, ndim)
    m: Array
    h: Array
    rho: Array
    u: Array
    pressure: Array
    sound: Array
    invomega: Array
    hfactor: Array
    alpha: Array
    mask: Optional[Array]    # validity; None = all valid


def compute_hydro_forces(kern: SmoothingKernel, visc: ArtificialViscosity,
                         v_i: Array, h_i: Array, rho_i: Array, u_i: Array,
                         press_i: Array, sound_i: Array, invomega_i: Array,
                         hfactor_i: Array, alpha_i: Array,
                         nb: NeighborView) -> HydroForces:
    """Per-particle hydro force sums over a neighbour view.

    All i-fields are (N,) or (N, ndim); nb fields are (N, K)(, ndim).
    """
    drmag = jnp.sqrt(jnp.sum(nb.dr * nb.dr, axis=-1))
    valid = drmag > 0.0
    if nb.mask is not None:
        valid = valid & nb.mask
    inv_drmag = jnp.where(valid, 1.0 / jnp.maximum(drmag, 1e-300), 0.0)
    unit = nb.dr * inv_drmag[..., None]

    invh_i = 1.0 / h_i
    invh_j = 1.0 / nb.h
    invrho_i = 1.0 / rho_i
    invrho_j = 1.0 / nb.rho

    wkerni = hfactor_i[:, None] * kern.w1(drmag * invh_i[:, None])
    wkernj = nb.hfactor * kern.w1(drmag * invh_j)
    wkerni = jnp.where(valid, wkerni, 0.0)
    wkernj = jnp.where(valid, wkernj, 0.0)

    dvdr = jnp.sum((nb.v - v_i[:, None, :]) * unit, axis=-1)

    # velocity divergence contribution (GradhSph.cpp:404)
    div_v = -jnp.sum(nb.m * dvdr * wkerni, axis=-1)

    # main grad-h pressure force term (GradhSph.cpp:407-408)
    paux = (
        (press_i * invomega_i * invrho_i * invrho_i)[:, None] * wkerni
        + nb.pressure * nb.invomega * invrho_j * invrho_j * wkernj
    )

    dudt = jnp.zeros_like(rho_i)
    dalphadt = jnp.zeros_like(rho_i)
    approach = valid & (dvdr < 0.0)

    if visc.avisc != AVISC_NONE:
        winvrho = 0.25 * (wkerni + wkernj) * (invrho_i[:, None] + invrho_j)
        if visc.avisc == AVISC_MON97:
            alpha_eff = visc.alpha_visc
        else:  # mean particle alpha (MM97 / CD2010; GradhSph.cpp:420-426)
            alpha_eff = 0.5 * (alpha_i[:, None] + nb.alpha)
        vsignal = (sound_i[:, None] + nb.sound
                   - visc.beta_visc * alpha_eff * dvdr)
        visc_term = alpha_eff * vsignal * dvdr * winvrho
        paux = paux - jnp.where(approach, visc_term, 0.0)
        dudt = dudt - jnp.sum(
            jnp.where(approach,
                      0.5 * nb.m * alpha_eff * vsignal * dvdr * dvdr * winvrho,
                      0.0),
            axis=-1)
        if visc.acond == ACOND_WADSLEY2008:
            cond = nb.m * dvdr * (nb.u - u_i[:, None]) * (
                invrho_i[:, None] * wkerni + invrho_j * wkernj)
            dudt = dudt + jnp.sum(jnp.where(approach, cond, 0.0), axis=-1)
        elif visc.acond == ACOND_PRICE2008:
            cond = (0.5 * nb.m * (u_i[:, None] - nb.u) * winvrho
                    * (invrho_i[:, None] + invrho_j)
                    * jnp.sqrt(jnp.abs(press_i[:, None] - nb.pressure)))
            dudt = dudt + jnp.sum(jnp.where(approach, cond, 0.0), axis=-1)

    # total hydro acceleration (GradhSph.cpp:452-455)
    a = jnp.sum((nb.m * paux)[..., None] * unit, axis=-2)

    # normalise div_v; compressive heating (GradhSph.cpp:462-468)
    div_v = div_v * invrho_i
    dudt = dudt - press_i * div_v * invrho_i * invomega_i

    if visc.avisc == AVISC_MON97MM97:
        # Morris & Monaghan (1997) alpha evolution (GradhSph.cpp:469-471)
        dalphadt = (0.1 * sound_i * (visc.alpha_visc_min - alpha_i) * invh_i
                    + jnp.maximum(-div_v, 0.0) * (visc.alpha_visc - alpha_i))

    return HydroForces(a=a, dudt=dudt, div_v=div_v, dalphadt=dalphadt)


def bruteforce_neighbor_view(box: DomainBox, r: Array,
                             r_ext: Array, v_ext: Array,
                             scalars_ext) -> NeighborView:
    """Build an all-pairs NeighborView from extended (image) arrays."""
    dr = box.min_image(r_ext[None, :, :] - r[:, None, :])
    N = r.shape[0]
    M = r_ext.shape[0]
    bcast = lambda x: jnp.broadcast_to(x[None, :], (N, M))
    return NeighborView(
        dr=dr,
        v=jnp.broadcast_to(v_ext[None, :, :], (N, M, r.shape[1])),
        m=bcast(scalars_ext["m"]),
        h=bcast(scalars_ext["h"]),
        rho=bcast(scalars_ext["rho"]),
        u=bcast(scalars_ext["u"]),
        pressure=bcast(scalars_ext["pressure"]),
        sound=bcast(scalars_ext["sound"]),
        invomega=bcast(scalars_ext["invomega"]),
        hfactor=bcast(scalars_ext["hfactor"]),
        alpha=bcast(scalars_ext["alpha"]),
        mask=None,
    )


def cullen_dehnen_alpha(kern: SmoothingKernel, visc: ArtificialViscosity,
                        box, r, v, a, m, h, rho, sound, hfactor, alpha,
                        r_ext, v_ext, a_ext, m_ext):
    """Cullen & Dehnen (2010) viscosity switch
    (Sph::ComputeCullenAndDehnenViscosity, src/Headers/Sph.h:360-456):
    integral least-squares gradients of v and a, shock detector
    ddivdt = tr(da/dx) - dvdx:dvdx^T, Balsara limiter, local alpha target.

    Returns (alpha_new, dalphadt): alpha is raised instantly to alpha_loc
    and decays at 0.1 c (max(alpha_min, alpha_loc) - alpha)/h."""
    ndim = r.shape[1]
    dr = box.min_image(r_ext[None, :, :] - r[:, None, :])      # (N,K,nd)
    drsqd = jnp.sum(dr * dr, axis=-1)
    valid = drsqd > 0.0
    drmag = jnp.sqrt(jnp.where(valid, drsqd, 1.0))
    invh = 1.0 / h
    w = m_ext[None, :] * (invh * hfactor / jnp.maximum(rho, 1e-30))[:, None] \
        * kern.w1(drmag * invh[:, None])
    w = jnp.where(valid, w, 0.0)

    dv = v_ext[None, :, :] - v[:, None, :]
    da = a_ext[None, :, :] - a[:, None, :]
    rr = jnp.einsum("nk,nki,nkj->nij", w, dr, dr)
    dvw = jnp.einsum("nk,nki,nkj->nij", w, dr, dv)
    daw = jnp.einsum("nk,nki,nkj->nij", w, dr, da)
    return _cd2010_finalize(visc, rr, dvw, daw, h, sound, alpha)


def _cd2010_finalize(visc: ArtificialViscosity, rr, dvw, daw,
                     h, sound, alpha):
    """Pointwise tail of the Cullen & Dehnen switch, shared by the
    all-pairs and dense-shift accumulators (the two paths cannot
    drift)."""
    ndim = rr.shape[-1]
    invh = 1.0 / h

    # guarded inversion + condition check (Sph.h:403-420)
    eye = jnp.eye(ndim)
    det_ok = jnp.abs(jnp.linalg.det(rr)) > 1e-30
    rr_safe = jnp.where(det_ok[:, None, None], rr, eye[None])
    T = jnp.linalg.inv(rr_safe)
    modR = jnp.sum(rr * rr, axis=(1, 2))
    modT = jnp.sum(T * T, axis=(1, 2))
    bad = (~det_ok) | (modR * modT / (ndim * ndim) > 1e4)

    # dvdx[i][j] = T[j][k] dv[k][i]  (Sph.h:424)
    dvdx = jnp.einsum("njk,nki->nij", T, dvw)
    dadx = jnp.einsum("njk,nki->nij", T, daw)
    ddivdt = jnp.einsum("nii->n", dadx) \
        - jnp.einsum("nij,nji->n", dvdx, dvdx)
    divv = jnp.einsum("nii->n", dvdx)
    divv2 = divv * divv
    # curl^2 = |antisymmetric part|^2 contraction (CurlVelSqd)
    curl = dvdx - jnp.swapaxes(dvdx, 1, 2)
    curlv2 = 0.5 * jnp.sum(curl * curl, axis=(1, 2))
    f_balsara = jnp.where(curlv2 > 0.0,
                          divv2 / jnp.maximum(divv2 + curlv2, 1e-30), 1.0)

    c2 = jnp.maximum(sound * sound, 1e-30)
    alpha_loc = jnp.where(ddivdt < 0.0,
                          jnp.minimum(10.0 * h * h / c2 * f_balsara
                                      * (-ddivdt), visc.alpha_visc), 0.0)
    alpha_loc = jnp.where(bad, visc.alpha_visc, alpha_loc)

    alpha_new = jnp.maximum(alpha, alpha_loc)
    dalphadt = (0.1 * sound
                * (jnp.maximum(visc.alpha_visc_min, alpha_loc) - alpha_new)
                * invh)
    return alpha_new, dalphadt


def cullen_dehnen_dense(kern: SmoothingKernel, visc: ArtificialViscosity,
                        spec, binning, r, v, a, m, h, rho, sound,
                        hfactor, alpha, alive, ghost_fn=None):
    """Cullen & Dehnen switch over DENSE shifted cell tensors
    (shard_map-safe O(N K) replacement for the (N, N) pass): the three
    weighted outer-product sums rr/dvw/daw are accumulated over the
    shift stencil, then the shared pointwise finale runs per particle
    (Sph::ComputeCullenAndDehnenViscosity, src/Headers/Sph.h:360-456).
    Inputs/outputs in particle order; returns (alpha_new, dalphadt)."""
    import numpy as _np

    from . import sph_grid27 as g

    nd = r.shape[1]
    ghost = ghost_fn or g.add_ghost_layers
    d = lambda x: g.to_dense(spec, binning, x)
    back = lambda x: g.from_dense(spec, binning, x)
    fill = g.dense_fill_mask(spec, binning) & d(alive)
    K = spec.k_cell
    shifts = g._shifts(nd, spec.qz)

    r_d = d(r)
    # packed per-neighbour channels: [v (nd), a (nd), m]
    pk = jnp.concatenate([d(v), d(a), d(m)[..., None]], axis=-1)
    rp = ghost(spec, r_d, shift_vec=True)
    pkp = ghost(spec, pk)
    fp_ = ghost(spec, fill)

    flat = lambda x: x.reshape((-1,) + x.shape[nd + 1:])
    Np = int(_np.prod(spec.ncells)) * K
    r_f = flat(r_d)
    v_f = flat(d(v))
    a_f = flat(d(a))
    h_f = jnp.maximum(flat(d(h)), 1e-30)
    coef_f = flat(d(hfactor / jnp.maximum(rho, 1e-30)))
    invh_f = 1.0 / h_f

    rr = jnp.zeros((Np, nd, nd), r_f.dtype)
    dvw = jnp.zeros((Np, nd, nd), r_f.dtype)
    daw = jnp.zeros((Np, nd, nd), r_f.dtype)
    for sh in shifts:
        r_nb = g._shift_view(spec, rp, sh)
        pk_nb = g._shift_view(spec, pkp, sh)
        f_nb = g._shift_view(spec, fp_, sh)
        dr = (r_nb[..., None, :, :]
              - r_d[..., :, None, :]).reshape(Np, K, nd)     # r_j - r_i
        drsqd = jnp.sum(dr * dr, axis=-1)
        ok = jnp.broadcast_to(
            f_nb[..., None, :],
            f_nb.shape[:nd] + (K, K)).reshape(Np, K) & (drsqd > 0.0)
        drmag = jnp.sqrt(jnp.where(drsqd > 0, drsqd, 1.0))
        pkb = jnp.broadcast_to(
            pk_nb[..., None, :, :],
            pk_nb.shape[:nd] + (K,) + pk_nb.shape[nd:]
        ).reshape(Np, K, 2 * nd + 1)
        w = pkb[..., -1] * (invh_f * coef_f)[:, None] \
            * kern.w1(drmag * invh_f[:, None])
        w = jnp.where(ok, w, 0.0)
        dv = pkb[..., :nd] - v_f[:, None, :]
        da = pkb[..., nd:2 * nd] - a_f[:, None, :]
        rr = rr + jnp.einsum("nk,nki,nkj->nij", w, dr, dr)
        dvw = dvw + jnp.einsum("nk,nki,nkj->nij", w, dr, dv)
        daw = daw + jnp.einsum("nk,nki,nkj->nij", w, dr, da)

    al_f = flat(d(alpha))
    snd_f = flat(d(sound))
    alpha_new, dalphadt = _cd2010_finalize(visc, rr, dvw, daw, h_f,
                                           snd_f, al_f)
    shp = spec.ncells + (K,)
    z = lambda x, v0: jnp.where(alive, back(x.reshape(shp)), v0)
    return z(alpha_new, alpha), z(dalphadt, 0.0)
