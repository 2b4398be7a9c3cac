"""Structured 27-shift neighbour drivers for the meshless finite-volume
scheme — the TPU-native analogue of MeshlessFVTree's three tree passes
(reference src/MeshlessFV/MeshlessFVTree.cpp:318 UpdateAllProperties,
:487 UpdateGradientMatrices, :662 UpdateGodunovFluxes).

Same formulation as the SPH grid (ops/sph_grid27.py): particles are
scattered into dense (*ncells, K, ...) cell tensors, one ghost layer is
added per face, and every neighbour access is a STATIC slice of the
ghosted tensor over the 3^ndim shifts — no gathers in the hot loop.  The
physics is shared with the all-pairs oracle through ops.mfv's
accumulate/finalize split (gradient_init/accumulate/finalize) and
compute_godunov_fluxes, so the two paths cannot drift apart.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..kernels.smoothing import SmoothingKernel
from . import mfv as mfv_ops
from .sph_grid27 import (Grid27Spec, _auto_slab, _shift_view, _shifts,
                         add_ghost_layers)

Array = jnp.ndarray

ITER_FP = 30
ITER_MAX = 150


class MfvGridDensity(NamedTuple):
    """Dense (*ncells, K) MFV density-pass results."""

    h: Array
    ndens: Array
    rho: Array
    invomega: Array
    zeta: Array
    hfactor: Array
    overflow: Array


def _slab_plumbing(spec: Grid27Spec, slab_chunk=None):
    n0 = spec.ncells[0]
    if slab_chunk is None:
        slab_chunk = _auto_slab(spec)
    slab_chunk = min(slab_chunk, n0)
    n_slabs = -(-n0 // slab_chunk)
    pad0 = n_slabs * slab_chunk - n0

    def pad_first(x, fill_val=0):
        widths = [(0, pad0)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill_val)

    qz = spec.qz

    def slab_view(x_p, s, c):
        return jax.lax.dynamic_slice_in_dim(x_p, s * c, c + 2 * qz, axis=0)

    def centre_view(x, s, c):
        return jax.lax.dynamic_slice_in_dim(pad_first(x), s * c, c, axis=0)

    return slab_chunk, n_slabs, pad_first, slab_view, centre_view


def density_mfv_grid27(kern: SmoothingKernel, spec: Grid27Spec,
                       h_fac: float, h_converge: float,
                       r_d: Array, m_d: Array, h_d: Array, fill: Array,
                       hmax: float, slab_chunk: int = None,
                       ghost_fn=None) -> MfvGridDensity:
    """Number-density h iteration over the structured grid
    (MfvCommon::ComputeH, MfvCommon.cpp:105-240): h = h_fac / ndens^(1/nd),
    with the omega/zeta grad-h corrections on the NUMBER density."""
    nd = spec.ndim
    invndim = 1.0 / nd
    ghost = ghost_fn or add_ghost_layers
    rp_full = ghost(spec, r_d, shift_vec=True)
    mp_full = ghost(spec, m_d)
    fp_full = ghost(spec, fill)
    mp_full = jnp.where(fp_full, mp_full, 0.0)

    c0, n_slabs, pad_first, slab_view, centre_view = \
        _slab_plumbing(spec, slab_chunk)
    rp_full = pad_first(rp_full)
    mp_full = pad_first(mp_full)
    fp_full = pad_first(fp_full)

    shifts = _shifts(nd, spec.qz)

    def slab_fn(s):
        c = c0
        rp = slab_view(rp_full, s, c)
        mp = slab_view(mp_full, s, c)
        fp = slab_view(fp_full, s, c)
        r_dc = centre_view(r_d, s, c)
        fill_c = centre_view(fill, s, c)
        h_dc = jax.lax.dynamic_slice_in_dim(pad_first(h_d, 1), s * c, c,
                                            axis=0)
        sub = dataclasses.replace(spec, ncells=(c,) + spec.ncells[1:])

        def sums_at(h):
            invh = 1.0 / h
            invhsqd = invh * invh
            ndens = jnp.zeros_like(h)
            invom = jnp.zeros_like(h)
            zeta = jnp.zeros_like(h)
            for sh in shifts:
                r_nb = _shift_view(sub, rp, sh)
                m_nb = _shift_view(sub, mp, sh)
                f_nb = _shift_view(sub, fp, sh)
                dr = r_nb[..., None, :, :] - r_dc[..., :, None, :]
                ssqd = jnp.sum(dr * dr, axis=-1) * invhsqd[..., None]
                ok = f_nb[..., None, :]
                ndens = ndens + jnp.sum(
                    jnp.where(ok, kern.w0_s2(ssqd), 0.0), -1)
                invom = invom + jnp.sum(
                    jnp.where(ok, kern.womega_s2(ssqd), 0.0), -1)
                zeta = zeta + jnp.sum(
                    jnp.where(ok, m_nb[..., None, :] * kern.wzeta_s2(ssqd),
                              0.0), -1)
            hfac = invh ** nd
            return ndens * hfac, invom * hfac * invh, zeta * invhsqd

        def h_target(ndens):
            return h_fac * (1.0 / jnp.maximum(ndens, 1e-300)) ** invndim

        def body(carry):
            h, _, _, _, lo, hi, it, done = carry
            ndens, invom, zeta = sums_at(h)
            tgt = h_target(ndens)
            conv = (ndens > 0.0) & (jnp.abs(h - tgt) < h_converge)
            too_big = (ndens < 1e-30) | (ndens * h ** nd > h_fac ** nd)
            start_bis = it >= ITER_FP
            hi_n = jnp.where(start_bis & too_big & ~conv, h, hi)
            lo_n = jnp.where(start_bis & ~too_big & ~conv, h, lo)
            h_new = jnp.where(it < ITER_FP, tgt, 0.5 * (lo_n + hi_n))
            h_out = jnp.where(conv | done, h,
                              jnp.clip(h_new, 1e-6 * hmax, hmax))
            return (h_out, ndens, invom, zeta, lo_n, hi_n, it + 1,
                    done | conv)

        def cond(carry):
            *_, it, done = carry
            return (it < ITER_MAX) & ~jnp.all(done)

        h0 = jnp.clip(jnp.where(fill_c, h_dc, 0.5 * hmax),
                      1e-6 * hmax, hmax)
        z = jnp.zeros_like(h0)
        carry0 = (h0, z, z, z, jnp.zeros_like(h0),
                  jnp.full_like(h0, hmax), jnp.asarray(0), ~fill_c)
        h, ndens, invom, zeta, lo, hi, it, done = jax.lax.while_loop(
            cond, body, carry0)
        return h, ndens, invom, zeta, done

    h, ndens, invom, zeta, done = jax.lax.map(
        slab_fn, jnp.arange(n_slabs, dtype=jnp.int32))
    n0 = spec.ncells[0]
    unpad = lambda x: x.reshape((n_slabs * c0,) + x.shape[2:])[:n0]
    h, ndens, invom, zeta, done = map(unpad, (h, ndens, invom, zeta, done))

    ndens_safe = jnp.maximum(ndens, 1e-300)
    h_final = h_fac * (1.0 / ndens_safe) ** invndim
    invh = 1.0 / h_final
    hfactor = invh ** (nd + 1)
    rho = m_d * ndens
    # Omega correction on number density (MfvCommon.cpp:199-205)
    invomega = 1.0 / (1.0 + invndim * h_final * invom / ndens_safe)
    zeta_final = -invndim * m_d * h_final * zeta * invomega / ndens_safe
    overflow = jnp.any(jnp.where(fill, ~done, False)) | \
        jnp.any(jnp.where(fill, h_final, 0.0) > 0.99 * hmax)
    sane = lambda x, v: jnp.where(fill, x, v)
    return MfvGridDensity(h=sane(h_final, 1.0), ndens=sane(ndens, 1.0),
                          rho=sane(rho, 1.0), invomega=sane(invomega, 1.0),
                          zeta=sane(zeta_final, 0.0),
                          hfactor=sane(hfactor, 0.0), overflow=overflow)


class MfvGridGradients(NamedTuple):
    """Dense (*ncells, K, ...) gradient-pass results."""

    B: Array
    grad: Array
    alpha_slope: Array
    vsig_max: Array
    bad: Array


def gradients_mfv_grid27(kern: SmoothingKernel, spec: Grid27Spec,
                         dense: dict, fill: Array,
                         slab_chunk: int = None,
                         ghost_fn=None) -> MfvGridGradients:
    """Least-squares gradient matrices + cell limiter over the grid
    (MeshlessFVTree::UpdateGradientMatrices).  dense needs r, h, ndens,
    Wprim (*nc, K, nvar), sound."""
    nd = spec.ndim
    nvar = nd + 2
    ghost = ghost_fn or add_ghost_layers
    # packed neighbour tensor: [Wprim (nvar), sound]
    packed = jnp.concatenate(
        [dense["Wprim"], dense["sound"][..., None]], axis=-1)
    rp_full = ghost(spec, dense["r"], shift_vec=True)
    pkp_full = ghost(spec, packed)
    fp_full = ghost(spec, fill)

    c0, n_slabs, pad_first, slab_view, centre_view = \
        _slab_plumbing(spec, slab_chunk)
    rp_full = pad_first(rp_full)
    pkp_full = pad_first(pkp_full)
    fp_full = pad_first(fp_full)
    K = spec.k_cell
    shifts = _shifts(nd, spec.qz)

    def slab_fn(s):
        c = c0
        rp, pkp, fp = slab_view(rp_full, s, c), slab_view(pkp_full, s, c), \
            slab_view(fp_full, s, c)
        sub = dataclasses.replace(spec, ncells=(c,) + spec.ncells[1:])
        r_t = centre_view(dense["r"], s, c)
        h_t = jnp.maximum(centre_view(dense["h"], s, c), 1e-30)
        nden_t = centre_view(dense["ndens"], s, c)
        W_t = centre_view(dense["Wprim"], s, c)
        snd_t = centre_view(dense["sound"], s, c)

        flat = lambda x: x.reshape((-1,) + x.shape[nd + 1:])
        h_f = flat(h_t)
        acc = mfv_ops.gradient_init(h_f.shape[0], nd, h_f.dtype)
        Wp_f = flat(W_t)
        snd_f = flat(snd_t)
        nden_f = flat(nden_t)
        for sh in shifts:
            r_nb = _shift_view(sub, rp, sh)
            pk_nb = _shift_view(sub, pkp, sh)
            f_nb = _shift_view(sub, fp, sh)
            dr = r_nb[..., None, :, :] - r_t[..., :, None, :]
            # flatten (cells, K_t) -> N', keep K_nb as the view axis
            drf = dr.reshape(-1, K, nd)
            Wj = jnp.broadcast_to(pk_nb[..., None, :, :nvar],
                                  dr.shape[:-1] + (nvar,)).reshape(
                                      -1, K, nvar)
            sj = jnp.broadcast_to(pk_nb[..., None, :, nvar],
                                  dr.shape[:-1]).reshape(-1, K)
            vj = Wj[..., :nd]
            maskf = jnp.broadcast_to(f_nb[..., None, :],
                                     dr.shape[:-1]).reshape(-1, K)
            acc = mfv_ops.gradient_accumulate(
                kern, nd, acc, h_f, nden_f, Wp_f, snd_f,
                drf, Wj, sj, vj, maskf)
        return acc

    acc = jax.lax.map(slab_fn, jnp.arange(n_slabs, dtype=jnp.int32))
    n0 = spec.ncells[0]
    rest = 1
    for n in spec.ncells[1:]:
        rest *= n

    def unpad(x):
        # (n_slabs, c0*rest*K, ...) -> (total_cells*K, ...)
        x = x.reshape((n_slabs * c0, rest * K) + x.shape[2:])[:n0]
        return x.reshape((n0 * rest * K,) + x.shape[2:])

    acc = mfv_ops.GradAccum(*[unpad(x) for x in acc])
    h_f = jnp.maximum(dense["h"].reshape(-1), 1e-30)
    W_f = dense["Wprim"].reshape(-1, nvar)
    snd_f = dense["sound"].reshape(-1)
    res = mfv_ops.gradient_finalize(nd, acc, h_f, W_f, snd_f)
    shp = spec.ncells + (K,)
    return MfvGridGradients(
        B=res.B.reshape(shp + (nd, nd)),
        grad=res.grad.reshape(shp + (nvar, nd)),
        alpha_slope=res.alpha_slope.reshape(shp + (nvar,)),
        vsig_max=res.vsig_max.reshape(shp),
        bad=res.bad.reshape(shp))


class MfvGridFluxes(NamedTuple):
    dQdt: Array       # (*ncells, K, nvar)
    rdmdt_dot: Array  # (*ncells, K, ndim)


def fluxes_mfv_grid27(kern: SmoothingKernel, cfg: mfv_ops.MfvConfig,
                      spec: Grid27Spec, dt, dense: dict, fill: Array,
                      slab_chunk: int = None,
                      ghost_fn=None) -> MfvGridFluxes:
    """MUSCL Godunov flux accumulation over the grid
    (MeshlessFVTree::UpdateGodunovFluxes).  dense needs r, h, ndens,
    hfactor, Wprim, sound, a0, B, grad, alpha_slope, bad (float 0/1)."""
    nd = spec.ndim
    nvar = nd + 2
    K = spec.k_cell
    ghost = ghost_fn or add_ghost_layers
    # packed neighbour tensor:
    # [h, ndens, hfactor, Wprim(nvar), sound, a0(nd), B(nd*nd),
    #  grad(nvar*nd), alpha(nvar), bad]
    cols = [dense["h"][..., None], dense["ndens"][..., None],
            dense["hfactor"][..., None], dense["Wprim"],
            dense["sound"][..., None], dense["a0"],
            dense["B"].reshape(dense["B"].shape[:-2] + (nd * nd,)),
            dense["grad"].reshape(dense["grad"].shape[:-2] + (nvar * nd,)),
            dense["alpha_slope"], dense["bad"][..., None]]
    packed = jnp.concatenate(cols, axis=-1)
    o_h, o_nden, o_hfac = 0, 1, 2
    o_W = 3
    o_snd = o_W + nvar
    o_a0 = o_snd + 1
    o_B = o_a0 + nd
    o_grad = o_B + nd * nd
    o_alpha = o_grad + nvar * nd
    o_bad = o_alpha + nvar

    rp_full = ghost(spec, dense["r"], shift_vec=True)
    pkp_full = ghost(spec, packed)
    fp_full = ghost(spec, fill)

    c0, n_slabs, pad_first, slab_view, centre_view = \
        _slab_plumbing(spec, slab_chunk)
    rp_full = pad_first(rp_full)
    pkp_full = pad_first(pkp_full)
    fp_full = pad_first(fp_full)
    shifts = _shifts(nd, spec.qz)

    def slab_fn(s):
        c = c0
        rp, pkp, fp = slab_view(rp_full, s, c), slab_view(pkp_full, s, c), \
            slab_view(fp_full, s, c)
        sub = dataclasses.replace(spec, ncells=(c,) + spec.ncells[1:])
        r_t = centre_view(dense["r"], s, c)
        flat = lambda x: x.reshape((-1,) + x.shape[nd + 1:])
        h_f = jnp.maximum(flat(centre_view(dense["h"], s, c)), 1e-30)
        nden_f = flat(centre_view(dense["ndens"], s, c))
        hfac_f = flat(centre_view(dense["hfactor"], s, c))
        W_f = flat(centre_view(dense["Wprim"], s, c))
        snd_f = flat(centre_view(dense["sound"], s, c))
        a0_f = flat(centre_view(dense["a0"], s, c))
        B_f = flat(centre_view(dense["B"], s, c))
        grad_f = flat(centre_view(dense["grad"], s, c))
        alpha_f = flat(centre_view(dense["alpha_slope"], s, c))
        bad_f = flat(centre_view(dense["bad"], s, c)) > 0.5
        r_f = flat(r_t)

        Np = r_f.shape[0]
        dQdt = jnp.zeros((Np, nvar), r_f.dtype)
        rdmdt = jnp.zeros((Np, nd), r_f.dtype)
        for sh in shifts:
            r_nb = _shift_view(sub, rp, sh)
            pk_nb = _shift_view(sub, pkp, sh)
            f_nb = _shift_view(sub, fp, sh)
            dr = r_nb[..., None, :, :] - r_t[..., :, None, :]
            drf = dr.reshape(-1, K, nd)
            bshape = dr.shape[:-1]        # (cells..., K_t, K_nb)
            g = lambda sl: jnp.broadcast_to(
                pk_nb[..., None, :, sl],
                bshape + ((sl.stop - sl.start,)
                          if isinstance(sl, slice) else ())).reshape(
                    (-1, K) + ((sl.stop - sl.start,)
                               if isinstance(sl, slice) else ()))
            nb = {
                "h": g(o_h), "ndens": g(o_nden), "hfactor": g(o_hfac),
                "Wprim": g(slice(o_W, o_W + nvar)),
                "sound": g(o_snd),
                "a0": g(slice(o_a0, o_a0 + nd)),
                "B": g(slice(o_B, o_B + nd * nd)).reshape(-1, K, nd, nd),
                "grad": g(slice(o_grad, o_grad + nvar * nd)).reshape(
                    -1, K, nvar, nd),
                "alpha_slope": g(slice(o_alpha, o_alpha + nvar)),
                "bad": g(o_bad) > 0.5,
            }
            maskf = jnp.broadcast_to(f_nb[..., None, :], bshape).reshape(
                -1, K)
            res = mfv_ops.compute_godunov_fluxes(
                kern, cfg, nd, dt, r_f, h_f, nden_f, hfac_f, W_f, snd_f,
                a0_f, B_f, grad_f, alpha_f, bad_f, drf, nb, maskf)
            dQdt = dQdt + res.dQdt
            rdmdt = rdmdt + res.rdmdt_dot
        return dQdt, rdmdt

    dQdt, rdmdt = jax.lax.map(slab_fn, jnp.arange(n_slabs, dtype=jnp.int32))
    n0 = spec.ncells[0]
    rest = 1
    for n in spec.ncells[1:]:
        rest *= n

    def unpad(x):
        x = x.reshape((n_slabs * c0, rest * K) + x.shape[2:])[:n0]
        return x.reshape(spec.ncells + (K,) + x.shape[2:])

    return MfvGridFluxes(dQdt=unpad(dQdt), rdmdt_dot=unpad(rdmdt))
