"""Pallas TPU kernels for the structured-grid SPH hot loops.

The XLA 27-shift formulation (ops.sph_grid27) re-materialises pair blocks
in HBM and wastes vector lanes on K-sized axes.  These kernels instead:

- keep the ghost-padded dense cell tensors in HBM/ANY and DMA each
  program's (3, 3, BX+2) halo slab into VMEM once,
- visit the 27 neighbour cells as statically-unrolled (K, K) pair tiles —
  with K = 128 slots per cell the source axis fills the vector lanes and
  the target axis the sublanes,
- run the grad-h h-rho while_loop entirely on VMEM-resident data with
  squared distances precomputed once per target cell,
- evaluate the full pairwise hydro forces from the same slab.

Data layout: every tensor's minor dim is K (position/velocity components
are separate arrays; packed scalars carry the field axis SECOND-to-last) —
Mosaic tiles (sublane, lane) on the last two dims and cannot slice tiny
trailing component axes.

Grids are (nz, ny, nx/BX) over the ghost-padded dense cell tensors
(ops.sph_grid27 layout).  3D only; 1D/2D use the XLA path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

ITER_FP = 30
ITER_BIS = 60

_OFFS = [(dz, dy, dx) for dz in range(3) for dy in range(3)
         for dx in range(3)]


def _dma_slab(hbm_ref, vmem_ref, sem, z, y):
    """Copy the (3, 3, full-x, ...) halo rows at (z, y) into VMEM.

    Slices only the two LEADING (untiled) dims — Mosaic cannot partially
    slice the tiled (sublane, lane) dims, so the x axis is copied whole.
    """
    for dz in range(3):
        cp = pltpu.make_async_copy(hbm_ref.at[z + dz, pl.ds(y, 3)],
                                   vmem_ref.at[dz], sem)
        cp.start()
        cp.wait()


# ---------------------------------------------------------------------------
# density kernel
# ---------------------------------------------------------------------------

def _density_kernel(hparams_ref,                       # SMEM (1,)
                    rx_hbm, ry_hbm, rz_hbm, m_hbm, fill_hbm,
                    h0_ref, mt_ref,
                    h_out, rho_out, invom_out, zeta_out, conv_out,
                    rx_s, ry_s, rz_s, m_s, f_s, sem,
                    *, kern, BX, K, h_fac, h_converge):
    hmax = hparams_ref[0]
    nd = 3
    invndim = 1.0 / 3.0
    z = pl.program_id(0)
    y = pl.program_id(1)

    _dma_slab(rx_hbm, rx_s, sem, z, y)
    _dma_slab(ry_hbm, ry_s, sem, z, y)
    _dma_slab(rz_hbm, rz_s, sem, z, y)
    _dma_slab(m_hbm, m_s, sem, z, y)
    _dma_slab(fill_hbm, f_s, sem, z, y)

    CX = 4 if BX % 4 == 0 else (2 if BX % 2 == 0 else 1)

    for xc in range(0, BX, CX):
        tx = rx_s[1, 1, xc + 1:xc + 1 + CX]             # (CX, K)
        ty = ry_s[1, 1, xc + 1:xc + 1 + CX]
        tz = rz_s[1, 1, xc + 1:xc + 1 + CX]
        fill_f = f_s[1, 1, xc + 1:xc + 1 + CX]          # (CX, K) 0/1
        m_t = jnp.maximum(mt_ref[0, 0, xc:xc + CX], 1e-30)

        def h_rho(rho):
            return h_fac * (m_t / jnp.maximum(rho, 1e-30)) ** invndim

        def sums(h):
            invh = 1.0 / h
            invhsqd = invh * invh
            rho = jnp.zeros_like(h)
            invom = jnp.zeros_like(h)
            zeta = jnp.zeros_like(h)
            for (dz, dy, dx) in _OFFS:
                sx_ = rx_s[dz, dy, xc + dx:xc + dx + CX]
                sy_ = ry_s[dz, dy, xc + dx:xc + dx + CX]
                sz_ = rz_s[dz, dy, xc + dx:xc + dx + CX]
                mj = (m_s[dz, dy, xc + dx:xc + dx + CX]
                      * f_s[dz, dy, xc + dx:xc + dx + CX])[:, None, :]
                ddx = tx[:, :, None] - sx_[:, None, :]   # (CX, K, K)
                ddy = ty[:, :, None] - sy_[:, None, :]
                ddz = tz[:, :, None] - sz_[:, None, :]
                ssqd = (ddx * ddx + ddy * ddy + ddz * ddz) \
                    * invhsqd[:, :, None]
                rho = rho + jnp.sum(mj * kern.w0_s2(ssqd), axis=-1)
                invom = invom + jnp.sum(mj * kern.womega_s2(ssqd), axis=-1)
                zeta = zeta + jnp.sum(mj * kern.wzeta_s2(ssqd), axis=-1)
            hfac = invh ** nd
            return rho * hfac, invom * hfac * invh, zeta * invhsqd

        def body(carry):
            h, _, _, _, lo, hi, it, done_f = carry
            rho, invom, zeta = sums(h)
            tgt = h_rho(rho)
            conv_f = jnp.where((rho > 0.0)
                               & (jnp.abs(h - tgt) / h < h_converge),
                               1.0, 0.0)
            settled = jnp.maximum(conv_f, done_f)
            too_big_f = jnp.where((rho < 1e-30) | (h > tgt), 1.0, 0.0)
            bis_f = jnp.where(it >= ITER_FP, 1.0, 0.0)
            upd_hi = bis_f * too_big_f * (1.0 - settled)
            upd_lo = bis_f * (1.0 - too_big_f) * (1.0 - settled)
            hi_n = upd_hi * h + (1.0 - upd_hi) * hi
            lo_n = upd_lo * h + (1.0 - upd_lo) * lo
            h_new = jnp.where(it < ITER_FP, tgt, 0.5 * (lo_n + hi_n))
            h_new = jnp.clip(h_new, 1e-6 * hmax, hmax)
            h_next = settled * h + (1.0 - settled) * h_new
            return (h_next, rho, invom, zeta, lo_n, hi_n, it + 1, settled)

        def cond(carry):
            *_, it, done_f = carry
            return (it < ITER_FP + ITER_BIS) & (jnp.min(done_f) < 0.5)

        h0 = jnp.clip(fill_f * h0_ref[0, 0, xc:xc + CX]
                      + (1.0 - fill_f) * 0.5 * hmax, 1e-6 * hmax, hmax)
        zz = jnp.zeros_like(h0)
        carry0 = (h0, zz, zz, zz, jnp.zeros_like(h0),
                  jnp.full_like(h0, hmax), jnp.asarray(0, jnp.int32),
                  1.0 - fill_f)
        h, rho, invom, zeta, *_, done_f = jax.lax.while_loop(cond, body,
                                                             carry0)

        h_final = h_rho(rho)
        dh_drho = -invndim * h_final / jnp.maximum(rho, 1e-30)
        invomega = 1.0 / (1.0 - dh_drho * invom)
        zeta_f = dh_drho * zeta * invomega

        sane = lambda x, v: fill_f * x + (1.0 - fill_f) * v
        h_out[0, 0, xc:xc + CX] = sane(h_final, 1.0)
        rho_out[0, 0, xc:xc + CX] = sane(rho, 1.0)
        invom_out[0, 0, xc:xc + CX] = sane(invomega, 1.0)
        zeta_out[0, 0, xc:xc + CX] = sane(zeta_f, 0.0)
        conv_out[0, 0, xc:xc + CX] = fill_f * done_f + (1.0 - fill_f)


class PallasDensity(NamedTuple):
    h: Array
    rho: Array
    invomega: Array
    zeta: Array
    hfactor: Array
    overflow: Array


def _padx(x, extra):
    if not extra:
        return x
    w = [(0, 0)] * x.ndim
    w[2] = (0, extra)
    return jnp.pad(x, w)


def density_pallas(kern, h_fac, h_converge,
                   r_pad, m_pad, fill_pad, h0, m_t, hmax,
                   BX: int = 8) -> PallasDensity:
    """Grad-h density iteration on the ghost-padded dense 3D grid.

    r_pad: (nz+2, ny+2, nx+2, K, 3) f32; m_pad/fill_pad: (..., K) f32;
    h0/m_t: (nz, ny, nx, K).  Returns dense (nz, ny, nx, K) results.
    """
    nzp, nyp, nxp, K, _ = r_pad.shape
    nz, ny, nx = nzp - 2, nyp - 2, nxp - 2

    rx = r_pad[..., 0]
    ry = r_pad[..., 1]
    rz = r_pad[..., 2]
    grid = (nz, ny)
    f32 = jnp.float32

    kernel = functools.partial(_density_kernel, kern=kern, BX=nx, K=K,
                               h_fac=float(h_fac),
                               h_converge=float(h_converge))
    tgt_spec = pl.BlockSpec((1, 1, nx, K), lambda z, y: (z, y, 0, 0),
                            memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    slab = lambda: pltpu.VMEM((3, 3, nx + 2, K), f32)

    h, rho, invom, zeta, conv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [any_spec] * 5 + [tgt_spec, tgt_spec],
        out_specs=[tgt_spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((nz, ny, nx, K), f32)] * 5,
        scratch_shapes=[slab(), slab(), slab(), slab(), slab(),
                        pltpu.SemaphoreType.DMA],
    )(jnp.asarray([hmax], f32), rx, ry, rz, m_pad, fill_pad, h0, m_t)

    fill_t = fill_pad[1:-1, 1:-1, 1:nx + 1] > 0.5
    hfactor = jnp.where(fill_t, jnp.where(rho > 0, (1.0 / h) ** 4, 0.0),
                        0.0)
    overflow = jnp.any(jnp.where(fill_t, conv < 0.5, False)) | \
        jnp.any(jnp.where(fill_t, h, 0.0) > 0.99 * hmax)
    return PallasDensity(h=h, rho=rho, invomega=invom, zeta=zeta,
                         hfactor=hfactor, overflow=overflow)


# ---------------------------------------------------------------------------
# force kernel
# ---------------------------------------------------------------------------

def _force_kernel(vparams_ref,
                  rx_hbm, ry_hbm, rz_hbm, vx_hbm, vy_hbm, vz_hbm,
                  m_hbm, h_hbm, rho_hbm, u_hbm, p_hbm, cs_hbm, io_hbm,
                  hf_hbm, fill_hbm,
                  ax_out, ay_out, az_out, dudt_out, divv_out,
                  rx_s, ry_s, rz_s, vx_s, vy_s, vz_s,
                  m_s, h_s, rho_s, u_s, p_s, cs_s, io_s, hf_s, f_s, sem,
                  *, kern, BX, K, avisc_on, acond_code):
    """Pairwise grad-h hydro forces for one (z, y) row slab.

    All fields are separate (3, 3, BX+2, K) slabs (uniform 4D layout).
    vparams: (alpha_visc, beta_visc).
    """
    alpha_visc = vparams_ref[0]
    beta_visc = vparams_ref[1]
    z = pl.program_id(0)
    y = pl.program_id(1)

    for hbm, scr in ((rx_hbm, rx_s), (ry_hbm, ry_s), (rz_hbm, rz_s),
                     (vx_hbm, vx_s), (vy_hbm, vy_s), (vz_hbm, vz_s),
                     (m_hbm, m_s), (h_hbm, h_s), (rho_hbm, rho_s),
                     (u_hbm, u_s), (p_hbm, p_s), (cs_hbm, cs_s),
                     (io_hbm, io_s), (hf_hbm, hf_s), (fill_hbm, f_s)):
        _dma_slab(hbm, scr, sem, z, y)

    CX = BX
    for c in (8, 4, 2, 1):
        if BX % c == 0:
            CX = c
            break

    for xc in range(0, BX, CX):
        sl_t = lambda a: a[1, 1, xc + 1:xc + 1 + CX]     # (CX, K)
        tx, ty, tz = sl_t(rx_s), sl_t(ry_s), sl_t(rz_s)
        tvx, tvy, tvz = sl_t(vx_s), sl_t(vy_s), sl_t(vz_s)

        h_i = jnp.maximum(sl_t(h_s), 1e-30)[:, :, None]
        invrho_i = 1.0 / jnp.maximum(sl_t(rho_s), 1e-30)[:, :, None]
        hfac_i = sl_t(hf_s)[:, :, None]
        pio_i = (sl_t(p_s) * sl_t(io_s))[:, :, None]
        sound_i = sl_t(cs_s)[:, :, None]
        u_i = sl_t(u_s)[:, :, None]

        shp = (CX, K)
        ax = jnp.zeros(shp, jnp.float32)
        ay = jnp.zeros(shp, jnp.float32)
        az = jnp.zeros(shp, jnp.float32)
        dudt = jnp.zeros(shp, jnp.float32)
        divv = jnp.zeros(shp, jnp.float32)

        slabs = (m_s, h_s, rho_s, u_s, p_s, cs_s, io_s, hf_s)
        M_, H_, RHO_, U_, P_, CS_, IO_, HF_ = range(8)

        def accum(carry, dz, dy, dx):
            ax, ay, az, dudt, divv = carry
            sl_s = lambda a: a[dz, dy, xc + dx:xc + dx + CX]
            g_s = lambda i: sl_s(slabs[i])[:, None, :]   # (CX, 1, K)

            ddx = sl_s(rx_s)[:, None, :] - tx[:, :, None]
            ddy = sl_s(ry_s)[:, None, :] - ty[:, :, None]
            ddz = sl_s(rz_s)[:, None, :] - tz[:, :, None]
            drsqd = ddx * ddx + ddy * ddy + ddz * ddz
            vmask = jnp.where((sl_s(f_s)[:, None, :] > 0.5)
                              & (drsqd > 0.0), 1.0, 0.0)
            inv_drmag = vmask / jnp.sqrt(jnp.maximum(drsqd, 1e-30))
            drmag = drsqd * inv_drmag            # vmask * |dr|

            m_j = g_s(M_) * vmask
            invrho_j = 1.0 / (g_s(RHO_) * vmask + (1.0 - vmask))
            wkerni = vmask * hfac_i * kern.w1(drmag / h_i)
            wkernj = vmask * g_s(HF_) * kern.w1(
                drmag / (g_s(H_) * vmask + (1.0 - vmask)))

            dvdr = ((sl_s(vx_s)[:, None, :] - tvx[:, :, None]) * ddx
                    + (sl_s(vy_s)[:, None, :] - tvy[:, :, None]) * ddy
                    + (sl_s(vz_s)[:, None, :] - tvz[:, :, None]) * ddz
                    ) * inv_drmag
            divv = divv - jnp.sum(m_j * dvdr * wkerni, axis=-1)

            paux = (pio_i * invrho_i * invrho_i * wkerni
                    + g_s(P_) * g_s(IO_) * invrho_j * invrho_j * wkernj)

            if avisc_on:
                appr = jnp.where(dvdr < 0.0, vmask, 0.0)
                winvrho = 0.25 * (wkerni + wkernj) * (invrho_i + invrho_j)
                vsig = (sound_i + g_s(CS_)
                        - beta_visc * alpha_visc * dvdr)
                paux = paux - appr * alpha_visc * vsig * dvdr * winvrho
                dudt = dudt - jnp.sum(
                    appr * 0.5 * m_j * alpha_visc * vsig * dvdr * dvdr
                    * winvrho, axis=-1)
                if acond_code == 1:        # wadsley2008
                    dudt = dudt + jnp.sum(
                        appr * m_j * dvdr * (g_s(U_) - u_i)
                        * (invrho_i * wkerni + invrho_j * wkernj), axis=-1)

            coef = m_j * paux * inv_drmag
            ax = ax + jnp.sum(coef * ddx, axis=-1)
            ay = ay + jnp.sum(coef * ddy, axis=-1)
            az = az + jnp.sum(coef * ddz, axis=-1)
            return (ax, ay, az, dudt, divv)

        carry = (ax, ay, az, dudt, divv)
        for (dz, dy, dx) in _OFFS:       # static offsets: aligned slices
            carry = accum(carry, dz, dy, dx)
        ax, ay, az, dudt, divv = carry

        ax_out[0, 0, xc:xc + CX] = ax
        ay_out[0, 0, xc:xc + CX] = ay
        az_out[0, 0, xc:xc + CX] = az
        dudt_out[0, 0, xc:xc + CX] = dudt
        divv_out[0, 0, xc:xc + CX] = divv


def forces_pallas(kern, visc, r_pad, v_pad, pk_pad, fill_pad,
                  scalar_keys, BX: int = 8):
    """Pairwise hydro forces on the ghost-padded dense 3D grid.

    pk_pad: (nz+2, ny+2, nx+2, K, F) packed scalars (transposed internally).
    Returns dense (a, dudt, div_v) — div_v UN-normalised.
    """
    from .forces import ACOND_WADSLEY2008, AVISC_NONE

    nzp, nyp, nxp, K, F = pk_pad.shape
    nz, ny, nx = nzp - 2, nyp - 2, nxp - 2

    comps = [r_pad[..., c] for c in range(3)] \
        + [v_pad[..., c] for c in range(3)]
    # field order must match the kernel's (m, h, rho, u, p, cs, io, hf)
    order = ("m", "h", "rho", "u", "pressure", "sound", "invomega",
             "hfactor")
    i_of = {k: i for i, k in enumerate(scalar_keys)}
    fields = [pk_pad[..., i_of[k]] for k in order]
    grid = (nz, ny)
    f32 = jnp.float32

    kernel = functools.partial(
        _force_kernel, kern=kern, BX=nx, K=K,
        avisc_on=visc.avisc != AVISC_NONE,
        acond_code=1 if visc.acond == ACOND_WADSLEY2008 else 0)
    tgt_spec = pl.BlockSpec((1, 1, nx, K), lambda z, y: (z, y, 0, 0),
                            memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    slab = lambda: pltpu.VMEM((3, 3, nx + 2, K), f32)

    ax, ay, az, dudt, divv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [any_spec] * 15,
        out_specs=[tgt_spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((nz, ny, nx, K), f32)] * 5,
        scratch_shapes=[slab() for _ in range(15)]
        + [pltpu.SemaphoreType.DMA],
    )(jnp.asarray([visc.alpha_visc, visc.beta_visc], f32),
      *comps, *fields, fill_pad)
    a = jnp.stack([ax, ay, az], axis=-1)
    return a, dudt, divv


# ---------------------------------------------------------------------------
# full hydro pass (drop-in replacement for sph_grid27.hydro_pass_grid27)
# ---------------------------------------------------------------------------

SCALAR_KEYS = ("m", "h", "rho", "u", "pressure", "sound", "invomega",
               "hfactor", "alpha")


def hydro_pass_pallas(kern, visc, box, spec, eos, h_fac, h_converge,
                      hydro_forces: bool, s):
    """Full density -> EOS -> forces pass using the Pallas kernels.

    Same contract as sph_grid27.hydro_pass_grid27; 3D grids only.  Runs in
    float32 on device; the surrounding state keeps its own dtype.
    """
    from .sph_grid27 import (add_ghost_layers, bin_particles,
                             dense_fill_mask, from_dense, to_dense)

    assert s.ndim == 3, "pallas path is 3D-only"
    b = bin_particles(spec, s.r)
    hmax = min(spec.extents[k] / spec.ncells[k] for k in range(3)) \
        / kern.kernrange

    f32 = jnp.float32
    # Mosaic DMAs need tile-aligned HBM arrays: pad the slot axis K to a
    # multiple of 128 (lanes) and the ghosted x axis to a multiple of 8
    # (sublanes) with dead slots/cells.
    K0 = spec.k_cell
    K = -(-K0 // 128) * 128
    nx = spec.ncells[2]
    x_extra = (-(nx + 2)) % 8

    def padkx(x, ghosted):
        w = [(0, 0)] * x.ndim
        w[3] = (0, K - K0)
        w[2] = (0, x_extra)   # ghosted and target arrays pad x equally
        return jnp.pad(x, w)

    d = lambda x: to_dense(spec, b, x.astype(f32))
    fill = dense_fill_mask(spec, b)
    fill_f = fill.astype(f32)
    r_d = d(s.r)
    m_d = d(s.m)

    r_pad = padkx(add_ghost_layers(spec, r_d, shift_vec=True), True)
    m_pad = padkx(add_ghost_layers(spec, m_d), True)
    fill_pad = padkx(add_ghost_layers(spec, fill_f), True)

    dens_p = density_pallas(kern, h_fac, h_converge, r_pad, m_pad,
                            fill_pad, padkx(d(s.h), False),
                            padkx(m_d, False), hmax)
    strip = lambda x: x[:, :, :nx, :K0]
    dens = PallasDensity(h=strip(dens_p.h), rho=strip(dens_p.rho),
                         invomega=strip(dens_p.invomega),
                         zeta=strip(dens_p.zeta),
                         hfactor=strip(dens_p.hfactor),
                         overflow=dens_p.overflow)
    u_d, pressure_d, sound_d = eos.thermal_update(
        jnp.maximum(dens.rho, 1e-30), d(s.u))

    if hydro_forces:
        v_d = d(s.v)
        dense_fields = {
            "m": m_d, "h": dens.h, "rho": dens.rho, "u": u_d,
            "pressure": pressure_d, "sound": sound_d,
            "invomega": dens.invomega, "hfactor": dens.hfactor,
            "alpha": d(s.alpha),
        }
        pk = jnp.stack([dense_fields[k] for k in SCALAR_KEYS], axis=-1)
        a_p, dudt_p, divv_p = forces_pallas(
            kern, visc, r_pad, padkx(add_ghost_layers(spec, v_d), True),
            padkx(add_ghost_layers(spec, pk), True), fill_pad, SCALAR_KEYS)
        a_d = a_p[:, :, :nx, :K0]
        dudt_d = dudt_p[:, :, :nx, :K0]
        divv_d = divv_p[:, :, :nx, :K0]
        invrho = 1.0 / jnp.maximum(dens.rho, 1e-30)
        divv_d = divv_d * invrho
        dudt_d = dudt_d - pressure_d * divv_d * invrho * dens.invomega
    else:
        a_d = jnp.zeros_like(r_d)
        dudt_d = jnp.zeros_like(m_d)
        divv_d = jnp.zeros_like(m_d)

    dt = s.r.dtype
    back = lambda x_d: from_dense(spec, b, x_d).astype(dt)
    return s.replace(
        h=back(dens.h), rho=back(dens.rho), invomega=back(dens.invomega),
        zeta=back(dens.zeta), hfactor=back(dens.hfactor),
        u=back(u_d), pressure=back(pressure_d), sound=back(sound_d),
        a=back(a_d), dudt=back(dudt_d), div_v=back(divv_d),
        neib_overflow=dens.overflow | b.overflow)
