"""Dense cell-grid SPH pipeline — the TPU-shaped hot path.

Layout: after binning+sorting, particle fields are scattered into a DENSE
per-cell tensor of shape (C, k_cell, F) (cells x padded slots x packed
fields).  Neighbour access then becomes a gather of whole cell rows
(k_cell*F contiguous elements — kilobyte-granularity, which XLA/TPU handles
well) instead of per-particle row gathers of a dozen bytes (which it does
not).  Pair interactions are evaluated cell-block vs 27 neighbour cell
blocks, vmapped over cells and chunked with `lax.map` to bound memory.

This is the same blocking a Pallas kernel would use; the XLA version gets
most of the win because every tensor is dense and statically shaped.

Physics functions are shared with the oracle (ops.density.compute_h /
ops.forces.compute_hydro_forces operating on (n, K) neighbour views).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..kernels.smoothing import SmoothingKernel
from ..state import DomainBox, SphState
from .celllist import CellList, GridSpec, _adjacent_cell_ids, build_cell_list
from .density import compute_h
from .forces import ArtificialViscosity, NeighborView, compute_hydro_forces

Array = jnp.ndarray


class DenseGrid(NamedTuple):
    """Particles scattered into (C, k_cell, ...) dense cell storage."""

    slot_of: Array      # (N,) slot index of each SORTED particle in its cell
    fill: Array         # (C, k_cell) bool: slot occupied
    cell_ids: Array     # (C,) = arange(C) (kept for clarity)


def build_dense_grid(spec: GridSpec, cl: CellList) -> DenseGrid:
    N = cl.order.shape[0]
    slot = jnp.arange(N, dtype=jnp.int32) - cl.cell_start[cl.cell_of]
    C, K = spec.total_cells, spec.k_cell
    fill = jnp.zeros((C, K), dtype=bool)
    slot_c = jnp.minimum(slot, K - 1)
    fill = fill.at[cl.cell_of, slot_c].set(slot < K)
    return DenseGrid(slot_of=slot_c, fill=fill,
                     cell_ids=jnp.arange(C, dtype=jnp.int32))


def scatter_to_dense(spec: GridSpec, cl: CellList, dg: DenseGrid,
                     x_sorted: Array) -> Array:
    """(N, ...) sorted-order field -> (C, k_cell, ...) dense storage."""
    C, K = spec.total_cells, spec.k_cell
    out = jnp.zeros((C, K) + x_sorted.shape[1:], dtype=x_sorted.dtype)
    return out.at[cl.cell_of, dg.slot_of].set(x_sorted)


def gather_from_dense(cl: CellList, dg: DenseGrid, x_dense: Array) -> Array:
    """(C, k_cell, ...) dense -> (N, ...) sorted order."""
    return x_dense[cl.cell_of, dg.slot_of]


def _cell_adjacency(spec: GridSpec) -> Tuple[Array, Array]:
    """(C, A) adjacent cell ids + validity for every cell (static table)."""
    C = spec.total_cells
    all_cells = jnp.arange(C, dtype=jnp.int32)
    return _adjacent_cell_ids(spec, all_cells)


class DenseDensity(NamedTuple):
    h: Array            # dense (C, k_cell)
    rho: Array
    invomega: Array
    zeta: Array
    hfactor: Array
    overflow: Array


def density_pass_dense(kern: SmoothingKernel, box: DomainBox, spec: GridSpec,
                       h_fac: float, h_converge: float,
                       adj: Tuple[Array, Array],
                       r_d: Array, m_d: Array, h_d: Array, fill: Array,
                       hmax: float, cell_chunk: int = 256) -> DenseDensity:
    """Chunked (over cells) grad-h density iteration on the dense layout.

    r_d: (C, K, ndim); m_d/h_d/fill: (C, K).
    """
    C, K, ndim = r_d.shape
    A = 3 ** ndim
    nbr_id, nbr_valid = adj
    Cp = (C + cell_chunk - 1) // cell_chunk * cell_chunk
    padc = Cp - C

    def padC(x, fill_val=0):
        widths = [(0, padc)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill_val)

    def chunk_fn(args):
        nbr_c, nval_c, r_c, m_c, h_c, fill_c = args
        n = nbr_c.shape[0]
        # neighbour blocks: (n, A, K, ...) — whole-cell-row gathers
        r_nb = r_d[nbr_c].reshape(n, A * K, ndim)
        m_nb = m_d[nbr_c].reshape(n, A * K)
        f_nb = (fill[nbr_c] & nval_c[:, :, None]).reshape(n, A * K)
        # flatten targets: (n*K,)
        m_t = m_c.reshape(n * K)
        h_t = h_c.reshape(n * K)
        fill_t = fill_c.reshape(n * K)
        dr = box.min_image(r_nb[:, None, :, :] - r_c[:, :, None, :])
        drsqd = jnp.sum(dr * dr, axis=-1).reshape(n * K, A * K)
        mask = jnp.broadcast_to(f_nb[:, None, :], (n, K, A * K)
                                ).reshape(n * K, A * K)
        m_j = jnp.broadcast_to(m_nb[:, None, :], (n, K, A * K)
                               ).reshape(n * K, A * K)
        res = compute_h(kern, ndim, h_fac, h_converge,
                        jnp.maximum(m_t, 1e-30), jnp.maximum(h_t, 1e-3 * hmax),
                        drsqd, m_j, mask=mask, hmax=hmax, active=fill_t)
        shp = (n, K)
        conv = res.converged | ~fill_t
        return (res.h.reshape(shp), res.rho.reshape(shp),
                res.invomega.reshape(shp), res.zeta.reshape(shp),
                res.hfactor.reshape(shp), conv.reshape(shp))

    resh = lambda x: x.reshape(Cp // cell_chunk, cell_chunk, *x.shape[1:])
    args = (resh(padC(nbr_id)), resh(padC(nbr_valid)), resh(padC(r_d)),
            resh(padC(m_d)), resh(padC(h_d, 1)), resh(padC(fill)))
    h, rho, invom, zeta, hfac, conv = jax.lax.map(chunk_fn, args)
    unr = lambda x: x.reshape(Cp, K)[:C]
    h, rho, invom, zeta, hfac, conv = map(unr, (h, rho, invom, zeta,
                                                hfac, conv))
    overflow = jnp.any(~conv) | jnp.any(jnp.where(fill, h, 0.0) > 0.99 * hmax)
    return DenseDensity(h=h, rho=rho, invomega=invom, zeta=zeta,
                        hfactor=hfac, overflow=overflow)


def force_pass_dense(kern: SmoothingKernel, visc: ArtificialViscosity,
                     box: DomainBox, spec: GridSpec,
                     adj: Tuple[Array, Array],
                     dense: dict, fill: Array, cell_chunk: int = 256):
    """Chunked hydro force pass on the dense layout.

    dense: dict of (C, K, ...) arrays with keys r, v and the scalar fields
    m, h, rho, u, pressure, sound, invomega, hfactor, alpha.
    Returns dense (C, K, ...) results (a, dudt, div_v, dalphadt).
    """
    r_d = dense["r"]
    C, K, ndim = r_d.shape
    A = 3 ** ndim
    nbr_id, nbr_valid = adj
    Cp = (C + cell_chunk - 1) // cell_chunk * cell_chunk
    padc = Cp - C

    scalar_keys = ("m", "h", "rho", "u", "pressure", "sound", "invomega",
                   "hfactor", "alpha")
    # pack per-cell: (C, K, F)
    packed = jnp.stack([dense[k] for k in scalar_keys], axis=-1)
    F = packed.shape[-1]
    v_d = dense["v"]

    def padC(x, fill_val=0):
        widths = [(0, padc)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill_val)

    safe = {"h": 1.0, "rho": 1.0, "sound": 0.0, "invomega": 1.0,
            "hfactor": 0.0, "m": 0.0}

    def chunk_fn(args):
        nbr_c, nval_c, r_c, v_c, pk_c, fill_c = args
        n = nbr_c.shape[0]
        r_nb = r_d[nbr_c].reshape(n, A * K, ndim)
        v_nb = v_d[nbr_c].reshape(n, A * K, ndim)
        pk_nb = packed[nbr_c].reshape(n, A * K, F)
        f_nb = (fill[nbr_c] & nval_c[:, :, None]).reshape(n, A * K)

        dr = box.min_image(r_nb[:, None, :, :] - r_c[:, :, None, :])
        nK = n * K
        AK = A * K
        drf = dr.reshape(nK, AK, ndim)
        bc = lambda x: jnp.broadcast_to(x[:, None], (n, K) + x.shape[1:]
                                        ).reshape((nK,) + x.shape[1:])
        sca = {k: bc(pk_nb)[..., i] for i, k in enumerate(scalar_keys)}
        # guard padded neighbour slots against zeros in denominators
        for k, val in safe.items():
            if k in ("h", "rho", "invomega"):
                sca[k] = jnp.where(bc(f_nb), sca[k], 1.0)
        nb = NeighborView(dr=drf, v=bc(v_nb), mask=bc(f_nb), **sca)

        t = {k: pk_c[..., i].reshape(nK) for i, k in enumerate(scalar_keys)}
        fill_t = fill_c.reshape(nK)
        for k in ("h", "rho", "invomega", "hfactor", "sound"):
            t[k] = jnp.where(fill_t, t[k], 1.0)
        f = compute_hydro_forces(kern, visc, v_c.reshape(nK, ndim),
                                 t["h"], t["rho"], t["u"], t["pressure"],
                                 t["sound"], t["invomega"], t["hfactor"],
                                 t["alpha"], nb)
        shp = (n, K)
        return (f.a.reshape(n, K, ndim), f.dudt.reshape(shp),
                f.div_v.reshape(shp), f.dalphadt.reshape(shp))

    resh = lambda x: x.reshape(Cp // cell_chunk, cell_chunk, *x.shape[1:])
    args = (resh(padC(nbr_id)), resh(padC(nbr_valid)), resh(padC(r_d)),
            resh(padC(v_d)), resh(padC(packed)), resh(padC(fill)))
    a, dudt, div_v, dalphadt = jax.lax.map(chunk_fn, args)
    unr = lambda x: x.reshape((Cp, K) + x.shape[3:])[:C]
    return unr(a), unr(dudt), unr(div_v), unr(dalphadt)


def hydro_pass_dense(kern, visc, box, spec, eos, h_fac, h_converge,
                     hydro_forces: bool, s: SphState,
                     cell_chunk: int = 256) -> SphState:
    """Full dense-grid hydro pass: bin+sort -> dense scatter -> density ->
    EOS -> forces -> back to particle order."""
    cl = build_cell_list(spec, s.r)
    dg = build_dense_grid(spec, cl)
    adj = _cell_adjacency(spec)
    p = cl.order
    ndim = s.ndim
    hmax = min(spec.extents[k] / spec.ncells[k] for k in range(ndim)) \
        / kern.kernrange

    to_d = lambda x: scatter_to_dense(spec, cl, dg, x[p])
    r_d, v_d, m_d, h_d = to_d(s.r), to_d(s.v), to_d(s.m), to_d(s.h)

    dens = density_pass_dense(kern, box, spec, h_fac, h_converge, adj,
                              r_d, m_d, h_d, dg.fill, hmax,
                              cell_chunk=cell_chunk)
    u_d0 = to_d(s.u)
    u_d, pressure_d, sound_d = eos.thermal_update(
        jnp.maximum(dens.rho, 1e-30), u_d0)

    if hydro_forces:
        dense_fields = {
            "r": r_d, "v": v_d, "m": m_d, "h": dens.h, "rho": dens.rho,
            "u": u_d, "pressure": pressure_d, "sound": sound_d,
            "invomega": dens.invomega, "hfactor": dens.hfactor,
            "alpha": to_d(s.alpha),
        }
        a_d, dudt_d, div_v_d, _ = force_pass_dense(
            kern, visc, box, spec, adj, dense_fields, dg.fill,
            cell_chunk=cell_chunk)
    else:
        a_d = jnp.zeros_like(r_d)
        dudt_d = jnp.zeros_like(m_d)
        div_v_d = jnp.zeros_like(m_d)

    # dense -> sorted -> original order
    inv = jnp.zeros_like(p).at[p].set(jnp.arange(p.shape[0], dtype=p.dtype))
    back = lambda x_d: gather_from_dense(cl, dg, x_d)[inv]
    return s.replace(
        h=back(dens.h), rho=back(dens.rho), invomega=back(dens.invomega),
        zeta=back(dens.zeta), hfactor=back(dens.hfactor),
        u=back(u_d), pressure=back(pressure_d), sound=back(sound_d),
        a=back(a_d), dudt=back(dudt_d), div_v=back(div_v_d),
        neib_overflow=dens.overflow | cl.overflow)
