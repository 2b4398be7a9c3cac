"""Multi-chip halo exchange for the structured-grid SPH pipeline.

TPU-native analogue of the reference's MPI domain decomposition + ghost
particle exchange (SURVEY.md §2.6; reference src/MpiControl,
GhostNeighbours.hpp): the dense (nz, ny, nx, K, ...) cell tensors are
sharded along the leading (z) axis over a 1-D `jax.sharding.Mesh`, and
each device exchanges ONE layer of boundary cells with its ring
neighbours via `lax.ppermute` — the collective rides the ICI mesh, not
host memory.  y/x ghost layers stay device-local.

The physics inside each shard is the unmodified 27-shift pipeline
(ops/sph_grid27.py) with the z-ghosting swapped for the ppermute halos,
so single-device and sharded results agree to reduction-order roundoff.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import sph_grid27 as g

Array = jnp.ndarray


def make_halo_ghost_fn(axis_name: str, global_spec, local_spec):
    """Returns a ghost_fn for density_grid27/forces_grid27 that supplies
    the dim-0 ghost layer from the ring neighbours (lax.ppermute) and
    ghosts the remaining dims locally."""
    nd = global_spec.ndim

    def ghost(spec_local, x, shift_vec=None):
        ndev = lax.axis_size(axis_name)
        idx = lax.axis_index(axis_name)
        # one boundary layer to each ring neighbour
        up = [(i, (i + 1) % ndev) for i in range(ndev)]
        down = [(i, (i - 1) % ndev) for i in range(ndev)]
        lo_halo = lax.ppermute(lax.slice_in_dim(x, x.shape[0] - 1,
                                                x.shape[0], axis=0),
                               axis_name, up)        # from the device below
        hi_halo = lax.ppermute(lax.slice_in_dim(x, 0, 1, axis=0),
                               axis_name, down)      # from the device above
        if global_spec.periodic[0]:
            if shift_vec is not None:
                # the wrap-around halos carry a +-L coordinate shift
                L = global_spec.extents[0]
                lo_halo = jnp.where(idx == 0,
                                    lo_halo.at[..., 0].add(-L), lo_halo)
                hi_halo = jnp.where(idx == ndev - 1,
                                    hi_halo.at[..., 0].add(L), hi_halo)
        else:
            # open boundary: zero the halos at the global edges
            lo_halo = jnp.where(idx == 0, jnp.zeros_like(lo_halo), lo_halo)
            hi_halo = jnp.where(idx == ndev - 1,
                                jnp.zeros_like(hi_halo), hi_halo)
        out = jnp.concatenate([lo_halo, x, hi_halo], axis=0)
        return g.add_ghost_layers(spec_local, out, shift_vec=shift_vec,
                                  dims=range(1, nd))

    return ghost


def hydro_pass_grid27_sharded(mesh: Mesh, axis_name: str,
                              kern, visc, box, spec, eos,
                              h_fac: float, h_converge: float,
                              hydro_forces: bool, s):
    """Structured-grid hydro pass with the dense cell tensors sharded
    along z over `mesh` and halo layers exchanged over ICI.

    Binning/scatter stay replicated (cheap O(N) vs the O(N K) pair work);
    the density iteration and the 27-shift force pass run shard-local.
    Returns the updated SphState (replicated particle arrays)."""
    nd = s.ndim
    ndev = mesh.shape[axis_name]
    if spec.ncells[0] % ndev != 0:
        raise ValueError(f"ncells[0]={spec.ncells[0]} not divisible by "
                         f"the {ndev}-device mesh")
    local_spec = dataclasses.replace(
        spec, ncells=(spec.ncells[0] // ndev,) + spec.ncells[1:])

    b = g.bin_particles(spec, s.r)
    hmax = min(spec.extents[k] / spec.ncells[k] for k in range(nd)) \
        / kern.kernrange
    d = lambda x: g.to_dense(spec, b, x)
    fill = g.dense_fill_mask(spec, b)
    dense_in = {
        "r": d(s.r), "v": d(s.v), "m": d(s.m), "h": d(s.h),
        "u": d(s.u), "alpha": d(s.alpha), "fill": fill,
    }

    zshard = NamedSharding(mesh, P(axis_name))
    in_specs = {k: P(axis_name) for k in dense_in}
    out_specs = (P(axis_name),) * 9 + (P(),)

    @partial(shard_map, mesh=mesh, in_specs=(in_specs,),
             out_specs=out_specs, check_rep=False)
    def local_pass(dn: Dict[str, Array]):
        ghost = make_halo_ghost_fn(axis_name, spec, local_spec)
        dens = g.density_grid27(kern, local_spec, h_fac, h_converge,
                                dn["r"], dn["m"], dn["h"], dn["fill"],
                                hmax, ghost_fn=ghost)
        u_d, press_d, sound_d = eos.thermal_update(
            jnp.maximum(dens.rho, 1e-30), dn["u"])
        if hydro_forces:
            fields = {"r": dn["r"], "v": dn["v"], "m": dn["m"],
                      "h": dens.h, "rho": dens.rho, "u": u_d,
                      "pressure": press_d, "sound": sound_d,
                      "invomega": dens.invomega, "hfactor": dens.hfactor,
                      "alpha": dn["alpha"]}
            a_d, dudt_d, div_v_d, _ = g.forces_grid27(
                kern, visc, local_spec, fields, dn["fill"],
                ghost_fn=ghost)
        else:
            a_d = jnp.zeros_like(dn["r"])
            dudt_d = jnp.zeros_like(dn["m"])
            div_v_d = jnp.zeros_like(dn["m"])
        overflow = lax.pmax(dens.overflow.astype(jnp.int32),
                            axis_name) > 0
        return (dens.h, dens.rho, dens.invomega, dens.zeta, dens.hfactor,
                u_d, press_d, sound_d,
                jnp.concatenate([a_d, dudt_d[..., None],
                                 div_v_d[..., None]], axis=-1),
                overflow)

    # place the dense tensors on the mesh, run, gather back per particle
    dense_in = {k: jax.device_put(v, zshard) for k, v in dense_in.items()}
    (h_d, rho_d, invom_d, zeta_d, hfac_d, u_d, press_d, sound_d,
     adiv_d, overflow) = local_pass(dense_in)

    p = lambda x: g.from_dense(spec, b, x)
    a = p(adiv_d[..., :nd])
    dudt = p(adiv_d[..., nd])
    div_v = p(adiv_d[..., nd + 1])
    return s.replace(
        h=p(h_d), rho=p(rho_d), invomega=p(invom_d), zeta=p(zeta_d),
        hfactor=p(hfac_d), u=p(u_d), pressure=p(press_d),
        sound=p(sound_d), a=a, dudt=dudt, div_v=div_v,
        neib_overflow=s.neib_overflow | overflow)
