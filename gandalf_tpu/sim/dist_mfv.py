"""Distributed (multi-chip) meshless finite-volume controller.

MfvMusclSimulation over the sharded z-slab runtime (the reference's MPI
mode covers the MeshlessFV flavours through the same MpiControl /
pruned-tree machinery as SPH, src/MeshlessFV/MeshlessFVSimulation.cpp +
src/Mpi/MpiControl.cpp): the three dense grid passes
(ops/mfv_grid27.py) run shard-local with ppermute halo rings, gravity
walks the replicated bucket tree with the MFV zeta scaling, and dt is a
pmin reduction — all inside one jitted shard_map step.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops import mfv as mfv_ops
from ..parallel import dist
from ..state import MfvState
from .dist_sim import DistributedGradhSphSimulation as _DistGradh
from .mfv_sim import MfvMusclSimulation


class DistributedMfvSimulation(MfvMusclSimulation):
    def process_parameters(self):
        super().process_parameters()
        p = self.params
        self.n_shards = p.intparams["Nmpi"]
        n_dev = len(jax.devices())
        if self.n_shards <= 1:
            self.n_shards = n_dev
        if self.n_shards > n_dev:
            raise ValueError(f"Nmpi={self.n_shards} > {n_dev} devices")
        if self.box.mirror_walls() and self.neib_search != "bruteforce":
            # the base class routes mirror walls to the single-chip
            # all-pairs image path; the SHARDED MFV kernels carry
            # image-cell support (parallel/dist._dist_mfv_binning), so
            # re-enable the grid path here
            self.use_celllist = True
        unsupported = []
        if not self.use_celllist:
            unsupported.append("bruteforce neighbour search")
        if self.use_block:
            # the sharded step is global-dt; raising beats silently
            # ignoring Nlevels (the single-chip MFV block tick exists,
            # sim/mfv_sim._build_block_tick)
            unsupported.append("block timesteps (Nlevels > 1)")
        if unsupported:
            raise NotImplementedError(
                "distributed MFV does not yet support: "
                + ", ".join(unsupported))

    # -- planning (borrowed from the SPH dist controller) ------------------
    def _plan_all(self, r_np: np.ndarray, h_np: np.ndarray,
                  growth: float = 1.3):
        from ..ops.sph_grid27 import plan_grid27

        h_max = float(h_np.max()) * growth
        self.gridspec = plan_grid27(self.box, r_np, h_max,
                                    self.kern.kernrange,
                                    z_multiple=self.n_shards)
        self.distplan = dist.plan_decomposition(self.gridspec, r_np,
                                                self.n_shards,
                                                balance="auto")

    def _plan_dist_tree(self, r_sharded: np.ndarray):
        """MFV gravity always walks the REPLICATED bucket tree (the LET
        decomposition currently carries the SPH zeta scaling only)."""
        p = self.params
        self.letplan = None
        _DistGradh._plan_replicated_tree(
            self, r_sharded, p.stringparams["multipole"],
            p.floatparams["thetamaxsqd"])

    def _sharded_lead_dims(self):
        return {self.state.N}

    _dist_specs = _DistGradh._dist_specs
    _place = _DistGradh._place

    # -- sharded step ------------------------------------------------------
    def _dist_gravity(self, s: MfvState, alive):
        box = self.box
        pdims = box.periodic_dims()
        pext = [box.size[k] if k in pdims else 0.0
                for k in range(s.ndim)] if pdims else None
        return dist.dist_tree_gravity(
            self.treespec, s.bucket_map, s, self.kern, alive,
            self.distplan.n_shards, periodic_extent=pext,
            zeta_scaling="mfv")

    def _dist_dt(self, s: MfvState, alive):
        dt = 2.0 * self.courant_mult * s.h \
            / jnp.maximum(s.vsig_max, 1e-30)
        if self.self_gravity:
            amag = jnp.sqrt(jnp.sum(s.a * s.a, axis=-1))
            dt = jnp.minimum(dt, self.accel_mult
                             * jnp.sqrt(s.h / (amag + 1e-30)))
        return lax.pmin(jnp.min(jnp.where(alive, dt, 1e30)), "dp")

    def _build_dist_step(self, bootstrap: bool):
        box, plan = self.box, self.distplan
        kern, eos, cfg = self.kern, self.eos, self.mfv_cfg
        h_fac, h_conv = self.h_fac, self.h_converge
        ndim = self.ndim

        def dens(s, alive):
            return dist.dist_mfv_density_pass(plan, kern, box, h_fac,
                                              h_conv, eos, s, alive)

        def grads(s, alive):
            return dist.dist_mfv_gradient_pass(
                plan, kern, box, s, alive,
                limiter=self.mfv_cfg.slope_limiter)

        def local_fn(s: MfvState) -> MfvState:
            alive = s.alive
            if bootstrap:
                s = dens(s, alive)
                Q0 = mfv_ops.qcons_from_state(ndim, s.m, s.v, s.u)
                s = s.replace(Qcons0=Q0, r0=s.r, v0=s.v)
                if self.self_gravity:
                    a, gpot, ovf = self._dist_gravity(s, alive)
                    s = s.replace(a=a, a0=a, gpot=gpot,
                                  neib_overflow=s.neib_overflow | ovf)
                s = grads(s, alive)
                return s.replace(dt=self._dist_dt(s, alive))
            dt = s.dt
            t = s.t + dt
            flux = dist.dist_mfv_flux_pass(plan, kern, cfg, box, dt, s,
                                           alive)
            Qcons = s.Qcons0 + flux.dQdt * dt
            if self.self_gravity:
                m_new = Qcons[..., ndim]
                v_mid = Qcons[..., :ndim] \
                    / jnp.maximum(m_new, 1e-30)[:, None]
                r = box.wrap(s.r0 + 0.5 * (s.v0 + v_mid) * dt)
                r, v_mid = box.reflect(r, v_mid)
                s_mid = s.replace(r=r, m=m_new)
                a, gpot, ovf = self._dist_gravity(s_mid, alive)
                s = s.replace(neib_overflow=s.neib_overflow | ovf)
                rdmdt = flux.rdmdt_dot * dt
                Qcons = mfv_ops.gravity_source_terms(
                    ndim, dt, s.Qcons0, Qcons, s.a0, a, rdmdt)
                if self.use_radws_energy:
                    # pointwise table lookups + bisection — shards
                    # trivially (EnergyRadws<MeshlessFVParticle>)
                    Qcons = self._apply_radws_cooling(Qcons, s.ndens,
                                                      gpot, dt)
                m, rho, v, u = mfv_ops.state_from_qcons(ndim, Qcons,
                                                        s.ndens)
                s = s.replace(m=m, v=v, u=u, r=r, Qcons0=Qcons,
                              r0=r, v0=v, a=a, a0=a, gpot=gpot)
            else:
                if self.use_radws_energy:
                    Qcons = self._apply_radws_cooling(Qcons, s.ndens,
                                                      s.gpot, dt)
                m, rho, v, u = mfv_ops.state_from_qcons(ndim, Qcons,
                                                        s.ndens)
                r = box.wrap(s.r0 + 0.5 * (s.v0 + v) * dt)
                # mirror walls: reflect escapers with flipped normal
                # velocity; Qcons momentum follows (matches the
                # single-chip step, sim/mfv_sim.py:469-476)
                r, v = box.reflect(r, v)
                Qcons = Qcons.at[..., :ndim].set(
                    v * jnp.maximum(Qcons[..., ndim], 1e-30)[:, None])
                s = s.replace(m=m, v=v, u=u, r=r, Qcons0=Qcons,
                              r0=r, v0=v)
            s = dens(s, alive)
            s = grads(s, alive)
            return s.replace(t=t, dt=self._dist_dt(s, alive),
                             nstep=s.nstep + 1)

        specs = self._dist_specs()
        try:
            sm = shard_map(local_fn, mesh=self.mesh, in_specs=(specs,),
                           out_specs=specs, check_vma=False)
        except TypeError:  # older jax spells it check_rep
            sm = shard_map(local_fn, mesh=self.mesh, in_specs=(specs,),
                           out_specs=specs, check_rep=False)
        return jax.jit(sm)

    def _compile(self):
        self._step_fn = self._build_dist_step(bootstrap=False)
        self._bootstrap_fn = self._build_dist_step(bootstrap=True)

    # -- host lifecycle ----------------------------------------------------
    def SetupSimulation(self):
        from ..state import make_mfv_state
        from .ic import generate_ic

        with self.timing.block("SETUP"):
            self.process_parameters()
            self.mesh = dist.make_mesh(self.n_shards)
            ic = generate_ic(self.params, self.eos)
            state = make_mfv_state(ic["r"], ic["v"], ic["m"], ic["h"],
                                   ic["u"])
            self._n_orig = state.N
            self._plan_all(np.asarray(ic["r"]), np.asarray(ic["h"]))
            self.state = dist.shard_state(self.distplan, state)
            if self.self_gravity:
                self._plan_dist_tree(np.asarray(self.state.r))
            self._place()
            self._compile()
            self.state = self._bootstrap_fn(self.state)
            tries = 0
            while bool(self.state.neib_overflow):
                tries += 1
                if tries > 3:
                    raise RuntimeError("distributed MFV setup keeps "
                                       "overflowing")
                self._replan(growth=1.3)
                self.state = self._bootstrap_fn(self.state)
        self._init_output_cadence()

    def _replan(self, growth: float = 1.3):
        host = dist.unshard_state(self.distplan, self.state, self._n_orig)
        alive = np.asarray(host.alive)
        h_np = np.asarray(host.h)[alive]
        self._plan_all(np.asarray(host.r), h_np, growth=growth)
        host = host.replace(neib_overflow=jnp.asarray(False))
        self.state = dist.shard_state(self.distplan, host)
        if self.self_gravity:
            self._plan_dist_tree(np.asarray(self.state.r))
        self._place()
        self._compile()

    def main_loop_step(self):
        ntb = max(self.params.intparams["ntreebuildstep"], 1)
        if self.Nsteps > 0 and self.Nsteps % ntb == 0:
            with self.timing.block("DECOMPOSE"):
                self._replan()
        self._clamp_dt_to_tend()
        with self.timing.block("MAIN_LOOP"):
            prev = self.state
            self.state = self._step_fn(prev)
            if bool(self.state.neib_overflow):
                with self.timing.block("GRID_REPLAN"):
                    self.state = prev
                    self._replan(growth=1.5)
                    self.state = self._step_fn(self.state)
                    if bool(self.state.neib_overflow):
                        raise RuntimeError("distributed MFV neighbour "
                                           "overflow persists")
        self.Nsteps += 1
        self.t = float(self.state.t)

    def _state_to_host(self) -> Dict[str, np.ndarray]:
        host = dist.unshard_state(self.distplan, self.state, self._n_orig)
        return {k: np.asarray(getattr(host, k))
                for k in ("r", "v", "a", "m", "h", "rho", "u",
                          "pressure", "sound", "gpot")}


class DistributedMfvRK2Simulation(DistributedMfvSimulation):
    """Heun (RK2) flavour over the sharded runtime (the flux kernels
    branch on MfvConfig.time_scheme, so only the tag differs)."""

    time_scheme = "rk2"
