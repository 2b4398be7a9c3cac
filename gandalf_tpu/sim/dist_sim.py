"""Multi-chip distributed grad-h SPH simulation controller.

The production analogue of the reference's MPI simulation mode
(SphSimulation + MpiControl: domain decomposition at
src/Mpi/MpiKDTreeDecomposition.cpp:56-280, per-step ghost exchange at
src/Hydrodynamics/Ghosts.cpp:161-202, dt Allreduce at
src/Common/Simulation.cpp:1736-1747, migration at tree rebuilds at
src/Mpi/MpiKDTreeDecomposition.cpp:289).

Selected with the `Nmpi` parameter (> 1): the particle state is sharded
into z-slab blocks over a jax Mesh and the WHOLE step — leapfrog predict,
sharded binning + ppermute halo hydro, distributed tree gravity with psum
force return, corrector, pmin timestep — runs as one shard_map-jitted
program.  Re-decomposition (the migration/load-balance analogue) happens
every `ntreebuildstep` steps on the host.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:  # jax >= 0.8 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from jax.sharding import PartitionSpec as P

from ..integrate.leapfrog import correct, predict, sph_timestep
from ..parallel import dist
from ..state import SphState
from .simulation import GradhSphSimulation, Snapshot


class DistributedGradhSphSimulation(GradhSphSimulation):
    """GradhSph controller running SPMD over all local devices."""

    def process_parameters(self):
        super().process_parameters()
        p = self.params
        self.n_shards = p.intparams["Nmpi"]
        self.letplan = None
        n_dev = len(jax.devices())
        if self.n_shards <= 1:
            self.n_shards = n_dev
        if self.n_shards > n_dev:
            raise ValueError(f"Nmpi={self.n_shards} > {n_dev} devices")
        unsupported = []
        if self.use_block:
            unsupported.append("block timesteps (Nlevels > 1)")
        if p.intparams["sink_particles"] or p.intparams["create_sinks"] \
                or p.intparams["Nstar"] > 0:
            unsupported.append("sinks/stars")
        if p.stringparams["dust_forces"] not in ("none", "null", ""):
            unsupported.append("dust")
        if self.use_ewald:
            unsupported.append("Ewald periodic gravity")
        if not self.use_celllist:
            unsupported.append("bruteforce neighbour search")
        if self.box.mirror_walls():
            unsupported.append("mirror boundaries")
        if self.td_avisc_type == "cd2010" and self.integ.td_avisc:
            unsupported.append("cd2010 viscosity switch")
        if unsupported:
            raise NotImplementedError(
                "distributed mode does not yet support: "
                + ", ".join(unsupported))

    # -- planning ----------------------------------------------------------
    def _plan_all(self, r_np: np.ndarray, h_np: np.ndarray,
                  growth: float = 1.3):
        from ..ops.sph_grid27 import plan_grid27

        h_max = float(h_np.max()) * growth
        self.gridspec = plan_grid27(self.box, r_np, h_max,
                                    self.kern.kernrange,
                                    z_multiple=self.n_shards)
        self.distplan = dist.plan_decomposition(self.gridspec, r_np,
                                                self.n_shards)

    def _plan_dist_tree(self, r_sharded: np.ndarray):
        """Plan distributed gravity.  Preferred: the memory-scalable LET
        decomposition (parallel/let.py — per-shard local trees + pruned
        interior summaries + ring halo bands, the analogue of the
        reference's pruned trees, HydroTree.cpp:1044-1238).  Fallback
        when the geometry can't support it (tiny slabs): the replicated
        all_gather path below."""
        from ..parallel import let as let_mod

        p = self.params
        mp = p.stringparams["multipole"]
        theta_sqd = p.floatparams["thetamaxsqd"]
        h_max = float(np.asarray(self.state.h).max()) \
            if self.state is not None else 0.0
        prev_let = getattr(self, "letplan", None)
        self.letplan = let_mod.plan_let(
            np.asarray(r_sharded, np.float64), self.distplan.perm,
            self.n_shards, self.distplan.cap,
            z_lo=self.gridspec.lo[0], z_extent=self.gridspec.extents[0],
            leaf_size=32, theta_sqd=theta_sqd,
            quadrupole=mp in ("quadrupole", "fast_quadrupole"),
            h_support=self.kern.kernrange * h_max, prev=prev_let)
        if self.letplan is not None:
            self.treespec = None
            self.state = self.state.replace(
                bucket_map=jnp.asarray(self.letplan.gmap))
            return
        self._plan_replicated_tree(r_sharded, mp, theta_sqd)

    def _plan_replicated_tree(self, r_sharded, mp, theta_sqd):
        """Bucket plan over the REAL slots of the sharded layout only;
        bucket entries are then remapped to sharded-slot indices.  (Pads
        must not enter the KD planner: a far-sentinel pad cluster hijacks
        the longest-axis choice and produces domain-spanning slab buckets
        that break the min-image unwrap.)"""
        from ..ops.tree import plan_buckets_kd, plan_tree_for_buckets
        real_idx = np.nonzero(self.distplan.perm >= 0)[0]
        L = 32
        gmap_r = plan_buckets_kd(np.asarray(r_sharded, np.float64)
                                 [real_idx], leaf_size=L)
        gmap = np.where(gmap_r >= 0,
                        real_idx[np.maximum(gmap_r, 0)],
                        -1).astype(np.int32)
        # pad group count to a shard multiple so every shard walks an
        # equal contiguous range
        G = gmap.shape[0]
        if G % self.n_shards != 0:
            G2 = -(-G // self.n_shards) * self.n_shards
            gmap = np.concatenate(
                [gmap, np.full((G2 - G, L), -1, np.int32)])
        near_cap = int(13.0 * L * (0.1 / max(theta_sqd, 1e-3)) ** 1.5) + 48
        old = self.treespec
        if old is not None and near_cap < old.near_cap <= 4 * near_cap:
            near_cap = old.near_cap
        self.treespec = plan_tree_for_buckets(
            gmap, theta_sqd=theta_sqd,
            quadrupole=mp in ("quadrupole", "fast_quadrupole"),
            fast=mp.startswith("fast"), near_cap=near_cap,
            frontier=2 * near_cap + 64)
        self.state = self.state.replace(bucket_map=jnp.asarray(gmap))

    # -- jitted step -------------------------------------------------------
    def _sharded_lead_dims(self):
        dims = {self.state.N}
        if getattr(self, "letplan", None) is not None:
            dims.add(self.letplan.gmap.shape[0])   # per-shard bucket maps
        return dims

    def _dist_specs(self):
        dims = self._sharded_lead_dims()

        def rule(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] in dims:
                return P("dp", *([None] * (x.ndim - 1)))
            return P()

        return jax.tree_util.tree_map(rule, self.state)

    def _build_dist_step(self, bootstrap: bool):
        integ, box = self.integ, self.box
        plan = self.distplan
        sim = self

        def local(s: SphState) -> SphState:
            dt = s.dt
            if not bootstrap:
                t = s.t + dt
                s = predict(integ, s, dt)
                r = box.wrap(s.r)
                s = s.replace(r=r, r0=box.wrap(s.r0))
            alive = s.alive
            s = dist.dist_hydro_pass(
                self.mesh, plan, sim.kern, sim.visc, box, sim.eos,
                sim.h_fac, sim.h_converge, sim.hydro_forces, s, alive)
            if sim.self_gravity:
                pdims = box.periodic_dims()
                pext = [box.size[k] if k in pdims else 0.0
                        for k in range(s.ndim)] if pdims else None
                if sim.letplan is not None:
                    from ..parallel.let import let_gravity

                    a_g, gpot, ovg = let_gravity(
                        sim.letplan, s.bucket_map, s.r, s.m, s.h,
                        s.zeta * s.hfactor, alive, sim.kern,
                        periodic_extent=pext)
                else:
                    a_g, gpot, ovg = dist.dist_tree_gravity(
                        sim.treespec, s.bucket_map, s, sim.kern, alive,
                        plan.n_shards, periodic_extent=pext)
                s = s.replace(a=s.a + a_g, gpot=gpot,
                              neib_overflow=s.neib_overflow | ovg)
            if sim.extpot != "none":
                from ..ops.gravity import external_potential

                a_x, _, pot_x = external_potential(
                    sim.extpot, sim.extpot_cfg, s.r, s.v)
                s = s.replace(a=s.a + a_x, gpot=s.gpot + pot_x)
            if bootstrap:
                s = s.replace(a0=s.a, dudt0=s.dudt, u0=s.u, r0=s.r,
                              v0=s.v)
            else:
                s = correct(integ, s, dt, self._dalphadt(s))
            dt_part = jnp.where(alive,
                                sph_timestep(integ, s, sim.hydro_forces),
                                1e30)
            dt_next = lax.pmin(jnp.min(dt_part), "dp")
            if bootstrap:
                return s.replace(dt=dt_next)
            return s.replace(t=t, dt=dt_next, nstep=s.nstep + 1)

        specs = self._dist_specs()
        try:
            sm = shard_map(local, mesh=self.mesh, in_specs=(specs,),
                           out_specs=specs, check_vma=False)
        except TypeError:  # older jax spells it check_rep
            sm = shard_map(local, mesh=self.mesh, in_specs=(specs,),
                           out_specs=specs, check_rep=False)
        return jax.jit(sm)

    def _compile(self):
        self._step_fn = self._build_dist_step(bootstrap=False)
        self._bootstrap_fn = self._build_dist_step(bootstrap=True)

    # -- host lifecycle ----------------------------------------------------
    def SetupSimulation(self):
        from ..state import make_sph_state
        from .ic import generate_ic

        with self.timing.block("SETUP"):
            self.process_parameters()
            self.mesh = dist.make_mesh(self.n_shards)
            ic = generate_ic(self.params, self.eos)
            state = make_sph_state(ic["r"], ic["v"], ic["m"], ic["h"],
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
                    raise RuntimeError("distributed setup keeps "
                                       "overflowing")
                self._replan(growth=1.3)
                self.state = self._bootstrap_fn(self.state)
        self._init_output_cadence()

    def _place(self):
        shardings = dist.state_shardings(self.mesh, self.state,
                                         self._sharded_lead_dims())
        self.state = jax.tree_util.tree_map(
            lambda x, sh: jax.device_put(x, sh), self.state, shardings)

    def _replan(self, growth: float = 1.3, grow_caps: bool = False):
        """Gather, re-decompose (migration + load balance), re-shard."""
        from ..parallel.let import grow_let_caps

        host = dist.unshard_state(self.distplan, self.state, self._n_orig)
        alive = np.asarray(host.alive)
        r_np = np.asarray(host.r)[alive]
        h_np = np.asarray(host.h)[alive]
        self._plan_all(np.asarray(host.r), h_np, growth=growth)
        host = host.replace(neib_overflow=jnp.asarray(False))
        self.state = dist.shard_state(self.distplan, host)
        if self.self_gravity:
            if grow_caps and self.letplan is not None:
                self.letplan = grow_let_caps(self.letplan)
            self._plan_dist_tree(np.asarray(self.state.r))
        self._place()
        self._compile()

    def main_loop_step(self):
        ntb = max(self.params.intparams["ntreebuildstep"], 1)
        if self.Nsteps > 0 and self.Nsteps % ntb == 0:
            with self.timing.block("DECOMPOSE"):
                self._replan()
        with self.timing.block("MAIN_LOOP"):
            prev = self.state
            self.state = self._step_fn(prev)
            if bool(self.state.neib_overflow):
                with self.timing.block("GRID_REPLAN"):
                    self.state = prev
                    self._replan(growth=1.3, grow_caps=True)
                    self.state = self._step_fn(self.state)
        self.Nsteps += 1
        self.t = float(self.state.t)

    def _state_to_host(self):
        host = dist.unshard_state(self.distplan, self.state, self._n_orig)
        return {k: np.asarray(getattr(host, k))
                for k in ("r", "v", "a", "m", "h", "rho", "u", "dudt",
                          "pressure", "sound", "div_v")}
