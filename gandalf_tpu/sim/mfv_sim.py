"""Meshless finite-volume (MUSCL) simulation controller.

Analogue of MfvMusclSimulation (src/MeshlessFV/MfvMusclSimulation.cpp:56-):
one global-timestep MUSCL step is

  1. Godunov fluxes from the PREVIOUS step's gradients (UpdateGodunovFluxes),
  2. advance conserved variables, drift positions with the mean velocity
     (MfvIntegration::AdvanceParticles / EndTimestep collapsed — global dt),
  3. boundary enforcement,
  4. number-density / h update (UpdateAllProperties),
  5. gradients + slope limiting for the NEXT step (UpdateGradientMatrices),
  6. new timestep from vsig_max.

Neighbour paths: the structured 27-shift grid (ops/mfv_grid27, the
MeshlessFVTree analogue) in production, with the all-pairs
mirror-image/min-image views as the oracle and the mirror-wall path;
self-gravity walks the same Barnes-Hut bucket tree as SPH with the MFV
zeta scaling.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.smoothing import kernel_factory
from ..ops import mfv as mfv_ops
from ..ops.eos import eos_factory
from ..ops.neighbors import extend_with_mirror_images
from ..params import Parameters
from ..state import DomainBox, MfvState, make_mfv_state
from .ic import generate_ic
from .simulation import SimulationBase, Snapshot


class MfvMusclSimulation(SimulationBase):
    time_scheme = "muscl"

    def __init__(self, params: Parameters):
        super().__init__(params)
        self._step_fn = None

    def process_parameters(self):
        p = self.params
        self.kern = kernel_factory(p.stringparams["kernel"], self.ndim,
                                   p.intparams["tabulated_kernel"])
        self.eos = eos_factory(p)
        self.box = DomainBox.from_params(p)
        if p.stringparams["riemann_solver"] not in ("hllc", "exact"):
            raise ValueError("riemann_solver must be hllc or exact")
        # limiter aliases as in the reference factory
        # (MeshlessFVSimulation.cpp:87-110)
        limiter = {"tess2011": "tvdscalar",
                   "balsara2004": "scalar"}.get(
            p.stringparams["slope_limiter"],
            p.stringparams["slope_limiter"])
        if limiter not in ("gizmo", "null", "zeroslope", "scalar",
                           "tvdscalar", "springel2009"):
            raise ValueError(f"unrecognised slope_limiter '{limiter}'")
        self.mfv_cfg = mfv_ops.MfvConfig(
            gamma=p.floatparams["gamma_eos"],
            zero_mass_flux=bool(p.intparams["zero_mass_flux"]),
            static_particles=bool(p.intparams["static_particles"]),
            riemann=p.stringparams["riemann_solver"],
            slope_limiter=limiter,
            time_scheme=self.time_scheme)
        self.h_fac = p.floatparams["h_fac"]
        self.h_converge = p.floatparams["h_converge"]
        self.hydro_forces = bool(p.intparams["hydro_forces"])
        self.courant_mult = p.floatparams["courant_mult"]
        self.accel_mult = p.floatparams["accel_mult"]
        self.self_gravity = bool(p.intparams["self_gravity"])
        # radws radiative cooling (EnergyRadws<MeshlessFVParticle>:
        # implicit heating folded into the total-energy conserved
        # variable, reference EnergyRadws.cpp:215-260 +
        # MfvIntegration.cpp:88-89 part.cooling)
        self.use_radws_energy = (
            p.stringparams["gas_eos"] == "radws"
            and p.stringparams["energy_integration"] == "radws")
        # hierarchical block timesteps (reference MfvIntegration.cpp +
        # ComputeBlockTimesteps; Nlevels == 1 is the global-dt scheme)
        self.nlevels = p.intparams["Nlevels"]
        self.use_block = self.nlevels > 1
        self.level_diff_max = p.intparams["level_diff_max"]
        self.time_step_limiter = p.stringparams["time_step_limiter"]
        if self.use_block and self.time_scheme == "rk2":
            raise NotImplementedError(
                "block timesteps are wired to the MUSCL MFV scheme "
                "(the reference's RK2 block coupling differs)")
        # periodic-image gravity corrections (reference always applies
        # Ewald to periodic self-gravity, Simulation.cpp:1189; the MFV
        # tree walk takes the same correction table as SPH)
        self.ewald_table = None
        self.use_ewald = False
        if self.self_gravity and self.box.periodic_dims() \
                and bool(p.intparams["ewald"]):
            if self.ndim != 3:
                raise NotImplementedError(
                    "Ewald periodic self-gravity requires a 3D box "
                    "(matches the reference, Ewald.cpp ndim == 3 guard)")
            self.use_ewald = True
            from ..ops.ewald import build_ewald_table

            pdims = self.box.periodic_dims()
            self.ewald_table = build_ewald_table(
                self.box.size, ngrid=max(p.intparams["nEwaldGrid"], 9),
                ewald_mult=p.floatparams["ewald_mult"],
                periodic=tuple(k in pdims for k in range(3)))
        # neighbour-search strategy (mirrors the SPH controller): anything
        # but "bruteforce" maps to the structured-grid production path
        # (ops/mfv_grid27.py, the MeshlessFVTree analogue); mirror walls
        # need the image-based all-pairs path.
        self.neib_search = p.stringparams["neib_search"]
        self.use_celllist = (self.neib_search != "bruteforce"
                             and not self.box.mirror_walls())
        self.gridspec = None
        self.treespec = None
        if self.self_gravity and self.box.periodic_dims() \
                and not self.use_celllist:
            raise NotImplementedError("periodic MFV self-gravity needs the "
                                      "tree path (neib_search=kdtree)")

    # -- neighbour views (all-pairs with images) ----------------------------
    def _neighbor_view(self, s: MfvState, fields: Dict[str, jnp.ndarray]):
        """Extended (mirror-image) neighbour arrays + displacement tensor."""
        box = self.box
        r_ext, v_ext, sc_ext, parent = extend_with_mirror_images(
            box, s.r, s.v, {})
        n_img = r_ext.shape[0] // s.N
        dr = box.min_image(r_ext[None, :, :] - s.r[:, None, :])

        def ext(x, flip_v=False):
            if x.ndim == 1:
                return jnp.tile(x, (n_img,))
            return jnp.concatenate([x] * n_img, axis=0)

        out = {k: ext(x) for k, x in fields.items()}
        return dr, v_ext, out

    def _density_pass(self, s: MfvState) -> MfvState:
        box, kern = self.box, self.kern
        r_ext, v_ext, _, _ = extend_with_mirror_images(box, s.r, s.v, {})
        dr = box.min_image(r_ext[None, :, :] - s.r[:, None, :])
        drsqd = jnp.sum(dr * dr, axis=-1)
        n_img = r_ext.shape[0] // s.N
        m_ext = jnp.tile(s.m, (n_img,))
        res = mfv_ops.compute_h_mfv(kern, s.ndim, self.h_fac,
                                    self.h_converge, s.m, s.h, drsqd, m_ext)
        u, pressure, sound = self.eos.thermal_update(
            jnp.maximum(res.rho, 1e-30), s.u)
        return s.replace(h=res.h, ndens=res.ndens, rho=res.rho,
                         invomega=res.invomega, zeta=res.zeta,
                         hfactor=res.hfactor, u=u, pressure=pressure,
                         sound=sound)

    def _gradient_pass(self, s: MfvState) -> MfvState:
        box, kern = self.box, self.kern
        r_ext, v_ext, _, _ = extend_with_mirror_images(box, s.r, s.v, {})
        dr = box.min_image(r_ext[None, :, :] - s.r[:, None, :])
        n_img = r_ext.shape[0] // s.N
        W = s.Wprim
        # image W: velocities are the reflected v_ext; rho/p copy parents
        W_ext = jnp.concatenate(
            [v_ext, jnp.tile(s.rho, (n_img,))[:, None],
             jnp.tile(s.pressure, (n_img,))[:, None]], axis=-1)
        res = mfv_ops.compute_gradients(
            kern, s.ndim, s.r, s.h, s.ndens, s.hfactor, W, s.sound,
            dr, jnp.broadcast_to(W_ext[None], (s.N,) + W_ext.shape),
            jnp.broadcast_to(jnp.tile(s.sound, (n_img,))[None], (s.N, v_ext.shape[0])),
            jnp.broadcast_to(v_ext[None], (s.N,) + v_ext.shape), None,
            limiter=self.mfv_cfg.slope_limiter)
        return s.replace(B=res.B, grad=res.grad, alpha_slope=res.alpha_slope,
                         vsig_max=res.vsig_max, bad_grad=res.bad)

    def _mirror_tensor_images(self, s: MfvState):
        """Reflected per-image B / grad / a0 blocks matching
        extend_with_mirror_images' ordering: under the wall-k reflection
        R (identity with R_kk = -1), B -> R B R^T, grad -> S grad R^T
        with S flipping the v_k row, a0 -> R a0 (reference reflect()
        helpers, Particle.h:601-668)."""
        nd = s.ndim
        Bs, grads, a0s = [s.B], [s.grad], [s.a0]
        for (k, _side) in self.box.mirror_walls():
            sign = jnp.ones((nd,), s.B.dtype).at[k].set(-1.0)
            row = jnp.concatenate([sign, jnp.ones((2,), s.B.dtype)])
            Bs.append(s.B * sign[None, :, None] * sign[None, None, :])
            grads.append(s.grad * row[None, :, None]
                         * sign[None, None, :])
            a0s.append(s.a0 * sign[None, :])
        cat = lambda xs: jnp.concatenate(xs, axis=0)
        return cat(Bs), cat(grads), cat(a0s)

    def _flux_pass(self, s: MfvState, dt, block=None):
        box, kern = self.box, self.kern
        r_ext, v_ext, _, _ = extend_with_mirror_images(box, s.r, s.v, {})
        dr = box.min_image(r_ext[None, :, :] - s.r[:, None, :])
        n_img = r_ext.shape[0] // s.N
        M = r_ext.shape[0]
        t1 = lambda x: jnp.broadcast_to(jnp.tile(x, (n_img,))[None],
                                        (s.N, M))
        bv = lambda x: jnp.broadcast_to(x[None], (s.N, M) + x.shape[1:])
        W_ext = jnp.concatenate(
            [v_ext, jnp.tile(s.rho, (n_img,))[:, None],
             jnp.tile(s.pressure, (n_img,))[:, None]], axis=-1)
        B_ext, grad_ext, a0_ext = self._mirror_tensor_images(s)
        nb = {
            "h": t1(s.h), "ndens": t1(s.ndens), "hfactor": t1(s.hfactor),
            "Wprim": jnp.broadcast_to(W_ext[None], (s.N, M, s.nvar)),
            "sound": t1(s.sound), "a0": bv(a0_ext),
            "B": bv(B_ext), "grad": bv(grad_ext),
            "alpha_slope": jnp.broadcast_to(
                jnp.tile(s.alpha_slope, (n_img, 1))[None],
                (s.N, M, s.nvar)),
            "bad": t1(s.bad_grad) > 0.5,
        }
        kw = {}
        if block is not None:
            start, dt_own = block
            kw["dt_pair"] = jnp.minimum(dt_own[:, None], t1(dt_own))
            kw["pair_on"] = start[:, None] \
                | (t1(start.astype(s.h.dtype)) > 0.5)
        return mfv_ops.compute_godunov_fluxes(
            kern, self.mfv_cfg, s.ndim, dt,
            s.r, s.h, s.ndens, s.hfactor, s.Wprim, s.sound, s.a0,
            s.B, s.grad, s.alpha_slope, s.bad_grad, dr, nb, None, **kw)

    # -- neighbour passes (structured grid, ops/mfv_grid27.py) --------------
    def _grid_binning(self, s: MfvState, r):
        from ..ops import sph_grid27 as g27

        spec = self.gridspec
        b = g27.bin_particles(spec, r)
        fill = g27.dense_fill_mask(spec, b)
        d = lambda x: g27.to_dense(spec, b, x)
        back = lambda x: g27.from_dense(spec, b, x)
        return spec, b, fill, d, back

    def _density_pass_grid(self, s: MfvState) -> MfvState:
        from ..ops.mfv_grid27 import density_mfv_grid27

        from ..ops.sph_grid27 import hmax_of

        spec, b, fill, d, back = self._grid_binning(s, s.r)
        hmax = hmax_of(spec, self.kern.kernrange)
        dens = density_mfv_grid27(self.kern, spec, self.h_fac,
                                  self.h_converge, d(s.r), d(s.m), d(s.h),
                                  fill, hmax)
        rho = back(dens.rho)
        u, pressure, sound = self.eos.thermal_update(
            jnp.maximum(rho, 1e-30), s.u)
        return s.replace(
            h=back(dens.h), ndens=back(dens.ndens), rho=rho,
            invomega=back(dens.invomega), zeta=back(dens.zeta),
            hfactor=back(dens.hfactor), u=u, pressure=pressure, sound=sound,
            neib_overflow=s.neib_overflow | dens.overflow | b.overflow)

    def _gradient_pass_grid(self, s: MfvState) -> MfvState:
        from ..ops.mfv_grid27 import gradients_mfv_grid27

        spec, b, fill, d, back = self._grid_binning(s, s.r)
        dense = {"r": d(s.r), "h": d(s.h), "ndens": d(s.ndens),
                 "Wprim": d(s.Wprim), "sound": d(s.sound)}
        res = gradients_mfv_grid27(self.kern, spec, dense, fill,
                                   limiter=self.mfv_cfg.slope_limiter)
        return s.replace(B=back(res.B), grad=back(res.grad),
                         alpha_slope=back(res.alpha_slope),
                         vsig_max=back(res.vsig_max),
                         bad_grad=back(res.bad).astype(s.h.dtype),
                         neib_overflow=s.neib_overflow | b.overflow)

    def _flux_pass_grid(self, s: MfvState, dt, block=None):
        from ..ops.mfv_grid27 import fluxes_mfv_grid27

        spec, b, fill, d, back = self._grid_binning(s, s.r)
        dense = {"r": d(s.r), "h": d(s.h), "ndens": d(s.ndens),
                 "hfactor": d(s.hfactor), "Wprim": d(s.Wprim),
                 "sound": d(s.sound), "a0": d(s.a0), "B": d(s.B),
                 "grad": d(s.grad), "alpha_slope": d(s.alpha_slope),
                 "bad": d(s.bad_grad.astype(s.h.dtype))}
        if block is not None:
            start, dt_own = block
            dense["dt_own"] = d(dt_own)
            dense["start"] = d(start.astype(s.h.dtype))
        res = fluxes_mfv_grid27(self.kern, self.mfv_cfg, spec, dt,
                                dense, fill)
        from ..ops.mfv import FluxResult

        if block is not None:
            return FluxResult(dQdt=back(res.dQdt),
                              rdmdt_dot=back(res.rdmdt_dot),
                              dQ=back(res.dQ), rdmdt=back(res.rdmdt))
        return FluxResult(dQdt=back(res.dQdt), rdmdt_dot=back(res.rdmdt_dot))

    # -- jitted step ---------------------------------------------------------
    def _gravity_pass(self, s: MfvState):
        """Smoothed self-gravity acceleration (zeta-corrected).

        Production path: the same Barnes-Hut bucket walk as SPH
        (MeshlessFVTree::UpdateAllGravForces), with the MFV zeta scaling
        (MfvCommon::ComputeSmoothedGravForces, MfvCommon.cpp:413-416);
        oracle path: all-pairs."""
        if self.treespec is not None:
            from ..ops.tree import tree_gravity_grouped, tree_gravity_listed

            pdims = self.box.periodic_dims()
            pext = [self.box.size[k] if k in pdims else 0.0
                    for k in range(self.ndim)] if pdims else None
            if self.treespec.mp_cap > 0 and s.walk_mp is not None:
                # listed (drift-skin) walk — see SimulationBase._hydro_pass
                return tree_gravity_listed(
                    self.treespec, s.bucket_map, s.walk_mp, s.walk_near,
                    s.walk_plan_r, s.walk_anchors, s.walk_margin,
                    s.r, s.m, s.h, self.kern, alive=s.alive,
                    zh=s.zeta * s.hfactor, periodic_extent=pext,
                    zeta_scaling="mfv")
            a_g, gpot, overflow = tree_gravity_grouped(
                self.treespec, s.bucket_map, s.r, s.m, s.h, self.kern,
                alive=s.alive, zh=s.zeta * s.hfactor,
                periodic_extent=pext, zeta_scaling="mfv",
                ewald_table=self.ewald_table if self.use_ewald else None)
            return a_g, gpot, overflow
        from ..ops.mfv import mfv_smoothed_gravity

        a, gpot = mfv_smoothed_gravity(self.kern, self.box, s.r, s.m, s.h,
                                       s.zeta, s.hfactor)
        return a, gpot, jnp.asarray(False)

    def _dt_criterion_part(self, s: MfvState):
        """Per-particle Courant + acceleration timestep
        (MfvIntegration::Timestep, MfvIntegration.cpp:9-34)."""
        dt = 2.0 * self.courant_mult * s.h \
            / jnp.maximum(s.vsig_max, 1e-30)
        if self.self_gravity:
            amag = jnp.sqrt(jnp.sum(s.a * s.a, axis=-1))
            dt = jnp.minimum(dt, self.accel_mult
                             * jnp.sqrt(s.h / (amag + 1e-30)))
        return dt

    def _dt_criterion(self, s: MfvState):
        return jnp.min(self._dt_criterion_part(s))

    def _levelneib_pass(self, s: MfvState):
        """Max neighbour timestep level within kernel range (the reference
        accumulates levelneib inside its force loops)."""
        from ..integrate.block import compute_levelneib

        if not self.use_celllist:
            return compute_levelneib(self.box, s.r, s.h, s.level,
                                     self.kern.kernrange, s.alive)
        from ..ops.active_grid import gather_active_candidates
        from ..ops.sph_grid27 import bin_particles

        b = bin_particles(self.gridspec, s.r, discard=~s.alive)
        idx = jnp.arange(s.N, dtype=jnp.int32)
        ag = gather_active_candidates(self.gridspec, b, s.r, idx, s.alive)
        cid = jnp.maximum(ag.ids, 0)
        drsqd = jnp.sum(ag.dr * ag.dr, axis=-1)
        hm = jnp.maximum(s.h[:, None], s.h[cid])
        near = ag.mask & (drsqd <= (self.kern.kernrange * hm) ** 2)
        return jnp.max(jnp.where(near, s.level[cid], 0), axis=-1)

    def _vsig_conservative(self, s: MfvState):
        """Distant-signal-velocity bound for the conservative timestep
        limiter (Tree::ComputeSignalVelocityFromDistantInteractions,
        src/Tree/Tree.cpp:891-1040): exact over the shift neighbourhood +
        a conservative cell-aggregate bound for the far field; the
        all-pairs oracle on the bruteforce path."""
        from ..integrate.mfv_block import vsig_distant_dense

        if not self.use_celllist:
            return vsig_distant_dense(self.box, s.r, s.v, s.h, s.sound,
                                      s.alive)
        from ..ops.mfv_grid27 import vsig_far_cells, vsig_near_grid27
        from ..ops import sph_grid27 as g27

        spec, b, fill, d, back = self._grid_binning(s, s.r)
        dense = {"r": d(s.r), "v": d(s.v), "sound": d(s.sound),
                 "h": d(s.h)}
        near = back(vsig_near_grid27(spec, dense, fill))
        A, Bc = vsig_far_cells(spec, dense, fill)
        cell_of = jnp.clip(b.cell_of, 0, spec.total_cells - 1)
        far = s.h * jnp.maximum(
            s.sound * A[cell_of] + Bc[cell_of], 0.0)
        return jnp.maximum(near, far)

    def _build_bootstrap(self):
        if self.use_celllist:
            self._density_pass = self._density_pass_grid
            self._gradient_pass = self._gradient_pass_grid
            self._flux_pass = self._flux_pass_grid

        def bootstrap(s: MfvState) -> MfvState:
            s = self._density_pass(s)
            Q0 = mfv_ops.qcons_from_state(s.ndim, s.m, s.v, s.u)
            s = s.replace(Qcons0=Q0, r0=s.r, v0=s.v)
            if self.self_gravity:
                a, gpot, ovf = self._gravity_pass(s)
                s = s.replace(a=a, a0=a,
                              neib_overflow=s.neib_overflow | ovf)
            s = self._gradient_pass(s)
            return s.replace(dt=self._dt_criterion(s))

        if not self.use_block:
            return bootstrap

        from ..integrate.block import BlockConfig
        from ..integrate.mfv_block import init_schedule_mfv

        cfg = BlockConfig(nlevels=self.nlevels,
                          level_diff_max=self.level_diff_max)

        def bootstrap_block(s: MfvState):
            s = bootstrap(s)
            vsig = s.vsig_max
            if self.time_step_limiter == "conservative":
                vsig = jnp.maximum(vsig, self._vsig_conservative(s))
            dt_part = self._dt_criterion_part(s.replace(vsig_max=vsig))
            s, sched = init_schedule_mfv(cfg, s, dt_part)
            return s.replace(dt=sched.dt_base), sched

        return bootstrap_block

    def _apply_radws_cooling(self, Qcons, ndens, gpot, dt):
        """Fold the implicit radiative heating rate into the total-energy
        conserved variable (EnergyRadws<MeshlessFVParticle>::EndTimestep,
        EnergyRadws.cpp:215-260: part.cooling = -m heating, applied as
        Qcons[ietot] -= cooling dt, MfvIntegration.cpp:88-89; the rate is
        clipped at -0.95 u / dt for stability as in the reference)."""
        from ..ops.radws import radws_col2, radws_implicit_heating

        ndim = self.ndim
        table = self.eos.table
        m, rho, v, u = mfv_ops.state_from_qcons(ndim, Qcons, ndens)
        col2 = radws_col2(table, rho, jnp.maximum(gpot, 0.0))
        heat = radws_implicit_heating(table, rho, u, jnp.zeros_like(u),
                                      col2, dt)
        heat = jnp.maximum(heat, -0.95 * u / jnp.maximum(dt, 1e-30))
        return Qcons.at[..., ndim + 1].add(m * heat * dt)

    def _build_step(self):
        ndim = self.ndim

        if self.use_block:
            return self._build_block_tick()

        def step(s: MfvState) -> MfvState:
            dt = s.dt
            t = s.t + dt
            flux = self._flux_pass(s, dt)
            Qcons = s.Qcons0 + flux.dQdt * dt
            if self.self_gravity:
                # drift, re-evaluate gravity, apply the momentum/energy
                # source terms (MfvIntegration.cpp:150-170)
                m_new = Qcons[..., ndim]
                v_mid = Qcons[..., :ndim] / jnp.maximum(m_new, 1e-30)[:, None]
                r = self.box.wrap(s.r0 + 0.5 * (s.v0 + v_mid) * dt)
                r, v_mid = self.box.reflect(r, v_mid)
                s_mid = s.replace(r=r, m=m_new)
                a, gpot, ovf = self._gravity_pass(s_mid)
                s = s.replace(neib_overflow=s.neib_overflow | ovf)
                rdmdt = flux.rdmdt_dot * dt
                Qcons = mfv_ops.gravity_source_terms(
                    ndim, dt, s.Qcons0, Qcons, s.a0, a, rdmdt)
                if self.use_radws_energy:
                    Qcons = self._apply_radws_cooling(Qcons, s.ndens,
                                                      gpot, dt)
                m, rho, v, u = mfv_ops.state_from_qcons(ndim, Qcons, s.ndens)
                s = s.replace(m=m, v=v, u=u, r=r, Qcons0=Qcons,
                              r0=r, v0=v, a=a, a0=a, gpot=gpot)
            else:
                if self.use_radws_energy:
                    Qcons = self._apply_radws_cooling(Qcons, s.ndens,
                                                      s.gpot, dt)
                m, rho, v, u = mfv_ops.state_from_qcons(ndim, Qcons, s.ndens)
                r = s.r0 + 0.5 * (s.v0 + v) * dt
                r = self.box.wrap(r)
                # mirror walls: reflect escapers back inside with flipped
                # normal velocity (CheckBoundaries analogue); Qcons
                # momentum follows the reflected velocity
                r, v = self.box.reflect(r, v)
                Qcons = Qcons.at[..., :ndim].set(
                    v * jnp.maximum(Qcons[..., ndim], 1e-30)[:, None])
                s = s.replace(m=m, v=v, u=u, r=r, Qcons0=Qcons,
                              r0=r, v0=v)
            s = self._density_pass(s)
            s = self._gradient_pass(s)
            return s.replace(t=t, dt=self._dt_criterion(s),
                             nstep=s.nstep + 1)

        return step

    def _build_block_tick(self):
        """One dt_base tick of the hierarchical block-timestep MUSCL
        scheme (the masked-dense analogue of MfvMusclSimulation::MainLoop
        with Nlevels > 1, MfvMusclSimulation.cpp:56-330 +
        MfvIntegration.cpp): fluxes for pairs whose deeper member starts
        a step, predict/drift all, Saitoh-Makino limiter, dense
        density/gravity refresh, distant-vsig conservative limiter,
        commit enders + ladder, gradients for the next tick."""
        from ..integrate.block import BlockConfig
        from ..integrate.mfv_block import (advance_mfv, check_timesteps_mfv,
                                           end_timestep_mfv)

        cfg = BlockConfig(nlevels=self.nlevels,
                          level_diff_max=self.level_diff_max)
        box = self.box

        def tick(s: MfvState, B):
            # ---- flux pass for starting pairs (UpdateGodunovFluxes) ----
            start = (B.n == s.nlast) & s.alive
            dt_own = B.dt_base * B.nstep_part.astype(s.m.dtype)
            flux = self._flux_pass(s, B.dt_base, block=(start, dt_own))
            s = s.replace(
                dQ=s.dQ + flux.dQ,
                rdmdt=s.rdmdt + flux.rdmdt,
                dQdt=jnp.where(start[:, None], flux.dQdt, s.dQdt))
            # ---- advance: predict conserved state + drift all ----------
            s, active, t, _ = advance_mfv(s, B)
            r = box.wrap(s.r)
            r, v = box.reflect(r, s.v)
            rho = s.m * s.ndens
            u, pressure, sound = self.eos.thermal_update(
                jnp.maximum(rho, 1e-30), s.u)
            s = s.replace(r=r, v=v, rho=rho, u=u, pressure=pressure,
                          sound=sound)
            # ---- Saitoh-Makino simple limiter --------------------------
            if self.time_step_limiter == "simple":
                active, nstep_p, level, s = check_timesteps_mfv(
                    cfg, s, B, active)
            else:
                nstep_p, level = B.nstep_part, s.level
            # ---- dense density / gravity refresh -----------------------
            s = self._density_pass(s)
            if self.self_gravity:
                a, gpot, ovf = self._gravity_pass(s)
                s = s.replace(a=a, gpot=gpot,
                              neib_overflow=s.neib_overflow | ovf)
            s = s.replace(levelneib=self._levelneib_pass(s))
            # ---- timestep criterion (+ conservative limiter) -----------
            vsig = s.vsig_max
            if self.time_step_limiter == "conservative":
                vsig = jnp.maximum(vsig, self._vsig_conservative(s))
            dt_crit = self._dt_criterion_part(s.replace(vsig_max=vsig))
            # ---- commit enders + ladder (EndTimestep) ------------------
            cooling = (self._apply_radws_cooling
                       if self.use_radws_energy else None)
            s, B = end_timestep_mfv(cfg, self.eos, s, B, active, level,
                                    nstep_p, dt_crit, t,
                                    cooling_fn=cooling)
            # ---- gradients for the NEXT tick's fluxes ------------------
            s = self._gradient_pass(s)
            return s.replace(nstep=s.nstep + 1), B

        return tick

    # -- host lifecycle -------------------------------------------------------
    def _compile(self):
        self._step_fn = jax.jit(self._build_step())
        self._bootstrap_fn = jax.jit(self._build_bootstrap())
        # async-burst stepping (SimulationBase.main_loop_steps): sound for
        # the global-dt scheme, where one host-free jitted step advances
        # the whole simulation
        self._can_burst = not self.use_block

    def SetupSimulation(self):
        with self.timing.block("SETUP"):
            self.process_parameters()
            ic = generate_ic(self.params, self.eos)
            self.state = make_mfv_state(ic["r"], ic["v"], ic["m"],
                                        ic["h"], ic["u"])
            if self.use_celllist:
                self._plan_grid(ic["r"], ic["h"])
            if self.self_gravity and self.use_celllist:
                self._plan_tree_buckets(np.asarray(self.state.r))
            self._compile()

            def _boot():
                if self.use_block:
                    self.state, self._blocksched = \
                        self._bootstrap_fn(self.state)
                else:
                    self.state = self._bootstrap_fn(self.state)

            _boot()
            while self.use_celllist and bool(self.state.neib_overflow):
                self._plan_grid(self.state.r, self.state.h)
                if self.treespec is not None:
                    self._plan_tree_buckets(np.asarray(self.state.r),
                                            grow_caps=True)
                self.state = self.state.replace(
                    neib_overflow=jnp.asarray(False))
                self._compile()
                _boot()
        self._init_output_cadence()

    def main_loop_step(self):
        # gravity-tree bucket rebuild cadence (ntreebuildstep analogue)
        if self.treespec is not None and self.Nsteps > 0:
            ntb = max(self.params.intparams["ntreebuildstep"], 1)
            if self.Nsteps % ntb == 0:
                with self.timing.block("TREE_REBUILD"):
                    if self._plan_tree_buckets(np.asarray(self.state.r)):
                        self._compile()
        self._clamp_dt_to_tend()
        with self.timing.block("MAIN_LOOP"):
            prev = self.state
            prevB = getattr(self, "_blocksched", None)
            if self.use_block:
                self.state, self._blocksched = self._step_fn(prev, prevB)
            else:
                self.state = self._step_fn(prev)
            # neighbour-capacity overflow: replan the grid (and regrow the
            # tree caps) and redo the step from the pre-step state (mirrors
            # GradhSphSimulation; reference analogue Nneibmax doubling,
            # GradhSphTree.cpp:172)
            if self.use_celllist and bool(self.state.neib_overflow):
                with self.timing.block("GRID_REPLAN"):
                    for attempt in range(4):
                        self.state = prev
                        self._plan_grid(prev.r, prev.h,
                                        growth=1.3 * (1.2 ** attempt))
                        if self.treespec is not None:
                            # updates self.state's bucket_map in place —
                            # step from self.state, not the stale prev
                            self._plan_tree_buckets(np.asarray(prev.r),
                                                    grow_caps=True)
                        self._compile()
                        if self.use_block:
                            self.state, self._blocksched = self._step_fn(
                                self.state, prevB)
                        else:
                            self.state = self._step_fn(self.state)
                        if not bool(self.state.neib_overflow):
                            break
                    else:
                        raise RuntimeError(
                            "neighbour overflow persists after 4 replans")
        self.Nsteps += 1
        self.t = float(self.state.t)

    def _state_to_host(self) -> Dict[str, np.ndarray]:
        s = self.state
        return {k: np.asarray(getattr(s, k))
                for k in ("r", "v", "a", "m", "h", "rho", "u",
                          "pressure", "sound")}

    def _take_snapshot(self):
        self.snapshots.append(Snapshot(self.t, self._state_to_host(),
                                       self.ndim))
        self._enforce_snapshot_cache()



class MfvRungeKuttaSimulation(MfvMusclSimulation):
    """Heun (RK2) time integration of the meshless FV scheme
    (reference MfvRungeKuttaSimulation, src/MeshlessFV/
    MfvRungeKuttaSimulation.cpp + MfvRungeKutta.cpp:140-205): the flux pass
    averages the Riemann flux of the un-extrapolated face states with that
    of states advanced one full dt via the primitive time derivative."""

    time_scheme = "rk2"
