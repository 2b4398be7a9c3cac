"""Pure N-body simulation controller.

Analogue of NbodySimulation (src/Nbody/NbodySimulation.cpp:183-330):
Hermite4 (or leapfrog) direct-summation N-body with P(EC)^n iteration,
global timestep first (block timesteps arrive with the scheduler milestone).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..integrate import hermite
from ..integrate.hermite import HermiteConfig
from ..kernels.smoothing import kernel_factory
from ..ops.gravity import direct_nbody, direct_softened
from ..params import Parameters
from ..state import NbodyState, make_nbody_state
from .ic import generate_nbody_ic
from .simulation import SimulationBase, Snapshot


class NbodySimulation(SimulationBase):
    def __init__(self, params: Parameters):
        super().__init__(params)
        self._step_fn = None

    def process_parameters(self):
        p = self.params
        self.hermite = HermiteConfig.from_params(p)
        self.scheme = p.stringparams["nbody"]
        self.softening = bool(p.intparams["nbody_softening"])
        self.kern = kernel_factory(p.stringparams["kernel"], self.ndim,
                                   p.intparams["tabulated_kernel"])
        # external analytic potential (applied with its jerk so the Hermite
        # corrector stays 4th-order; SphSimulation.cpp:806)
        self.extpot = p.stringparams["external_potential"]
        kgrav = p.intparams["kgrav"]
        self.extpot_cfg = {
            "mplummer": p.floatparams["mplummer"],
            "rplummer": p.floatparams["rplummer"],
            "kgrav": kgrav, "avert": p.floatparams["avert"],
            "rzero": 0.0,
        }

    def _forces(self, s: NbodyState) -> NbodyState:
        if self.softening:
            g = direct_softened(s.r, s.v, s.m, s.h, self.kern,
                                compute_jerk=True)
        else:
            g = direct_nbody(s.r, s.v, s.m, compute_jerk=True)
        a, adot, gpot = g.a, g.adot, g.gpot
        if self.extpot != "none":
            from ..ops.gravity import external_potential

            a_x, adot_x, pot_x = external_potential(
                self.extpot, self.extpot_cfg, s.r, s.v)
            a, adot, gpot = a + a_x, adot + adot_x, gpot + pot_x
        s = s.replace(a=a, adot=adot, gpot=gpot)
        if self.scheme == "hermite6ts":
            # second pass: direct snap from the updated accelerations
            # (NbodyHermite6TS's higher-derivative force evaluation)
            from ..ops.gravity import direct_snap

            s = s.replace(a2dot=direct_snap(s.r, s.v, s.a, s.m))
        return s

    def _build_bootstrap(self):
        cfg = self.hermite

        def bootstrap(s: NbodyState) -> NbodyState:
            s = self._forces(s)
            # _forces fills a2dot (snap) for hermite6ts; others start at 0
            a2dot = s.a2dot if self.scheme == "hermite6ts" \
                else jnp.zeros_like(s.a)
            s = s.replace(a0=s.a, adot0=s.adot, r0=s.r, v0=s.v,
                          a2dot=a2dot, a2dot0=a2dot,
                          a3dot=jnp.zeros_like(s.a))
            # startup timestep: accel-based only (a2dot/a3dot unknown yet,
            # reference CalculateAllStartupQuantities computes snap; the
            # accel fallback is conservative)
            amag = jnp.sqrt(jnp.sum(s.a * s.a, axis=-1))
            adotmag = jnp.sqrt(jnp.sum(s.adot * s.adot, axis=-1))
            dt = cfg.nbody_mult * jnp.min(amag / (adotmag + 1e-20))
            return s.replace(dt=dt)

        return bootstrap

    def _build_step(self):
        cfg = self.hermite
        scheme = self.scheme
        if scheme in ("hermite4ts", "hermite6ts"):
            # time-symmetric correctors need >= 2 P(EC)^n iterations to
            # realise their reversibility (reference default Npec)
            npec = max(2, cfg.npec)
        else:
            npec = max(1, cfg.npec)

        def step(s: NbodyState) -> NbodyState:
            dt = s.dt
            t = s.t + dt
            if scheme in ("lfkdk", "lfdkd"):
                # velocity-Verlet leapfrog (NbodyLeapfrogKDK.cpp)
                v_half = s.v0 + 0.5 * dt * s.a0
                r = s.r0 + dt * v_half
                s = s.replace(r=r, v=v_half)
                s = self._forces(s)
                s = s.replace(v=s.v + 0.5 * dt * s.a)
                s = hermite.end_timestep(s)
                amag = jnp.sqrt(jnp.sum(s.a * s.a, axis=-1))
                dt_next = cfg.nbody_mult * jnp.min(
                    jnp.sqrt(s.h / (amag + 1e-20)))
                return s.replace(t=t, dt=dt_next, nstep=s.nstep + 1)
            if scheme == "hermite6ts":
                s = hermite.predict_ts6(s, dt)
                corr = hermite.correct_ts6
            elif scheme == "hermite4ts":
                s = hermite.predict(s, dt)
                corr = hermite.correct_ts4
            else:
                s = hermite.predict(s, dt)
                corr = hermite.correct
            # P(EC)^n iteration (reference NbodySimulation::MainLoop :258-330)
            for _ in range(npec):
                s = self._forces(s)
                s = corr(s, dt)
            s = hermite.end_timestep(s)
            dt_next = jnp.min(hermite.aarseth_timestep(cfg, s))
            return s.replace(t=t, dt=dt_next, nstep=s.nstep + 1)

        return step

    def SetupSimulation(self):
        with self.timing.block("SETUP"):
            self.process_parameters()
            ic = generate_nbody_ic(self.params)
            self.state = make_nbody_state(ic["r"], ic["v"], ic["m"], ic["h"])
            self._step_fn = jax.jit(self._build_step())
            self._bootstrap_fn = jax.jit(self._build_bootstrap())
            self.state = self._bootstrap_fn(self.state)
        self._init_output_cadence()

    def main_loop_step(self):
        p = self.params
        use_sys = bool(p.intparams["sub_systems"])
        # sub-system (re)identification every nsystembuildstep steps
        # (NbodySimulation::MainLoop -> NbodySystemTree :264-300)
        if use_sys and self.Nsteps % max(p.intparams["nsystembuildstep"],
                                         1) == 0:
            self._rebuild_subsystems()
        # Global-dt clamp (reference ComputeGlobalTimestep bounds dt by
        # the snapshot/end times, Simulation.cpp:1668-1754).  Also guards
        # the degenerate all-in-one-system case: every star collapsed to
        # a single COM has zero global accel/jerk, so the Aarseth
        # criterion returns 0/0 -> inf.
        t_now = float(self.state.t)
        tend = self.params.floatparams["tend"]
        cap = max(tend - t_now, 1e-30)
        tsnap = getattr(self, "tsnapnext", None)
        if tsnap is not None and tsnap > t_now:
            cap = min(cap, tsnap - t_now)
        dt_glob = float(self.state.dt)
        if not np.isfinite(dt_glob) or dt_glob <= 0.0 or dt_glob > cap:
            dt_glob = cap
            self.state = self.state.replace(
                dt=jnp.asarray(dt_glob, np.asarray(self.state.dt).dtype))
        traj0 = None
        if getattr(self, "_sys_rel", None):
            # start-of-step Hermite derivatives: the cubic trajectories
            # the internal integration predicts perturbers/COMs along
            # (reference perturber prediction, NbodySystemTree.cpp:
            # 256-420; r0/v0/a0/adot0 hold start-of-step values here)
            s0 = self.state
            traj0 = tuple(np.array(np.asarray(x))
                          for x in (s0.r0, s0.v0, s0.a0, s0.adot0))
        with self.timing.block("MAIN_LOOP"):
            self.state = self._step_fn(self.state)
        if getattr(self, "_sys_rel", None):
            with self.timing.block("SUBSYSTEMS"):
                self._integrate_subsystems(dt_glob, traj0)
        self.Nsteps += 1
        self.t = float(self.state.t)

    # -- sub-systems (SystemParticle internal integration) -------------------
    def _absolute_state(self):
        """Member-slot absolute coordinates (collapsed COM + internal
        offsets) as numpy arrays."""
        r = np.array(np.asarray(self.state.r))
        v = np.array(np.asarray(self.state.v))
        for members, (rel_r, rel_v) in getattr(self, "_sys_rel",
                                               {}).items():
            idx = list(members)
            r[idx] = r[idx] + rel_r
            v[idx] = v[idx] + rel_v
        return r, v

    def _rebuild_subsystems(self):
        """Detect bound sub-systems on ABSOLUTE coordinates and collapse
        their members onto the COM for the global integration
        (NbodySystemTree::BuildSubSystems; the collapsed members exert the
        correct monopole force on outsiders because coincident pairs are
        masked in the direct sums)."""
        from ..ops.systemtree import build_subsystems

        p = self.params
        r_abs, v_abs = self._absolute_state()
        s = self.state
        m = np.asarray(s.m)
        self.subsystems = build_subsystems(
            r_abs, v_abs, m, np.asarray(s.gpot),
            Ncompmax=p.intparams.get("Ncompmax", 4),
            gpefrac=p.floatparams["gpefrac"])
        self._sys_rel = {}
        self._sys_children = {}
        r_new, v_new = r_abs.copy(), v_abs.copy()
        for sub in self.subsystems:
            idx = list(sub.members)
            mm = m[idx]
            M = mm.sum()
            r_com = (mm[:, None] * r_abs[idx]).sum(0) / M
            v_com = (mm[:, None] * v_abs[idx]).sum(0) / M
            rel_r = r_abs[idx] - r_com
            rel_v = v_abs[idx] - v_com
            self._sys_rel[sub.members] = (rel_r, rel_v)
            r_new[idx] = r_com
            v_new[idx] = v_com
            if sub.n >= 3:
                kids = self._detect_nested(rel_r, rel_v, mm)
                if kids:
                    self._sys_children[sub.members] = kids
        st = s.replace(r=jnp.asarray(r_new), v=jnp.asarray(v_new),
                       r0=jnp.asarray(r_new), v0=jnp.asarray(v_new))
        # refresh forces/derivatives/dt coherently for the new layout
        self.state = self._bootstrap_fn(st)

    @staticmethod
    def _detect_nested(rel_r, rel_v, mm):
        """Nested sub-systems inside one system (the reference allows a
        SystemParticle as a member of another system,
        NbodySystemTree.cpp:256-420): greedily accept disjoint BOUND
        tight pairs whose separation is well inside the distance to the
        rest of the system.  Returns a list of local index pairs."""
        n = len(mm)
        dr = rel_r[:, None, :] - rel_r[None, :, :]
        d = np.sqrt((dr ** 2).sum(-1))
        np.fill_diagonal(d, np.inf)
        pairs = sorted(((d[i, j], i, j) for i in range(n)
                        for j in range(i + 1, n)), key=lambda t: t[0])
        kids, used = [], set()
        for d_p, i, j in pairs:
            if i in used or j in used:
                continue
            rest = [k for k in range(n) if k not in (i, j)]
            if not rest:
                break
            d_other = min(min(d[i, k], d[j, k]) for k in rest)
            mu = mm[i] + mm[j]
            eps = (0.5 * ((rel_v[i] - rel_v[j]) ** 2).sum()
                   - mu / max(d_p, 1e-300))
            # tight (hierarchy margin 4x) + bound
            if eps < 0.0 and d_other > 4.0 * d_p:
                kids.append((i, j))
                used.update((i, j))
        # at least two outer nodes must remain or the outer integration
        # is the pair itself
        if kids and (n - 2 * len(kids) + len(kids)) < 2:
            return []
        return kids

    def _integrate_subsystems(self, dt_glob: float, traj0=None):
        """Advance each sub-system's INTERNAL motion over the global step
        (Nbody::IntegrateInternalMotion, Nbody.cpp:481-720): COM moved by
        the global Hermite step; members orbit in the COM frame with
        perturber tidal forces from the other (collapsed) particles,
        PREDICTED along their cubic Hermite trajectories when `traj0`
        (start-of-step r0/v0/a0/adot0) is given.  Nested sub-systems
        (NbodySystemTree.cpp:256-420) integrate hierarchically: inner
        tight pairs are collapsed to point-mass nodes for the outer
        integration, then each pair's own internal motion is advanced
        with the other nodes as perturbers."""
        from ..ops.systemtree import integrate_internal_motion

        s = self.state
        r_glob = np.asarray(s.r)
        m = np.asarray(s.m)
        nm = self.hermite.nbody_mult
        for members, (rel_r, rel_v) in list(self._sys_rel.items()):
            idx = list(members)
            others = np.asarray([i for i in range(s.N)
                                 if i not in members])
            r_com = r_glob[idx[0]]
            pert_traj = com_traj = None
            if traj0 is not None:
                if len(others):
                    pert_traj = tuple(arr[others] for arr in traj0)
                com_traj = tuple(arr[idx[0]] for arr in traj0)
            kids = getattr(self, "_sys_children", {}).get(members, [])
            mm = m[idx]
            if not kids:
                rel_r, rel_v = integrate_internal_motion(
                    rel_r, rel_v, mm, dt_glob, nbody_mult=nm,
                    r_com=r_com,
                    r_pert=r_glob[others] if len(others) else None,
                    m_pert=m[others] if len(others) else None,
                    pert_traj=pert_traj, com_traj=com_traj)
                self._sys_rel[members] = (rel_r, rel_v)
                continue
            # -- hierarchical: outer node integration -----------------------
            in_kid = {k for pair in kids for k in pair}
            rest = [k for k in range(len(idx)) if k not in in_kid]
            node_r = [rel_r[rest]] if rest else []
            node_v = [rel_v[rest]] if rest else []
            node_m = [mm[rest]] if rest else []
            kid_off = []        # child COM node index + internal offsets
            for (i, j) in kids:
                mc = mm[i] + mm[j]
                r_c = (mm[i] * rel_r[i] + mm[j] * rel_r[j]) / mc
                v_c = (mm[i] * rel_v[i] + mm[j] * rel_v[j]) / mc
                kid_off.append((np.stack([rel_r[i] - r_c,
                                          rel_r[j] - r_c]),
                                np.stack([rel_v[i] - v_c,
                                          rel_v[j] - v_c])))
                node_r.append(r_c[None])
                node_v.append(v_c[None])
                node_m.append(np.array([mc]))
            node_r = np.concatenate(node_r)
            node_v = np.concatenate(node_v)
            node_m = np.concatenate(node_m)
            node_r, node_v = integrate_internal_motion(
                node_r, node_v, node_m, dt_glob, nbody_mult=nm,
                r_com=r_com,
                r_pert=r_glob[others] if len(others) else None,
                m_pert=m[others] if len(others) else None,
                pert_traj=pert_traj, com_traj=com_traj)
            # -- inner pairs about their end-of-step nodes -------------------
            new_r, new_v = rel_r.copy(), rel_v.copy()
            if rest:
                new_r[rest] = node_r[:len(rest)]
                new_v[rest] = node_v[:len(rest)]
            for kk, (i, j) in enumerate(kids):
                nd = len(rest) + kk
                pr, pv = kid_off[kk]
                # perturbers: the other outer nodes (end-of-step, in
                # absolute coordinates) + external global perturbers
                o_nodes = [q for q in range(len(node_m)) if q != nd]
                rp = r_com + node_r[o_nodes]
                mp = node_m[o_nodes]
                if len(others):
                    rp = np.concatenate([rp, r_glob[others]])
                    mp = np.concatenate([mp, m[others]])
                pr, pv = integrate_internal_motion(
                    pr, pv, mm[[i, j]], dt_glob, nbody_mult=nm,
                    r_com=r_com + node_r[nd],
                    r_pert=rp if len(rp) else None,
                    m_pert=mp if len(mp) else None)
                new_r[[i, j]] = node_r[nd] + pr
                new_v[[i, j]] = node_v[nd] + pv
            self._sys_rel[members] = (new_r, new_v)

    def _state_to_host(self) -> Dict[str, np.ndarray]:
        s = self.state
        out = {k: np.asarray(getattr(s, k))
               for k in ("r", "v", "a", "m", "h", "gpot")}
        if getattr(self, "_sys_rel", None):
            out["r"], out["v"] = self._absolute_state()
        # hydro-compatible aliases so generic analysis code works
        out["rho"] = np.zeros(s.N)
        out["u"] = np.zeros(s.N)
        return out

    def _take_snapshot(self):
        self.snapshots.append(Snapshot(self.t, self._state_to_host(),
                                       self.ndim))
        self._enforce_snapshot_cache()

