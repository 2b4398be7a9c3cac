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
        self.kern = kernel_factory(p.stringparams["kernel"], self.ndim)

    def _forces(self, s: NbodyState) -> NbodyState:
        if self.softening:
            g = direct_softened(s.r, s.v, s.m, s.h, self.kern,
                                compute_jerk=True)
        else:
            g = direct_nbody(s.r, s.v, s.m, compute_jerk=True)
        return s.replace(a=g.a, adot=g.adot, gpot=g.gpot)

    def _build_bootstrap(self):
        cfg = self.hermite

        def bootstrap(s: NbodyState) -> NbodyState:
            s = self._forces(s)
            s = s.replace(a0=s.a, adot0=s.adot, r0=s.r, v0=s.v,
                          a2dot=jnp.zeros_like(s.a),
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

        def step(s: NbodyState) -> NbodyState:
            dt = s.dt
            t = s.t + dt
            s = hermite.predict(s, dt)
            # P(EC)^n iteration (reference NbodySimulation::MainLoop :258-330)
            for _ in range(max(1, cfg.npec)):
                s = self._forces(s)
                s = hermite.correct(s, dt)
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
        with self.timing.block("MAIN_LOOP"):
            self.state = self._step_fn(self.state)
        self.Nsteps += 1
        self.t = float(self.state.t)
        # sub-system identification every nsystembuildstep steps
        # (NbodySimulation::MainLoop -> NbodySystemTree; detection feeds
        # diagnostics, internal regularised integration is a TODO)
        p = self.params
        if bool(p.intparams["sub_systems"]) \
                and self.Nsteps % max(p.intparams["nsystembuildstep"],
                                      1) == 0:
            from ..ops.systemtree import build_subsystems

            s = self.state
            self.subsystems = build_subsystems(
                np.asarray(s.r), np.asarray(s.v), np.asarray(s.m),
                np.asarray(s.gpot), Ncompmax=p.intparams["Ncompmax"]
                if "Ncompmax" in p.intparams else 4,
                gpefrac=p.floatparams["gpefrac"])

    def _state_to_host(self) -> Dict[str, np.ndarray]:
        s = self.state
        out = {k: np.asarray(getattr(s, k))
               for k in ("r", "v", "a", "m", "h", "gpot")}
        # hydro-compatible aliases so generic analysis code works
        out["rho"] = np.zeros(s.N)
        out["u"] = np.zeros(s.N)
        return out

    def _take_snapshot(self):
        self.snapshots.append(Snapshot(self.t, self._state_to_host(),
                                       self.ndim))

