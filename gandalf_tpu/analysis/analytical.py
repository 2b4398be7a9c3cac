"""Analytical test solutions (analogue of analysis/analytical.py in the
reference): each class produces (x, y) arrays for named quantities at a
given simulation time, used by L1errornorm regression gates."""

from __future__ import annotations

from typing import Tuple

import numpy as np

from . import riemann


class AnalyticalSolution:
    def compute(self, xquantity: str, yquantity: str
                ) -> Tuple[np.ndarray, np.ndarray]:
        raise NotImplementedError


class ShocktubeSolution(AnalyticalSolution):
    """Exact Riemann solution for shocktube ICs
    (reference analysis/analytical.py:241-290)."""

    def __init__(self, sim, time: float):
        fp = sim.params.floatparams
        self.rho_l = fp["rhofluid1"]
        self.rho_r = fp["rhofluid2"]
        self.u_l = fp["vfluid1[0]"]
        self.u_r = fp["vfluid2[0]"]
        self.p_l = fp["press1"]
        self.p_r = fp["press2"]
        self.xl = fp["boxmin[0]"]
        self.xr = fp["boxmax[0]"]
        self.x0 = 0.5 * (self.xl + self.xr)
        self.time = time
        self.n = 16384
        if sim.params.stringparams["gas_eos"] == "isothermal":
            self.gamma = 1.0 + 1e-5
            cs2 = fp["temp0"] / fp["mu_bar"]
            self.p_l = self.rho_l * cs2
            self.p_r = self.rho_r * cs2
        else:
            self.gamma = fp["gamma_eos"]

    def compute(self, xquantity, yquantity):
        sol = riemann.shocktube_solution(
            self.rho_l, self.u_l, self.p_l,
            self.rho_r, self.u_r, self.p_r,
            self.gamma, self.xl, self.x0, self.xr, self.time, self.n)
        return sol[xquantity], sol[yquantity]


class SoundwaveSolution(AnalyticalSolution):
    """Travelling linear sound wave (reference analytical.py:295-340)."""

    def __init__(self, sim, time: float):
        fp = sim.params.floatparams
        self.rho0 = fp["rhofluid1"]
        self.press = fp["press1"]
        self.amp = fp["amp"]
        self.xl = fp["boxmin[0]"]
        self.xr = fp["boxmax[0]"]
        if sim.params.stringparams["gas_eos"] == "isothermal":
            self.csound = np.sqrt(fp["temp0"] / fp["mu_bar"])
        else:
            self.csound = np.sqrt(fp["gamma_eos"] * self.press / self.rho0)
        self.lam = self.xr - self.xl
        self.kwave = 2.0 * np.pi / self.lam
        self.omega = 2.0 * np.pi * self.csound / self.lam
        self.time = time

    def compute(self, xquantity, yquantity):
        x = np.linspace(self.xl, self.xr, 2000)
        phase = self.kwave * x - self.omega * self.time
        fields = {
            "x": x,
            "rho": self.rho0 * (1.0 + self.amp * np.sin(phase)),
            "vx": self.csound * self.amp * np.sin(phase),
            "ax": -self.csound ** 2 * self.kwave * self.rho0 * self.amp
            * np.cos(phase),
        }
        return fields[xquantity], fields[yquantity]


class FreefallSolution(AnalyticalSolution):
    """Homologous free-fall collapse of a uniform sphere
    (reference analysis/analytical.py freefall)."""

    def __init__(self, sim, time: float):
        fp = sim.params.floatparams
        self.radius = fp["radius"]
        self.mcloud = fp["mcloud"]
        self.time = time

    def compute(self, xquantity, yquantity):
        # fraction of initial radius vs time via the cycloid parameterisation
        tff = np.pi / 2.0 * np.sqrt(self.radius ** 3 / (2.0 * self.mcloud))
        tau = np.linspace(0.0, 0.999, 1000)
        # beta solves t/tff = (beta + 0.5 sin 2beta) * 2/pi
        beta = np.linspace(0.0, np.pi / 2.0, 4096)
        tfrac = (beta + 0.5 * np.sin(2.0 * beta)) * 2.0 / np.pi
        rfrac = np.cos(beta) ** 2
        return tfrac * tff, rfrac * self.radius


_REGISTRY = {
    "shocktube": ShocktubeSolution,
    "soundwave": SoundwaveSolution,
    "freefall": FreefallSolution,
}


def compute_analytical(ic_name: str, sim, time: float,
                       xquantity: str, yquantity: str):
    if ic_name not in _REGISTRY:
        raise ValueError(f"No analytical solution for ic {ic_name!r}")
    return _REGISTRY[ic_name](sim, time).compute(xquantity, yquantity)
