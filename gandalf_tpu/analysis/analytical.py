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


class GreshoSolution(AnalyticalSolution):
    """Gresho-Chan vortex steady state (reference analytical.py:89-128):
    triangular azimuthal velocity profile with the balancing pressure."""

    def __init__(self, sim, time: float):
        fp = sim.params.floatparams
        self.rmax = fp["boxmax[0]"] - fp["boxmin[0]"]

    def compute(self, xquantity, yquantity):
        R = np.linspace(0.0, self.rmax, 2000)
        vphi = np.where(R < 0.2, 5.0 * R,
                        np.where(R < 0.4, 2.0 - 5.0 * R, 0.0))
        press = np.where(
            R < 0.2, 5.0 + 12.5 * R * R,
            np.where(R < 0.4,
                     9.0 + 12.5 * R * R - 20.0 * R
                     + 4.0 * np.log10(np.maximum(R, 1e-30) / 0.2),
                     3.0 + 4.0 * np.log10(2.0)))
        fields = {"R": R, "vphi": vphi, "press": press, "pressure": press}
        return fields[xquantity], fields[yquantity]


class JeansSolution(AnalyticalSolution):
    """Linear Jeans instability of a 1D sinusoidal perturbation in a
    self-gravitating gas (reference analytical.py:132-199): oscillation for
    lambda < lambda_J, exponential growth for lambda > lambda_J."""

    def __init__(self, sim, time: float):
        fp = sim.params.floatparams
        self.rho0 = fp["rhofluid1"]
        self.amp = fp["amp"]
        self.xl = fp["boxmin[0]"]
        self.xr = fp["boxmax[0]"]
        self.time = time
        if sim.params.stringparams["gas_eos"] == "isothermal":
            cs = np.sqrt(fp["temp0"] / fp["mu_bar"])
        else:
            cs = np.sqrt(fp["gamma_eos"] * fp["press1"] / self.rho0)
        self.kwave = 2.0 * np.pi / (self.xr - self.xl)
        lam = self.xr - self.xl
        # Jeans length with G = 1: lambda_J = cs * sqrt(pi / rho)
        self.lam_jeans = cs * np.sqrt(np.pi / self.rho0)
        self.stable = lam < self.lam_jeans
        self.omega = 2.0 * np.pi * cs * np.sqrt(abs(
            1.0 / lam ** 2 - 1.0 / self.lam_jeans ** 2))

    def compute(self, xquantity, yquantity):
        x = np.linspace(self.xl, self.xr, 2000)
        kx = self.kwave * x
        w, t, a = self.omega, self.time, self.amp
        if self.stable:
            rho = self.rho0 * (1.0 + a * np.sin(kx) * np.cos(w * t))
            vx = -a * w / self.kwave * np.cos(kx) * np.sin(w * t)
            ax = -a * w * w / self.kwave * np.cos(kx) * np.cos(w * t)
        else:
            rho = self.rho0 * (1.0 + a * np.sin(kx) * np.cosh(w * t))
            vx = a * w / self.kwave * np.cos(kx) * np.sinh(w * t)
            ax = a * w * w / self.kwave * np.cos(kx) * np.cosh(w * t)
        fields = {"x": x, "rho": rho, "vx": vx, "ax": ax}
        return fields[xquantity], fields[yquantity]


class NohSolution(AnalyticalSolution):
    """Noh spherical-implosion similarity solution in 1/2/3D
    (reference analytical.py:203-237): an infinite-strength shock at
    r = t/3 with compression 4^ndim and an upstream density boosted by
    spherical convergence."""

    def __init__(self, sim, time: float):
        fp = sim.params.floatparams
        self.radius = fp["radius"]
        self.rho0 = fp["rhofluid1"]
        self.ndim = sim.ndim
        self.time = time

    def compute(self, xquantity, yquantity):
        r = np.linspace(1e-6, self.radius, 2000)
        rho = np.full_like(r, self.rho0)
        vr = np.zeros_like(r)
        if self.time > 0.0:
            rs = self.time / 3.0
            inside = r < rs
            rho = np.where(inside,
                           self.rho0 * 4.0 ** self.ndim,
                           self.rho0 * (1.0 + self.time / r)
                           ** (self.ndim - 1))
            vr = np.where(inside, 0.0, -1.0)
        fields = {"R": r, "x": r, "rho": rho, "vr": vr}
        return fields[xquantity], fields[yquantity]


class SedovSolution(AnalyticalSolution):
    """Sedov-Taylor point-explosion similarity solution (exact parametric
    form; reference analytical.py:340-555 implements the same solution via
    the Sedov (1959) parametric integrals).

    The interior profile uses the standard closed-form parametrisation in
    the velocity variable V (see Landau & Lifshitz §106 / Kamm 2000):
    each of r/R_s, rho/rho2, p/p2 is a product of powers of functions of V.
    """

    def __init__(self, sim, time: float, E: float = None, rho0: float = None,
                 gamma: float = None):
        fp = sim.params.floatparams if sim is not None else {}
        self.ndim = sim.ndim if sim is not None else 3
        self.E = E if E is not None else 1.0
        self.rho0 = rho0 if rho0 is not None else fp.get("rhofluid1", 1.0)
        self.gamma = gamma if gamma is not None else fp.get("gamma_eos", 1.4)
        self.time = max(time, 1e-30)

    def _profiles(self):
        g = self.gamma
        nu = self.ndim
        # similarity exponents (standard energy-conserving blast)
        # V ranges over [1/g, 2/(nu+2)/ ... ]: parametric interior solution
        Vmin = 2.0 / ((nu + 2.0) * g)
        Vmax = 4.0 / ((nu + 2.0) * (g + 1.0))
        V = np.linspace(Vmin * (1 + 1e-9), Vmax, 4000)
        a = (nu + 2.0) * (g + 1.0) / 4.0
        b = (g + 1.0) / (g - 1.0)
        c = (nu + 2.0) * g / 2.0
        d = (nu + 2.0) * (g + 1.0) \
            / ((nu + 2.0) * (g + 1.0) - 2.0 * (2.0 + nu * (g - 1.0)))
        e = (2.0 + nu * (g - 1.0)) / 2.0
        # exponents (Kamm 2000 eq. 32-36 family)
        a0 = 2.0 / (nu + 2.0)
        a2 = -(g - 1.0) / (2.0 * (g - 1.0) + nu)
        a1 = (nu + 2.0) * g / (2.0 + nu * (g - 1.0)) \
            * (2.0 * nu * (2.0 - g) / (g * (nu + 2.0) ** 2) - a2)
        a3 = nu / (2.0 * (g - 1.0) + nu)
        a4 = a1 * (nu + 2.0) / (2.0 - g)
        a5 = 2.0 / (g - 2.0)
        x1 = a * V
        x2 = np.maximum(b * (c * V - 1.0), 1e-30)
        x3 = np.maximum(d * (1.0 - e * V), 1e-30)
        x4 = np.maximum(b * (1.0 - c / g * V), 1e-30)
        # uniform-ambient (omega = 0) standard-case similarity profiles
        r_over_rs = x1 ** -a0 * x2 ** -a2 * x3 ** -a1
        rho_over_rho2 = x2 ** a3 * x3 ** a4 * x4 ** a5
        p_over_p2 = x1 ** (a0 * nu) * x3 ** (a4 - 2.0 * a1) \
            * x4 ** (1.0 + a5)
        v_over_v2 = x1 * r_over_rs
        return r_over_rs, rho_over_rho2, p_over_p2, v_over_v2

    def _alpha(self):
        """Dimensionless energy integral: since E_int(alpha) scales as
        1/alpha, evaluating the integral with alpha = 1 yields alpha
        directly (self-consistent for any gamma/ndim)."""
        g, nu = self.gamma, self.ndim
        rr, rhor, pr, vr = self._profiles()
        # alpha=1, t=1, E=1, rho0=1 scales
        R_s = 1.0
        U_s = 2.0 / (nu + 2.0)
        rho2 = (g + 1.0) / (g - 1.0)
        p2 = 2.0 * U_s ** 2 / (g + 1.0)
        v2 = 2.0 * U_s / (g + 1.0)
        r = rr * R_s
        surf = {1: 2.0, 2: 2.0 * np.pi, 3: 4.0 * np.pi}[nu]
        integrand = (0.5 * rhor * rho2 * (vr * v2) ** 2
                     + pr * p2 / (g - 1.0)) * surf * r ** (nu - 1)
        order = np.argsort(r)
        return float(np.trapezoid(integrand[order], r[order]))

    def compute(self, xquantity, yquantity):
        g, nu, t = self.gamma, self.ndim, self.time
        alpha = self._alpha()
        R_s = (self.E / (alpha * self.rho0)) ** (1.0 / (nu + 2.0)) \
            * t ** (2.0 / (nu + 2.0))
        U_s = 2.0 / (nu + 2.0) * R_s / t
        rho2 = self.rho0 * (g + 1.0) / (g - 1.0)
        p2 = 2.0 * self.rho0 * U_s ** 2 / (g + 1.0)
        v2 = 2.0 * U_s / (g + 1.0)
        rr, rhor, pr, vr = self._profiles()
        r = rr * R_s
        fields = {
            "R": r, "x": r,
            "rho": rhor * rho2,
            "pressure": pr * p2,
            "press": pr * p2,
            "vr": vr * v2,
        }
        x, y = fields[xquantity], fields[yquantity]
        order = np.argsort(x)
        return x[order], y[order]


class DustyboxSolution(AnalyticalSolution):
    """DUSTYBOX drag relaxation: two uniform interpenetrating fluids with
    constant drag coefficient relax exponentially to the barycentric
    velocity (Laibe & Price 2011 test)."""

    def __init__(self, sim, time: float):
        fp = sim.params.floatparams
        self.time = time
        self.vgas0 = fp["vfluid1[0]"]
        self.vdust0 = fp["vfluid2[0]"]
        self.rho_g = fp["rhofluid1"]
        self.eps = fp["dust_mass_factor"]
        self.K = fp["drag_coeff"]

    def compute(self, xquantity, yquantity):
        t = np.linspace(0.0, max(self.time, 1e-12), 500)
        rho_d = self.eps * self.rho_g
        vcom = (self.rho_g * self.vgas0 + rho_d * self.vdust0) \
            / (self.rho_g + rho_d)
        dv0 = self.vgas0 - self.vdust0
        lam = self.K * (self.rho_g + rho_d) / (self.rho_g * rho_d) \
            if rho_d > 0 else self.K
        dv = dv0 * np.exp(-lam * t)
        vg = vcom + dv * rho_d / (self.rho_g + rho_d)
        vd = vcom - dv * self.rho_g / (self.rho_g + rho_d)
        fields = {"t": t, "vx_gas": vg, "vx_dust": vd, "vx": vg}
        return fields[xquantity], fields[yquantity]


_REGISTRY = {
    "shocktube": ShocktubeSolution,
    "soundwave": SoundwaveSolution,
    "freefall": FreefallSolution,
    "gresho": GreshoSolution,
    "jeans": JeansSolution,
    "noh": NohSolution,
    "sedov": SedovSolution,
    "dustybox": DustyboxSolution,
}


def compute_analytical(ic_name: str, sim, time: float,
                       xquantity: str, yquantity: str):
    if ic_name not in _REGISTRY:
        raise ValueError(f"No analytical solution for ic {ic_name!r}")
    return _REGISTRY[ic_name](sim, time).compute(xquantity, yquantity)
