"""Equation-of-state family.

Functional, array-in/array-out analogue of the reference EOS class hierarchy
(src/Headers/EOS.h:53-518, src/Thermal/*.cpp).  Every EOS maps the particle
thermodynamic state (rho, u, r, ...) to (u, pressure, sound-speed, temperature)
vectors; the grad-h SPH driver calls :meth:`EOS.thermal_update` after each
density pass (reference GradhSph::ComputeThermalProperties).

All EOS work in dimensionless internal units; gamma conventions match the
reference: ``pressure = (gamma-1)*rho*u`` (EOS.h:156).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class EOS:
    """Base EOS: perfect-gas relations parameterised by gamma."""

    gamma: float
    mu_bar: float = 1.0

    @property
    def gammam1(self) -> float:
        return self.gamma - 1.0

    # -- interface ----------------------------------------------------------
    def specific_internal_energy(self, rho: Array, u: Array,
                                 r: Optional[Array] = None) -> Array:
        raise NotImplementedError

    def pressure(self, rho: Array, u: Array) -> Array:
        return self.gammam1 * rho * u

    def sound_speed(self, rho: Array, u: Array) -> Array:
        raise NotImplementedError

    def temperature(self, rho: Array, u: Array) -> Array:
        return self.gammam1 * u

    def entropic_function(self, rho: Array, u: Array) -> Array:
        """P / rho^gamma (src/Thermal/AdiabaticEOS.cpp EntropicFunction)."""
        return self.gammam1 * u * rho ** (1.0 - self.gamma)

    def internal_energy_from_pressure(self, rho: Array, p: Array) -> Array:
        return p / (self.gammam1 * rho)

    # wrapper EOSes (IonisingRadiation / MCRadiation) blend the base state
    # with the ionisation fraction; callers check this flag to thread
    # `ionfrac` through the (possibly densified) thermal update
    needs_ionfrac: bool = False

    def thermal_update(self, rho: Array, u: Array,
                       r: Optional[Array] = None,
                       ionfrac: Optional[Array] = None):
        """Return (u, pressure, sound) after a density update."""
        u_new = self.specific_internal_energy(rho, u, r)
        return u_new, self.pressure(rho, u_new), self.sound_speed(rho, u_new)


@dataclasses.dataclass(frozen=True)
class Adiabatic(EOS):
    """'energy_eqn': u evolves; c = sqrt(gamma*(gamma-1)*u)."""

    def specific_internal_energy(self, rho, u, r=None):
        return u

    def sound_speed(self, rho, u):
        return jnp.sqrt(self.gamma * self.gammam1 * u)


@dataclasses.dataclass(frozen=True)
class Isothermal(EOS):
    """Fixed temperature: u = temp0/(gamma-1)/mu_bar, c = sqrt((gamma-1) u)."""

    temp0: float = 1.0

    def specific_internal_energy(self, rho, u, r=None):
        return jnp.full_like(rho, self.temp0 / self.gammam1 / self.mu_bar)

    def sound_speed(self, rho, u):
        return jnp.sqrt(self.gammam1 * u)

    def temperature(self, rho, u):
        return jnp.full_like(rho, self.temp0)


@dataclasses.dataclass(frozen=True)
class Barotropic(EOS):
    """Barotropic EOS (src/Thermal/BarotropicEOS.cpp): isothermal at low
    density, adiabatic above rho_bary."""

    temp0: float = 1.0
    rho_bary: float = 1.0e-14

    def specific_internal_energy(self, rho, u, r=None):
        return (self.temp0 * (1.0 + (rho / self.rho_bary) ** self.gammam1)
                / self.gammam1 / self.mu_bar)

    def sound_speed(self, rho, u):
        return jnp.sqrt(self.gammam1 * u)

    def temperature(self, rho, u):
        return self.temp0 * (1.0 + (rho / self.rho_bary) ** self.gammam1)


@dataclasses.dataclass(frozen=True)
class Polytropic(EOS):
    """P = K rho^eta (src/Thermal/PolytropicEOS.cpp)."""

    Kpoly: float = 1.0
    eta: float = 1.4

    def specific_internal_energy(self, rho, u, r=None):
        return self.Kpoly * rho ** (self.eta - 1.0) / self.gammam1

    def pressure(self, rho, u):
        return self.Kpoly * rho ** self.eta

    def sound_speed(self, rho, u):
        return jnp.sqrt(self.gammam1 * u)


@dataclasses.dataclass(frozen=True, eq=False)
class LocallyIsothermal(EOS):
    """T = max(temp0 d_star^-templaw, tempmin) with d_star the distance to
    the nearest star (src/Thermal/LocallyIsothermal.cpp:33-95).  The
    controller sets `star_r` ((Ns, ndim) array) at setup; with no stars
    the origin is used."""

    temp0: float = 1.0
    templaw: float = 1.0
    tempmin: float = 0.0
    star_r: object = None

    def _temp(self, r):
        if r is None:
            raise ValueError("locally-isothermal EOS needs positions")
        stars = self.star_r if self.star_r is not None             else jnp.zeros((1, r.shape[1]))
        d2 = jnp.sum((r[:, None, :] - stars[None, :, :]) ** 2, -1)
        d = jnp.sqrt(jnp.min(d2, axis=1))
        return jnp.maximum(self.temp0 * jnp.maximum(d, 1e-30)
                           ** (-self.templaw), self.tempmin)

    def specific_internal_energy(self, rho, u, r=None):
        return self._temp(r) / self.gammam1 / self.mu_bar

    def sound_speed(self, rho, u):
        return jnp.sqrt(self.gammam1 * u)

    def thermal_update(self, rho, u, r=None, ionfrac=None):
        u_new = self.specific_internal_energy(rho, u, r)
        return u_new, self.pressure(rho, u_new), self.sound_speed(rho, u_new)


@dataclasses.dataclass(frozen=True, eq=False)
class DiscLocallyIsothermal(EOS):
    """Disc temperature profile cs = norm (d/rin)^-slope around star 0
    (src/Thermal/DiscLocallyIsothermal.cpp:42-105)."""

    slope: float = 0.25
    norm: float = 0.05
    rin: float = 1.0
    star_r: object = None

    def _cs(self, r):
        if r is None:
            raise ValueError("disc-locally-isothermal EOS needs positions")
        star = self.star_r[0] if self.star_r is not None             else jnp.zeros((r.shape[1],))
        d = jnp.sqrt(jnp.sum((r - star[None, :]) ** 2, -1))
        return self.norm * jnp.maximum(d / self.rin, 1e-30) ** (-self.slope)

    def specific_internal_energy(self, rho, u, r=None):
        cs = self._cs(r)
        return cs * cs / self.gammam1

    def sound_speed(self, rho, u):
        return jnp.sqrt(self.gammam1 * u)

    def thermal_update(self, rho, u, r=None, ionfrac=None):
        u_new = self.specific_internal_energy(rho, u, r)
        return u_new, self.pressure(rho, u_new), self.sound_speed(rho, u_new)


@dataclasses.dataclass(frozen=True, eq=False)
class Radws(EOS):
    """Opacity-table EOS with variable gamma (src/Thermal/RadwsEOS.cpp):
    P = (gamma(rho,T) - 1) rho u, c = sqrt(gamma (gamma-1) u)."""

    table: object = None

    def _gamma_of(self, rho, u):
        from .radws import idens_of, itemp_of, temp_from_u

        t = self.table
        idens = idens_of(t, rho)
        temp = temp_from_u(t, rho, u)
        return t.gamma[idens, itemp_of(t, temp)]

    def specific_internal_energy(self, rho, u, r=None):
        return u

    def pressure(self, rho, u):
        return (self._gamma_of(rho, u) - 1.0) * rho * u

    def sound_speed(self, rho, u):
        g = self._gamma_of(rho, u)
        return jnp.sqrt(g * (g - 1.0) * u)

    def thermal_update(self, rho, u, r=None, ionfrac=None):
        g = self._gamma_of(rho, u)
        return u, (g - 1.0) * rho * u, jnp.sqrt(g * (g - 1.0) * u)


@dataclasses.dataclass(frozen=True, eq=False)
class IonisingRadiationEOS(EOS):
    """Wrapper EOS for photoionised gas (reference IonisingRadiation,
    src/Thermal/IonisingRadiationEOS.cpp:96-121): ionised particles keep
    their (radiatively heated) u when it exceeds the base EOS value —
    preventing e.g. an isothermal base from resetting the HII region's
    temperature every density pass."""

    base: object = None

    def thermal_update(self, rho, u, r=None, ionfrac=None):
        u_b, p_b, c_b = self.base.thermal_update(rho, u, r)
        if ionfrac is None:
            return u_b, p_b, c_b
        ionised = ionfrac > 0.5
        u_new = jnp.where(ionised, jnp.maximum(u, u_b), u_b)
        return (u_new, self.base.pressure(rho, u_new),
                self.base.sound_speed(rho, u_new))

    def specific_internal_energy(self, rho, u, r=None):
        return self.base.specific_internal_energy(rho, u, r)

    def sound_speed(self, rho, u):
        return self.base.sound_speed(rho, u)


@dataclasses.dataclass(frozen=True, eq=False)
class MCRadiationEOS(EOS):
    """Ionisation-fraction-blended EOS (reference MCRadiationEOS,
    src/Thermal/MCRadiationEOS.cpp): u = f u_ion + (1-f) u_base with
    u_ion = temp_ion/(gamma-1)/mu_ion."""

    base: object = None
    temp_ion: float = 1.0e4
    mu_ion: float = 0.678

    def thermal_update(self, rho, u, r=None, ionfrac=None):
        u_b, p_b, c_b = self.base.thermal_update(rho, u, r)
        if ionfrac is None:
            return u_b, p_b, c_b
        u_ion = self.temp_ion / self.gammam1 / self.mu_ion
        u_new = ionfrac * u_ion + (1.0 - ionfrac) * u_b
        return (u_new, self.base.pressure(rho, u_new),
                self.base.sound_speed(rho, u_new))

    def specific_internal_energy(self, rho, u, r=None):
        return self.base.specific_internal_energy(rho, u, r)

    def sound_speed(self, rho, u):
        return self.base.sound_speed(rho, u)


def eos_factory(params) -> EOS:
    """Build an EOS from a Parameters object, keyed by `gas_eos`
    (reference factory in src/Thermal/EOS.cpp / Simulation::ProcessParameters)."""
    name = params.stringparams["gas_eos"]
    gamma = params.floatparams["gamma_eos"]
    mu_bar = params.floatparams["mu_bar"]
    temp0 = params.floatparams["temp0"]
    radiation = params.stringparams["radiation"]
    if radiation in ("ionisation", "monoionisation", "treeray") \
            and name in (
            "energy_eqn", "constant_temp", "isothermal", "polytropic",
            "barotropic", "barotropic2"):
        # wrap the base EOS with the ionisation blend
        # (Hydrodynamics.cpp:81-90)
        import copy

        inner = copy.copy(params)
        inner.stringparams = dict(params.stringparams)
        inner.stringparams["radiation"] = "none"
        base = eos_factory(inner)
        if radiation in ("ionisation", "treeray"):
            return IonisingRadiationEOS(gamma=gamma, mu_bar=mu_bar,
                                        needs_ionfrac=True, base=base)
        return MCRadiationEOS(gamma=gamma, mu_bar=mu_bar,
                              needs_ionfrac=True, base=base,
                              temp_ion=params.floatparams["temp_ion"],
                              mu_ion=params.floatparams["mu_ion"])
    if name in ("energy_eqn", "constant_temp"):
        return Adiabatic(gamma=gamma, mu_bar=mu_bar)
    if name == "radws":
        import os

        from .radws import make_ideal_table, read_opacity_table

        path = params.stringparams["radws_table"]
        temp_amb = params.floatparams["temp_ambient"]
        if os.path.exists(path):
            table = read_opacity_table(path, temp_ambient=temp_amb)
        else:
            print(f"WARNING: radws_table {path!r} not found; using a "
                  "synthetic ideal-gas/constant-opacity table")
            table = make_ideal_table(gamma=gamma, mu_bar=mu_bar,
                                     temp_ambient=temp_amb)
        return Radws(gamma=gamma, mu_bar=mu_bar, table=table)
    if name == "isothermal":
        return Isothermal(gamma=gamma, mu_bar=mu_bar, temp0=temp0)
    if name == "barotropic":
        return Barotropic(gamma=gamma, mu_bar=mu_bar, temp0=temp0,
                          rho_bary=params.floatparams["rho_bary"])
    if name in ("locally_isothermal", "local_isothermal"):
        return LocallyIsothermal(
            gamma=gamma, mu_bar=mu_bar, temp0=temp0,
            templaw=params.floatparams["templaw"],
            tempmin=params.floatparams["tempmin"])
    if name == "disc_locally_isothermal":
        import math

        return DiscLocallyIsothermal(
            gamma=gamma, mu_bar=mu_bar,
            slope=params.floatparams["DiscIcQ"],
            norm=params.floatparams["DiscIcHr"]
            * math.sqrt(1.0 / params.floatparams["DiscIcRin"]),
            rin=params.floatparams["DiscIcRin"])
    if name == "polytropic":
        return Polytropic(gamma=gamma, mu_bar=mu_bar,
                          Kpoly=params.floatparams["Kpoly"],
                          eta=params.floatparams["eta_eos"])
    raise ValueError(f"Unrecognised or not-yet-implemented gas_eos: {name!r}")
