"""Leapfrog time integration (KDK and DKD) + SPH timestep criteria.

Functional analogue of SphLeapfrogKDK / SphLeapfrogDKD
(src/Hydrodynamics/SphLeapfrogKDK.cpp, SphLeapfrogDKD.cpp) and
SphIntegration::Timestep (src/Hydrodynamics/SphIntegration.cpp:81-130).

The global-timestep path advances ALL particles by state.dt each step; the
hierarchical block-timestep scheme reuses these same kernels with per-
particle masks (dn == nstep).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..state import SphState

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class IntegratorConfig:
    scheme: str = "lfkdk"             # lfkdk | lfdkd
    energy_integration: bool = True
    td_avisc: bool = False            # time-dependent artificial viscosity
    courant_mult: float = 0.15
    accel_mult: float = 0.3
    energy_mult: float = 0.4

    @staticmethod
    def from_params(params, energy_integration: bool) -> "IntegratorConfig":
        return IntegratorConfig(
            scheme=params.stringparams["sph_integration"],
            energy_integration=energy_integration,
            td_avisc=params.stringparams["time_dependent_avisc"] != "none",
            courant_mult=params.floatparams["courant_mult"],
            accel_mult=params.floatparams["accel_mult"],
            energy_mult=params.floatparams["energy_mult"],
        )


def predict(cfg: IntegratorConfig, s: SphState, dt: Array) -> SphState:
    """KDK predictor: drift positions, kick velocities with start-of-step
    acceleration (SphLeapfrogKDK::AdvanceParticles)."""
    r = s.r0 + s.v0 * dt + 0.5 * s.a0 * dt * dt
    v = s.v0 + s.a0 * dt
    out = {"r": r, "v": v}
    if cfg.energy_integration:
        out["u"] = s.u0 + s.dudt0 * dt
    if cfg.td_avisc:
        out["alpha"] = s.alpha  # alpha advanced in correct step (dalphadt*dt)
    return s.replace(**out)


def correct(cfg: IntegratorConfig, s: SphState, dt: Array,
            dalphadt: Array) -> SphState:
    """KDK corrector + end-of-step bookkeeping
    (SphLeapfrogKDK::CorrectionTerms + EndTimestep)."""
    v = s.v + 0.5 * dt * (s.a - s.a0)
    out = {"v": v, "r0": s.r, "v0": v, "a0": s.a}
    if cfg.energy_integration:
        u = s.u + 0.5 * (s.dudt - s.dudt0) * dt
        # guard against spurious negative energies: fall back to 1st order
        # (SphLeapfrogKDK.cpp:176-180)
        u = jnp.where(u <= 0.0, s.u0 + s.dudt0 * dt, u)
        out["u"] = u
        out["u0"] = u
        out["dudt0"] = s.dudt
    if cfg.td_avisc:
        out["alpha"] = s.alpha + dalphadt * dt
    return s.replace(**out)


def sph_timestep(cfg: IntegratorConfig, s: SphState,
                 hydro_forces: bool = True) -> Array:
    """Per-particle SPH timestep: Courant + acceleration (+ energy) criteria
    (SphIntegration::Timestep). Returns (N,) timesteps."""
    tiny = 1e-30
    if hydro_forces:
        dt_cfl = cfg.courant_mult * s.h / (
            s.sound + s.h * jnp.abs(s.div_v) + tiny)
    else:
        dt_cfl = cfg.courant_mult * s.h / (s.h * jnp.abs(s.div_v) + tiny)
    amag = jnp.sqrt(jnp.sum(s.a * s.a, axis=-1))
    dt_acc = cfg.accel_mult * jnp.sqrt(s.h / (amag + tiny))
    dt = jnp.minimum(dt_cfl, dt_acc)
    if cfg.energy_integration:
        dt_en = cfg.energy_mult * s.u / (jnp.abs(s.dudt) + tiny)
        # u = 0 lanes (dust, freshly-created) carry no thermal state
        dt = jnp.minimum(dt, jnp.where(s.u > 0.0, dt_en, 1e30))
    return dt
