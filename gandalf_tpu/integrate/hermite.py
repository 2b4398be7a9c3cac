"""4th-order Hermite N-body integration (Makino & Aarseth 1992).

Vectorised analogue of NbodyHermite4 (src/Nbody/NbodyHermite4.cpp):
predictor to 3rd order, force+jerk evaluation, Hermite corrector computing
snap/crackle, Aarseth timestep.  P(EC)^n iteration (reference Npec) is a
fori over the evaluate+correct pair.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..state import NbodyState

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class HermiteConfig:
    nbody_mult: float = 0.1
    npec: int = 1

    @staticmethod
    def from_params(params) -> "HermiteConfig":
        return HermiteConfig(nbody_mult=params.floatparams["nbody_mult"],
                             npec=params.intparams["Npec"])


def predict(s: NbodyState, dt: Array) -> NbodyState:
    """Hermite predictor (NbodyHermite4::AdvanceParticles, :340):
    r_p = r0 + v0 dt + a0 dt^2/2 + adot0 dt^3/6;
    v_p = v0 + a0 dt + adot0 dt^2/2."""
    dt2 = dt * dt
    r = s.r0 + s.v0 * dt + 0.5 * s.a0 * dt2 + s.adot0 * dt2 * dt / 6.0
    v = s.v0 + s.a0 * dt + 0.5 * s.adot0 * dt2
    return s.replace(r=r, v=v)


def correct(s: NbodyState, dt: Array) -> NbodyState:
    """Hermite corrector (NbodyHermite4::CorrectionTerms, :388-437):
    a2dot/a3dot from the (a0, adot0, a, adot) Hermite fit; 4th/5th order
    position/velocity corrections."""
    invdt = 1.0 / dt
    a2dot = (-6.0 * (s.a0 - s.a) - dt * (4.0 * s.adot0 + 2.0 * s.adot)) \
        * invdt * invdt
    a3dot = (12.0 * (s.a0 - s.a) + 6.0 * dt * (s.adot0 + s.adot)) \
        * invdt * invdt * invdt
    dt3 = dt ** 3
    r = s.r + a2dot * dt3 * dt / 24.0 + a3dot * dt3 * dt * dt / 120.0
    v = s.v + a2dot * dt3 / 6.0 + a3dot * dt3 * dt / 24.0
    return s.replace(r=r, v=v, a2dot=a2dot, a3dot=a3dot)


def end_timestep(s: NbodyState) -> NbodyState:
    """Record step-start quantities (NbodyHermite4::EndTimestep)."""
    return s.replace(r0=s.r, v0=s.v, a0=s.a, adot0=s.adot)


def aarseth_timestep(cfg: HermiteConfig, s: NbodyState) -> Array:
    """Per-particle Aarseth timestep
    (NbodyHermite4::Timestep, src/Nbody/NbodyHermite4.cpp:538-570)."""
    tiny = 1e-20
    asqd = jnp.sum(s.a * s.a, axis=-1)
    a1sqd = jnp.sum(s.adot * s.adot, axis=-1)
    a2sqd = jnp.sum(s.a2dot * s.a2dot, axis=-1)
    a3sqd = jnp.sum(s.a3dot * s.a3dot, axis=-1)
    full = cfg.nbody_mult * jnp.sqrt(
        (jnp.sqrt(asqd * a2sqd) + a1sqd)
        / (jnp.sqrt(a1sqd * a3sqd) + a2sqd + tiny))
    simple = cfg.nbody_mult * jnp.sqrt(asqd / (a2sqd + tiny))
    accel = jnp.sqrt(s.h / (jnp.sqrt(asqd) + tiny))
    big = jnp.full_like(asqd, 1e20)
    dt = jnp.where(
        (a1sqd > tiny) & (a2sqd > tiny), full,
        jnp.where((asqd > tiny) & (a2sqd > tiny), simple,
                  jnp.where(asqd > tiny, accel, big)))
    return dt
