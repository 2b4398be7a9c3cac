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


def correct_ts4(s: NbodyState, dt: Array) -> NbodyState:
    """Time-symmetric 4th-order Hermite corrector
    (NbodyHermite4TS::CorrectionTerms, src/Nbody/NbodyHermite4TS.cpp:77-120):
    v = v0 + (a0+a) dt/2 - (adot-adot0) dt^2/12;
    r = r0 + (v0+v) dt/2 - (a-a0) dt^2/12.
    Symmetric in (begin, end) quantities, so P(EC)^n iteration converges
    to a time-reversible map with no secular energy drift."""
    invdt = 1.0 / dt
    a2dot = (-6.0 * (s.a0 - s.a) - dt * (4.0 * s.adot0 + 2.0 * s.adot)) \
        * invdt * invdt
    a3dot = (12.0 * (s.a0 - s.a) + 6.0 * dt * (s.adot0 + s.adot)) \
        * invdt * invdt * invdt
    dt2 = dt * dt
    v = s.v0 + 0.5 * (s.a0 + s.a) * dt - (s.adot - s.adot0) * dt2 / 12.0
    r = s.r0 + 0.5 * (s.v0 + v) * dt - (s.a - s.a0) * dt2 / 12.0
    return s.replace(r=r, v=v, a2dot=a2dot, a3dot=a3dot)


def predict_ts6(s: NbodyState, dt: Array) -> NbodyState:
    """6th-order predictor using the step-start snap
    (NbodyHermite6TS::AdvanceParticles)."""
    dt2 = dt * dt
    dt3 = dt2 * dt
    dt4 = dt3 * dt
    r = s.r0 + s.v0 * dt + 0.5 * s.a0 * dt2 + s.adot0 * dt3 / 6.0 \
        + s.a2dot0 * dt4 / 24.0
    v = s.v0 + s.a0 * dt + 0.5 * s.adot0 * dt2 + s.a2dot0 * dt3 / 6.0
    return s.replace(r=r, v=v)


def correct_ts6(s: NbodyState, dt: Array) -> NbodyState:
    """Time-symmetric 6th-order Hermite corrector using begin/end snap
    (NbodyHermite6TS::CorrectionTerms, src/Nbody/NbodyHermite6TS.cpp:
    496-551): v = v0 + (a0+a) dt/2 - (adot-adot0) dt^2/10
    + (a2dot+a2dot0) dt^3/120, and symmetrically for r."""
    invdt = 1.0 / dt
    dt2 = dt * dt
    dt3 = dt2 * dt
    a3dot = (12.0 * (s.a0 - s.a) + 6.0 * dt * (s.adot0 + s.adot)) \
        * invdt * invdt * invdt
    v = s.v0 + 0.5 * (s.a0 + s.a) * dt - 0.1 * (s.adot - s.adot0) * dt2 \
        + (s.a2dot + s.a2dot0) * dt3 / 120.0
    r = s.r0 + 0.5 * (s.v0 + v) * dt - 0.1 * (s.a - s.a0) * dt2 \
        + (s.adot + s.adot0) * dt3 / 120.0
    return s.replace(r=r, v=v, a3dot=a3dot)


def end_timestep(s: NbodyState) -> NbodyState:
    """Record step-start quantities (NbodyHermite4::EndTimestep)."""
    return s.replace(r0=s.r, v0=s.v, a0=s.a, adot0=s.adot, a2dot0=s.a2dot)


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
