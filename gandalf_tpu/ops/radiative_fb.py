"""Radiative feedback: accretion-luminosity heating of the RadWS ambient
temperature field (RadiativeFB + DiscHeating/SinkHeating,
src/Thermal/RadiativeFB.cpp:40-306).

T_amb(x)^4 = T_inf^4 + disc contributions + sum_sinks
             0.25 (r_source/d)^2 T_sink^4,
T_sink     = (L / (4 pi sigma r_source^2))^(1/4),
L          = f_n (m/msun)^3 Lsun + f_acc (m mdot / r_source)
             (1 - r_source/(2 r_sink)),

with r_source/f_n chosen by the sink mass class (planet / brown dwarf /
star).  The resulting per-particle ambient temperature feeds
energy_find_equi (ops/radws.py)."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class SinkHeatingConfig:
    rad_const: float = 1.0      # Stefan-Boltzmann, code units
    temp_inf: float = 5.0
    f_acc: float = 0.75
    lsun: float = 1.0           # solar luminosity, code units
    msun: float = 1.0
    mjup: float = 9.546e-4      # in msun units
    r_planet: float = 1.0e-2    # source radii, code units
    r_bdwarf: float = 1.0e-2
    r_star: float = 1.0e-2


def sink_luminosity(cfg: SinkHeatingConfig, m: Array, mdot: Array,
                    rsink: Array):
    """(L, r_source) per sink (SinkLuminosity, RadiativeFB.cpp:238-256)."""
    mj = cfg.mjup * cfg.msun
    r_source = jnp.where(m >= 80.0 * mj, cfg.r_star,
                         jnp.where(m >= 13.0 * mj, cfg.r_bdwarf,
                                   cfg.r_planet))
    f_n = (m >= 80.0 * mj).astype(m.dtype)
    L = f_n * (m / cfg.msun) ** 3 * cfg.lsun \
        + cfg.f_acc * (m * mdot / r_source) \
        * (1.0 - r_source / (2.0 * jnp.maximum(rsink, 1e-30)))
    return L, r_source


def ambient_temperature(cfg: SinkHeatingConfig,
                        r: Array,
                        r_sink: Array, m_sink: Array, mdot_sink: Array,
                        rad_sink: Array, active: Array) -> Array:
    """(N,) per-particle ambient temperature (RadiativeFB::AmbientTemp +
    SinkHeating::AmbientTemp)."""
    L, r_src = sink_luminosity(cfg, m_sink, mdot_sink, rad_sink)
    tsink4 = L / (4.0 * jnp.pi * cfg.rad_const
                  * jnp.maximum(r_src * r_src, 1e-30))
    d2 = jnp.sum((r[:, None, :] - r_sink[None, :, :]) ** 2, axis=-1)
    contrib = 0.25 * (r_src * r_src)[None, :] \
        / jnp.maximum(d2, 1e-30) * tsink4[None, :]
    contrib = jnp.where(active[None, :], contrib, 0.0)
    t4 = cfg.temp_inf ** 4 + jnp.sum(contrib, axis=1)
    return t4 ** 0.25


@dataclasses.dataclass(frozen=True)
class DiscHeatingConfig:
    """DiscHeating (reference RadiativeFB.cpp:108-148): proxy disc
    temperature profile around the central protostellar system,
    T^4 = temp_au^4 (d_mid^2 + rsmooth^2)^(-2 q) with d_mid the MIDPLANE
    (x-y) distance to the central sink(s)."""

    temp_au: float = 250.0
    temp_q: float = 0.75
    rsmooth: float = 0.01
    n_central: int = 1


def disc_ambient_t4(cfg: DiscHeatingConfig, r: Array, r_sink: Array,
                    active: Array) -> Array:
    """(N,) T^4 disc-heating contribution from the first n_central sinks
    (DiscHeating::AmbientTemp)."""
    nc = cfg.n_central
    d2 = jnp.sum((r[:, None, :2] - r_sink[None, :nc, :2]) ** 2, axis=-1)
    t4 = cfg.temp_au ** 4 \
        * (d2 + cfg.rsmooth ** 2) ** (-2.0 * cfg.temp_q)
    return jnp.sum(jnp.where(active[None, :nc], t4, 0.0), axis=1)


def combined_ambient_temperature(sink_cfg: SinkHeatingConfig,
                                 disc_cfg, r: Array,
                                 r_sink: Array, m_sink: Array,
                                 mdot_sink: Array, rad_sink: Array,
                                 active: Array) -> Array:
    """RadiativeFB::AmbientTemp: T^4 = T_inf^4 + disc + sink terms; when
    disc heating is on, the central sinks are EXCLUDED from sink heating
    (reference RadiativeFB.cpp:88-102)."""
    L, r_src = sink_luminosity(sink_cfg, m_sink, mdot_sink, rad_sink)
    tsink4 = L / (4.0 * jnp.pi * sink_cfg.rad_const
                  * jnp.maximum(r_src * r_src, 1e-30))
    d2 = jnp.sum((r[:, None, :] - r_sink[None, :, :]) ** 2, axis=-1)
    contrib = 0.25 * (r_src * r_src)[None, :] \
        / jnp.maximum(d2, 1e-30) * tsink4[None, :]
    act = active
    if disc_cfg is not None:
        act = act & (jnp.arange(r_sink.shape[0]) >= disc_cfg.n_central)
    contrib = jnp.where(act[None, :], contrib, 0.0)
    t4 = sink_cfg.temp_inf ** 4 + jnp.sum(contrib, axis=1)
    if disc_cfg is not None:
        t4 = t4 + disc_ambient_t4(disc_cfg, r, r_sink, active)
    return t4 ** 0.25
