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
