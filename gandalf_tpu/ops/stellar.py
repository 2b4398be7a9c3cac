"""Stellar-properties table: mass -> (L, N_LyC, Teff, Mdot, vwind).

Analogue of Nbody::LoadStellarPropertiesTable / UpdateStellarProperties
(src/Nbody/Nbody.cpp:143-224): a small lookup table (the reference ships
`stellar.dat`) linearly interpolated in mass; luminosity and ionising
photon rate are stored as log10.  Drives sink/star feedback: N_LyC feeds
photoionisation, L feeds radiative feedback, (Mdot, vwind) feed winds.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# Default fallback table in the reference's stellar.dat layout —
# representative ZAMS values (mass vs log L/Lsun, log N_LyC [s^-1],
# Teff [K], Mdot [1e-6 Msun/yr], vwind [km/s]); load_stellar_table reads a
# user-supplied stellar.dat for production runs
_DEFAULT = np.array([
    #  M      logL   logNLyC  Teff    Mdot    vwind
    [0.0,    0.00,   0.0,     0.0,    0.0,    0.0],
    [1.0,    1.00,   0.0,     5800.,  0.0,    0.0],
    [4.0,    2.35,   0.0,     12300., 0.0,    0.0],
    [5.0,    2.79,   0.0,     15400., 0.0,    0.0],
    [6.0,    3.06,   44.0,    17500., 0.0,    0.0],
    [7.5,    3.34,   44.6,    19000., 0.11,   750.0],
    [9.0,    3.59,   45.2,    21000., 0.23,   1000.0],
    [12.0,   3.95,   45.9,    24000., 0.40,   1500.0],
    [15.0,   4.21,   46.5,    27000., 0.71,   1800.0],
    [20.0,   4.56,   47.3,    31000., 1.30,   2200.0],
    [25.0,   4.81,   47.9,    34000., 2.10,   2500.0],
    [30.0,   5.00,   48.3,    36500., 3.10,   2800.0],
    [35.0,   5.15,   48.6,    38500., 4.10,   3000.0],
    [40.0,   5.28,   48.8,    40000., 5.20,   3200.0],
    [50.0,   5.47,   49.1,    42500., 7.50,   3500.0],
    [60.0,   5.62,   49.4,    44500., 10.0,   3700.0],
    [80.0,   5.84,   49.7,    47000., 15.0,   4000.0],
    [100.0,  6.00,   49.9,    48500., 21.0,   4200.0],
    [120.0,  6.13,   50.0,    50000., 27.0,   4400.0],
])


@dataclasses.dataclass(frozen=True)
class StellarTable:
    mass: np.ndarray       # (T,) in code mass units
    log_lum: np.ndarray    # log10 L
    log_nlyc: np.ndarray   # log10 N_LyC
    teff: np.ndarray
    mdot: np.ndarray
    vwind: np.ndarray


def default_stellar_table(m_inscale: float = 1.0) -> StellarTable:
    t = _DEFAULT
    return StellarTable(mass=t[:, 0] / m_inscale, log_lum=t[:, 1],
                        log_nlyc=t[:, 2], teff=t[:, 3], mdot=t[:, 4],
                        vwind=t[:, 5])


def load_stellar_table(path: str, m_inscale: float = 1.0) -> StellarTable:
    """Read a `stellar.dat`-format file: first line = row count, five
    header lines, then rows of (mass, logL, logNLyC, Teff, Mdot, vwind)
    (Nbody::LoadStellarPropertiesTable, Nbody.cpp:143-186)."""
    with open(path) as f:
        n = int(f.readline().split()[0])
        for _ in range(4):
            f.readline()
        rows = []
        while len(rows) < n:
            parts = f.readline().split()
            if len(parts) >= 6:
                rows.append([float(x) for x in parts[:6]])
    t = np.asarray(rows)
    return StellarTable(mass=t[:, 0] / m_inscale, log_lum=t[:, 1],
                        log_nlyc=t[:, 2], teff=t[:, 3], mdot=t[:, 4],
                        vwind=t[:, 5])


def stellar_nlyc(table: StellarTable, m: Array) -> Array:
    """Ionising photon rate per star: 10^(linear interpolation of logNLyC)
    (Nbody::UpdateStellarProperties, Nbody.cpp:186-224)."""
    logn = jnp.interp(m, jnp.asarray(table.mass),
                      jnp.asarray(table.log_nlyc))
    return 10.0 ** logn


def stellar_luminosity(table: StellarTable, m: Array) -> Array:
    logl = jnp.interp(m, jnp.asarray(table.mass),
                      jnp.asarray(table.log_lum))
    return 10.0 ** logl


def stellar_wind(table: StellarTable, m: Array):
    """(Mdot, vwind) per star."""
    mdot = jnp.interp(m, jnp.asarray(table.mass), jnp.asarray(table.mdot))
    vw = jnp.interp(m, jnp.asarray(table.mass), jnp.asarray(table.vwind))
    return mdot, vw
