"""Ewald summation for (fully) periodic self-gravity.

Analogue of the reference Ewald class (src/Common/Ewald.cpp:60-470,
CalculatePeriodicCorrection :496-620, ewald_periodicity == 7): a host-side
table of the periodic-minus-Newtonian correction field is precomputed once
on a grid over the positive octant of the half-cell, and the jitted force
pass adds a trilinearly-interpolated correction for every pair.

The field follows the classic gravitational Ewald split (Hernquist,
Bouchet & Suto 1991): real-space erfc-damped image sum + reciprocal-space
Gaussian sum + the k = 0 neutralising-background term (the "Jeans swindle"),
with the direct 1/r (1/r^2) term subtracted.  The acceleration components
are odd and the potential even under per-coordinate sign flips, so the
octant table covers the whole cell.

Mixed periodic/open boundaries (reference ewald_periodicity 1-6) are not
implemented; fully-periodic boxes only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from scipy.special import erfc

Array = jnp.ndarray


class EwaldTable(NamedTuple):
    pot: Array          # (nx, ny, nz) correction potential (+1/r convention)
    acc: Array          # (nx, ny, nz, 3) correction acceleration
    inv_dgrid: Array    # (3,) inverse grid spacing
    nmax: Array         # (3,) last valid cell index (ngrid - 2)


def build_ewald_table(lbox, ngrid: int = 17, nseries: int = 5,
                      ewald_mult: float = 1.0) -> EwaldTable:
    """Precompute the periodic correction field on a (ngrid,)*3 grid over
    [0, L/2]^3 (host-side numpy; Ewald.cpp:268-420 analogue)."""
    lx, ly, lz = (float(lbox[0]), float(lbox[1]), float(lbox[2]))
    V = lx * ly * lz
    alpha = 2.0 * ewald_mult / lx        # reference: 2 * ewald_mult / lx_per

    ax = np.linspace(0.0, 0.5 * lx, ngrid)
    ay = np.linspace(0.0, 0.5 * ly, ngrid)
    az = np.linspace(0.0, 0.5 * lz, ngrid)
    X, Y, Z = np.meshgrid(ax, ay, az, indexing="ij")
    r = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)     # (G, 3)

    # image / wave-number lattice inside a sphere of radius nseries
    rng = np.arange(-nseries, nseries + 1)
    NX, NY, NZ = np.meshgrid(rng, rng, rng, indexing="ij")
    nvec = np.stack([NX, NY, NZ], axis=-1).reshape(-1, 3)
    nvec = nvec[np.sum(nvec * nvec, axis=1) <= nseries * nseries]

    # --- real-space sum: erfc-damped images -------------------------------
    L = np.array([lx, ly, lz])
    pot = np.zeros(len(r))
    acc = np.zeros((len(r), 3))
    for n in nvec:                                       # few hundred terms
        rn = r + n * L                                   # (G, 3)
        d2 = np.sum(rn * rn, axis=1)
        d2s = np.where(d2 > 0, d2, 1.0)                  # origin masked below
        d = np.sqrt(d2s)
        e = erfc(alpha * d)
        g = e / d
        s = (e + (2.0 * alpha / np.sqrt(np.pi)) * d
             * np.exp(-alpha * alpha * d2)) / (d * d2s)
        pot += np.where(d2 > 0, g, 0.0)
        acc += np.where(d2[:, None] > 0, rn * s[:, None], 0.0)

    # --- reciprocal-space sum ----------------------------------------------
    hvec = nvec[np.any(nvec != 0, axis=1)]
    kt = hvec / L[None, :]                               # (H, 3) k/2pi
    kt2 = np.sum(kt * kt, axis=1)
    damp = np.exp(-np.pi * np.pi * kt2 / (alpha * alpha)) / kt2
    phase = 2.0 * np.pi * (r @ kt.T)                     # (G, H)
    pot += (np.cos(phase) @ damp) / (np.pi * V)
    acc += (np.sin(phase) @ (damp[:, None] * kt)) * (2.0 / V)

    # k = 0 neutralising background + subtract the direct Newtonian term
    pot -= np.pi / (alpha * alpha * V)
    d2 = np.sum(r * r, axis=1)
    d2s = np.where(d2 > 0, d2, 1.0)
    d = np.sqrt(d2s)
    pot -= np.where(d2 > 0, 1.0 / d, 0.0)
    acc -= np.where(d2[:, None] > 0, r / (d * d2s)[:, None], 0.0)
    pot[0] = 0.0                                         # origin (self term)
    acc[0] = 0.0

    shape = (ngrid, ngrid, ngrid)
    inv_dgrid = (ngrid - 1) / (0.5 * np.array([lx, ly, lz]))
    return EwaldTable(
        pot=jnp.asarray(pot.reshape(shape)),
        acc=jnp.asarray(acc.reshape(shape + (3,))),
        inv_dgrid=jnp.asarray(inv_dgrid),
        nmax=jnp.asarray([ngrid - 2] * 3, jnp.int32))


def ewald_correction(table: EwaldTable, dr: Array):
    """Trilinear lookup of (acc_corr, pot_corr) for minimum-image pair
    vectors dr (..., 3)  (CalculatePeriodicCorrection, Ewald.cpp:496-620).

    Odd symmetry in each coordinate for the matching acceleration
    component; even for the potential and cross components."""
    sign = jnp.sign(dr)
    b = jnp.abs(dr) * table.inv_dgrid
    i0 = jnp.clip(b.astype(jnp.int32), 0, table.nmax)
    w = b - i0.astype(b.dtype)

    pot = jnp.zeros(dr.shape[:-1], dr.dtype)
    acc = jnp.zeros_like(dr)
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                wt = (jnp.where(cx, w[..., 0], 1.0 - w[..., 0])
                      * jnp.where(cy, w[..., 1], 1.0 - w[..., 1])
                      * jnp.where(cz, w[..., 2], 1.0 - w[..., 2]))
                ix, iy, iz = i0[..., 0] + cx, i0[..., 1] + cy, i0[..., 2] + cz
                pot = pot + wt * table.pot[ix, iy, iz]
                acc = acc + wt[..., None] * table.acc[ix, iy, iz]
    return acc * sign, pot


def ewald_pair_gravity(table: EwaldTable, box, r: Array, m: Array):
    """Dense pair sum of the periodic corrections: a_i += sum_j m_j
    acorr(dr_ij), gpot_i += sum_j m_j potcorr(dr_ij) (the brute-force
    analogue of the reference's per-pair correction in its tree walks,
    GradhSphTree.cpp / HydroTree.cpp CalculatePeriodicCorrection calls)."""
    dr = box.min_image(r[None, :, :] - r[:, None, :])
    acorr, potcorr = ewald_correction(table, dr)
    eye = jnp.eye(r.shape[0], dtype=bool)
    mj = jnp.where(eye, 0.0, m[None, :])
    a = jnp.sum(mj[..., None] * acorr, axis=1)
    gpot = jnp.sum(mj * potcorr, axis=1)
    return a, gpot
