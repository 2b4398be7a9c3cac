"""Protoplanetary-disc analysis (analogue of the reference
analysis/disc.py): assign gas particles to the star they are bound to and
expose per-disc summary quantities."""

from __future__ import annotations

import numpy as np


class ParticleGroup:
    """A subset of gas particles from a snapshot (reference Ambient_gas)."""

    def __init__(self, ids: np.ndarray, snap):
        self.ids = np.asarray(ids, bool)
        self.snap = snap

    @property
    def n_particles(self) -> int:
        return int(self.ids.sum())

    def mass(self) -> float:
        return float(self.snap.extract_array("m")[self.ids].sum())

    def positions(self) -> np.ndarray:
        cols = [self.snap.extract_array(k)[self.ids]
                for k in ("x", "y", "z")[: self.snap.ndim]]
        return np.stack(cols, axis=1)

    def velocities(self) -> np.ndarray:
        cols = [self.snap.extract_array(k)[self.ids]
                for k in ("vx", "vy", "vz")[: self.snap.ndim]]
        return np.stack(cols, axis=1)


class Disc(ParticleGroup):
    """Gas bound to one star (reference Disc, analysis/disc.py:96-118)."""

    def __init__(self, istar: int, ids: np.ndarray, snap,
                 star_r: np.ndarray, star_v: np.ndarray):
        super().__init__(ids, snap)
        self.istar = istar
        self.star_r = star_r
        self.star_v = star_v

    def positions_star_frame(self) -> np.ndarray:
        return self.positions() - self.star_r[None, :]

    def velocities_star_frame(self) -> np.ndarray:
        return self.velocities() - self.star_v[None, :]

    def radius(self, lagradius: float = 0.5) -> float:
        """Lagrangian disc radius containing `lagradius` of the mass."""
        d = np.linalg.norm(self.positions_star_frame(), axis=1)
        m = self.snap.extract_array("m")[self.ids]
        if len(d) == 0:
            return 0.0
        order = np.argsort(d)
        cum = np.cumsum(m[order])
        k = np.searchsorted(cum, lagradius * cum[-1])
        return float(d[order][min(k, len(d) - 1)])

    def angular_momentum(self) -> np.ndarray:
        r = self.positions_star_frame()
        v = self.velocities_star_frame()
        m = self.snap.extract_array("m")[self.ids]
        if r.shape[1] == 2:
            lz = m * (r[:, 0] * v[:, 1] - r[:, 1] * v[:, 0])
            return np.array([0.0, 0.0, lz.sum()])
        return (m[:, None] * np.cross(r, v)).sum(axis=0)

    def rotation_axis(self) -> np.ndarray:
        L = self.angular_momentum()
        n = np.linalg.norm(L)
        return L / n if n > 0 else np.array([0.0, 0.0, 1.0])

    def surface_density(self, nbin: int = 32):
        """Azimuthally-averaged Sigma(R) in the disc midplane.
        Returns (R_centres, Sigma)."""
        r = self.positions_star_frame()
        R = np.hypot(r[:, 0], r[:, 1])
        m = self.snap.extract_array("m")[self.ids]
        if len(R) == 0:
            return np.zeros(0), np.zeros(0)
        edges = np.linspace(0.0, R.max() * (1 + 1e-12), nbin + 1)
        idx = np.clip(np.searchsorted(edges, R) - 1, 0, nbin - 1)
        sig = np.zeros(nbin)
        np.add.at(sig, idx, m)
        area = np.pi * (edges[1:] ** 2 - edges[:-1] ** 2)
        return 0.5 * (edges[:-1] + edges[1:]), sig / area


def _star_arrays(snap):
    st = snap.data.get("star") if hasattr(snap, "data") else None
    if st is None:
        return np.zeros((0, 3)), np.zeros((0, 3)), np.zeros(0)
    return np.asarray(st["r"]), np.asarray(st["v"]), np.asarray(st["m"])


def extract_discs(snapno="current", sim="current", eccenlimit: float = 0.9,
                  distancelimit: float = 1.0):
    """Assign every gas particle to the star it is most bound to
    (negative two-body energy, eccentricity < eccenlimit, distance <
    distancelimit), mirroring the reference extract_discs
    (analysis/disc.py:120-185).  Returns (ambient_gas, [discs])."""
    from .facade import SimBuffer

    snap, _ = SimBuffer.get_snapshot_and_sim(snapno, sim)
    star_r, star_v, star_m = _star_arrays(snap)
    ndim = snap.ndim
    cols = [snap.extract_array(k) for k in ("x", "y", "z")[:ndim]]
    vcols = [snap.extract_array(k) for k in ("vx", "vy", "vz")[:ndim]]
    r = np.stack(cols, axis=1)
    v = np.stack(vcols, axis=1)
    N = len(r)
    n_star = len(star_m)
    owner = np.full(N, -1)
    best_e = np.full(N, np.inf)
    for istar in range(n_star):
        dr = r - star_r[istar][None, :ndim]
        dv = v - star_v[istar][None, :ndim]
        d = np.linalg.norm(dr, axis=1)
        v2 = np.sum(dv * dv, axis=1)
        mu = star_m[istar]
        energy = 0.5 * v2 - mu / np.maximum(d, 1e-30)
        # eccentricity from specific orbital elements
        if ndim == 3:
            h = np.cross(dr, dv)
            h2 = np.sum(h * h, axis=1)
        else:
            h2 = (dr[:, 0] * dv[:, 1] - dr[:, 1] * dv[:, 0]) ** 2
        sma = -mu / np.minimum(2.0 * energy, -1e-30)
        ecc2 = np.maximum(1.0 - h2 / (mu * np.maximum(sma, 1e-30)), 0.0)
        bound = (energy < 0.0) & (np.sqrt(ecc2) < eccenlimit) \
            & (d < distancelimit)
        better = bound & (energy < best_e)
        owner[better] = istar
        best_e[better] = energy[better]
    discs = [Disc(i, owner == i, snap, star_r[i][:ndim], star_v[i][:ndim])
             for i in range(n_star)]
    ambient = ParticleGroup(owner == -1, snap)
    return ambient, discs
