"""Turbulence statistics helpers (analogue of the reference
analysis/statistics.py: structure_function :36-95, density_pdf :98-126)."""

from __future__ import annotations

import numpy as np


def structure_function(snap, nbin: int = 8, npoints: int = 1000,
                       rmin: float = None, rmax: float = None,
                       seed: int = 0):
    """Second-order velocity structure function S2(l) =
    <|v(x+l) - v(x)|^2>, estimated from `npoints` random particles against
    all others, binned logarithmically in separation.

    Returns (bin_centres, S2).
    """
    x = snap.extract_array("x")
    ndim = getattr(snap, "ndim", 3)
    cols = [x]
    vcols = [snap.extract_array("vx")]
    if ndim > 1:
        cols.append(snap.extract_array("y"))
        vcols.append(snap.extract_array("vy"))
    if ndim > 2:
        cols.append(snap.extract_array("z"))
        vcols.append(snap.extract_array("vz"))
    r = np.stack(cols, axis=1)
    v = np.stack(vcols, axis=1)
    N = len(r)
    rng = np.random.default_rng(seed)
    sel = rng.choice(N, size=min(npoints, N), replace=False)
    dr = np.linalg.norm(r[sel][:, None, :] - r[None, :, :], axis=-1)
    dv2 = np.sum((v[sel][:, None, :] - v[None, :, :]) ** 2, axis=-1)
    dr = dr.ravel()
    dv2 = dv2.ravel()
    keep = dr > 0
    dr, dv2 = dr[keep], dv2[keep]
    if rmin is None:
        rmin = np.percentile(dr, 0.1)
    if rmax is None:
        rmax = dr.max()
    edges = np.geomspace(max(rmin, 1e-30), rmax, nbin + 1)
    idx = np.clip(np.searchsorted(edges, dr) - 1, 0, nbin - 1)
    s2 = np.zeros(nbin)
    cnt = np.bincount(idx, minlength=nbin)
    np.add.at(s2, idx, dv2)
    s2 = s2 / np.maximum(cnt, 1)
    centres = np.sqrt(edges[:-1] * edges[1:])
    return centres, s2


def density_pdf(snap, nbin: int = 32, rhomin: float = None,
                rhomax: float = None):
    """Mass-weighted log-density PDF. Returns (bin_centres, pdf)."""
    rho = snap.extract_array("rho")
    m = snap.extract_array("m")
    if rhomin is None:
        rhomin = rho[rho > 0].min()
    if rhomax is None:
        rhomax = rho.max()
    edges = np.geomspace(max(rhomin, 1e-300), rhomax * (1 + 1e-12),
                         nbin + 1)
    idx = np.clip(np.searchsorted(edges, rho) - 1, 0, nbin - 1)
    pdf = np.zeros(nbin)
    np.add.at(pdf, idx, m)
    pdf = pdf / pdf.sum() / np.diff(np.log(edges))
    centres = np.sqrt(edges[:-1] * edges[1:])
    return centres, pdf
