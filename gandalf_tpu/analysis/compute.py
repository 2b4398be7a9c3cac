"""Analysis computations (analogue of reference analysis/compute.py):
L1errornorm is the regression-test workhorse (compute.py:109-148)."""

from __future__ import annotations

import numpy as np

from .analytical import compute_analytical
from .facade import SimBuffer


def particle_data(snap, quantity: str) -> np.ndarray:
    return snap.extract_array(quantity)


def L1errornorm(ic: str, x: str = None, y: str = None,
                xmin: float = None, xmax: float = None,
                normalise: float = None, sim: str = "current",
                snap: str = "current") -> float:
    """L1 norm of simulation data vs the analytic solution
    (reference analysis/compute.py:109-148)."""
    snapshot, simulation = SimBuffer.get_snapshot_and_sim(snap, sim)
    ax, ay = compute_analytical(ic, simulation, snapshot.t, x, y)
    px = snapshot.extract_array(x)
    py = snapshot.extract_array(y)

    if xmin is not None and xmax is not None:
        amask = (ax > xmin) & (ax < xmax)
        ax, ay = ax[amask], ay[amask]
        pmask = (px > ax.min()) & (px < ax.max())
        px, py = px[pmask], py[pmask]

    if normalise is not None:
        av = py.sum() / py.size
        py = py / av / normalise

    yinterp = np.interp(px, ax, ay)
    return float(np.abs(py - yinterp).sum() / px.size)


def COM(snap, quantity: str = "x") -> float:
    x = snap.extract_array(quantity)
    m = snap.extract_array("m")
    return float((x * m).sum() / m.sum())


def lagrangian_radii(snap, mfrac: float = 0.5) -> float:
    """Radius enclosing a mass fraction (reference compute.py:149-)."""
    r = np.sqrt((snap.data["r"] ** 2).sum(axis=-1))
    m = snap.extract_array("m")
    order = np.argsort(r)
    mcum = np.cumsum(m[order])
    idx = np.searchsorted(mcum, mfrac * mcum[-1])
    return float(r[order][min(idx, len(r) - 1)])


def time_derivative(quantity: str, id: int = 0, sim: str = "current"):
    """Finite-difference time derivative of a quantity for one particle
    across the stored snapshots (reference analysis/compute.py
    time_derivative)."""
    import numpy as np

    from .facade import SimBuffer

    simulation = SimBuffer.get_sim(sim)
    snaps = simulation.snapshots
    if len(snaps) < 2:
        raise ValueError("need at least two snapshots")
    ts = np.array([s.t for s in snaps])
    qs = np.array([s.extract_array(quantity)[id] for s in snaps])
    return ts[1:], np.diff(qs) / np.diff(ts)


def energy_error(sim: str = "current"):
    """Relative total-energy drift across the stored snapshots
    (reference analysis/compute.py energy_error; the reference tracks
    the error against the initial diagnostics, Simulation.cpp
    UpdateDiagnostics): returns (times, |E - E0| / |E0|)."""
    from .facade import SimBuffer

    simulation = SimBuffer.get_sim(sim)
    snaps = simulation.snapshots
    if not snaps:
        raise ValueError("no snapshots stored")

    def total_energy(s):
        m = s.extract_array("m")
        v2 = (s.data["v"] ** 2).sum(axis=-1)
        E = 0.5 * (m * v2).sum()
        if "u" in s.data:
            E += (m * s.data["u"]).sum()
        if "gpot" in s.data:
            # gpot is the per-particle potential; the pair sum counts
            # each pair twice
            E += 0.5 * (m * s.data["gpot"]).sum() * (-1.0)
        return E

    ts = np.array([s.t for s in snaps])
    Es = np.array([total_energy(s) for s in snaps])
    E0 = Es[0] if Es[0] != 0.0 else 1.0
    return ts, np.abs(Es - E0) / np.abs(E0)
