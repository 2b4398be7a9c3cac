"""Snapshot I/O.

`column` ASCII format is implemented first for interchange with the
reference (format: header lines Nhydro/Nstar/ndim/t, then per-particle rows
r[ndim] v[ndim] m h rho u — src/Common/SimulationIO.hpp WriteColumnSnapshotFile).
SEREN binary forms (`sf`/`su`) follow in a later milestone.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def write_column_snapshot(filename: str, t: float,
                          hydro: Dict[str, np.ndarray],
                          nstar: int = 0, star: Dict[str, np.ndarray] = None
                          ) -> None:
    r = np.asarray(hydro["r"])
    v = np.asarray(hydro["v"])
    N, ndim = r.shape
    cols = [r[:, k] for k in range(ndim)] + [v[:, k] for k in range(ndim)]
    cols += [np.asarray(hydro[k]) for k in ("m", "h", "rho", "u")]
    data = np.stack(cols, axis=-1)
    with open(filename, "w") as f:
        f.write(f"{N}\n{nstar}\n{ndim}\n{t!r}\n")
        np.savetxt(f, data, fmt="%.12e", delimiter="   ")
        if star is not None and nstar > 0:
            rs = np.asarray(star["r"])
            vs = np.asarray(star["v"])
            scols = [rs[:, k] for k in range(ndim)]
            scols += [vs[:, k] for k in range(ndim)]
            scols += [np.asarray(star[k]) for k in ("m", "h")]
            np.savetxt(f, np.stack(scols, axis=-1), fmt="%.12e",
                       delimiter="   ")


def read_column_snapshot(filename: str) -> Tuple[float, Dict[str, np.ndarray]]:
    with open(filename, "r") as f:
        n_hydro = int(f.readline())
        n_star = int(f.readline())
        ndim = int(f.readline())
        t = float(f.readline())
        rows = np.loadtxt(f, max_rows=n_hydro) if n_hydro else np.zeros((0, 2 * ndim + 4))
    rows = np.atleast_2d(rows)
    hydro = {
        "r": rows[:, :ndim],
        "v": rows[:, ndim:2 * ndim],
        "m": rows[:, 2 * ndim],
        "h": rows[:, 2 * ndim + 1],
        "rho": rows[:, 2 * ndim + 2],
        "u": rows[:, 2 * ndim + 3],
    }
    hydro["nstar"] = n_star
    return t, hydro
