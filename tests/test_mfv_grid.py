"""MFV structured-grid path (ops/mfv_grid27.py) parity gates.

The grid drivers share their physics with the all-pairs oracle through the
accumulate/finalize split in ops/mfv.py, but the binning/ghost plumbing is
path-specific — these tests pin the two paths against each other on a 2D
periodic config (reference analogue: MeshlessFVTree vs brute force,
src/MeshlessFV/MeshlessFVTree.cpp:318,487,662).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

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


def test_mfv_tree_gravity_vs_oracle():
    """MFV Barnes-Hut gravity (zeta_scaling='mfv') against the all-pairs
    MfvCommon::ComputeSmoothedGravForces oracle on a 3D gravitating
    sphere: same accuracy gate as the SPH treeerror test."""
    import jax

    p = Parameters()
    for k, v in {
            "ndim": 3, "sim": "meshlessfv", "ic": "sphere", "Nhydro": 2000,
            "particle_distribution": "random",
            "mcloud": 1.0, "radius": 1.0, "dimensionless": 1,
            "press1": 1e-4, "gamma_eos": 1.6666666666666667,
            "gas_eos": "energy_eqn", "hydro_forces": 1, "self_gravity": 1,
            "riemann_solver": "hllc", "zero_mass_flux": 1,
            "run_id": "", "neib_search": "kdtree"}.items():
        p.set(k, v)
    sim = SimulationBase.factory(p)
    sim.SetupSimulation()
    s = sim.state
    a_tree, _, ovf = jax.jit(sim._gravity_pass)(s)
    assert not bool(ovf)

    from gandalf_tpu.ops.mfv import mfv_smoothed_gravity
    a_ref, _ = mfv_smoothed_gravity(sim.kern, sim.box, s.r, s.m, s.h,
                                    s.zeta, s.hfactor)
    a_tree, a_ref = np.asarray(a_tree), np.asarray(a_ref)
    scale = np.sqrt((a_ref ** 2).sum(-1))
    rel = np.sqrt(((a_tree - a_ref) ** 2).sum(-1)) / np.maximum(scale, 1e-12)
    assert np.median(rel) < 2e-3, f"median rel err {np.median(rel)}"
    assert np.percentile(rel, 99) < 3e-2, f"p99 {np.percentile(rel, 99)}"
