"""Soundwave regression gates (reference tests/hydro_tests/test_soundwave.py:
SPH L1(rho) < 1e-4, MFV < 2e-3, isothermal, N=64, one wave period)."""

import pytest

pytestmark = pytest.mark.slow

from gandalf_tpu.analysis import facade
from gandalf_tpu.analysis.compute import L1errornorm
from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import SimulationBase


def soundwave_params(sim_type: str) -> Parameters:
    p = Parameters()
    updates = {
        "run_id": f"SOUNDWAVE_{sim_type}", "sim": sim_type, "ic": "soundwave",
        "ndim": 1, "Nhydro": 64, "rhofluid1": 1.0, "press1": 1.0,
        "amp": 0.001, "dimensionless": 1,
        "boxmin[0]": 0.0, "boxmax[0]": 1.0,
        "boundary_lhs[0]": "periodic", "boundary_rhs[0]": "periodic",
        "tend": 2.0, "dt_snap": 1.0, "tsnapfirst": 0.0,
        "gas_eos": "isothermal", "gamma_eos": 1.66666666666666666,
        "temp0": 1.0, "mu_bar": 1.0,
        "kernel": "gaussian" if sim_type == "gradhsph" else "m4",
        "h_converge": 0.001, "courant_mult": 0.025, "accel_mult": 0.1,
        "avisc": "none", "acond": "none", "Nlevels": 1,
        "neib_search": "bruteforce", "riemann_solver": "hllc",
    }
    for k, v in updates.items():
        p.set(k, v)
    return p


def run_soundwave(sim_type):
    facade.SimBuffer.reset()
    sim = SimulationBase.factory(soundwave_params(sim_type))
    facade.SimBuffer.add_sim(sim)
    facade.run()
    facade.snap(-1)
    return sim


def test_soundwave_sph():
    run_soundwave("gradhsph")
    err = L1errornorm("soundwave", "x", "rho", 0.01, 0.99)
    assert err < 1e-4, f"SPH soundwave L1(rho) = {err}"


def test_soundwave_mfv():
    run_soundwave("mfvmuscl")
    err = L1errornorm("soundwave", "x", "rho", 0.01, 0.99)
    assert err < 2e-3, f"MFV soundwave L1(rho) = {err}"
