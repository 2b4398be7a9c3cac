"""Supernova feedback (reference src/Feedback/Supernova.cpp +
SedovTestDriver)."""

import numpy as np
import pytest

from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import GradhSphSimulation


def test_sedov_test_driver_injects_energy_and_mass():
    p = Parameters()
    for k, v in {
            "ndim": 3, "sim": "sph", "ic": "box", "dimensionless": 1,
            "run_id": "",
            "Nlattice1[0]": 8, "Nlattice1[1]": 8, "Nlattice1[2]": 8,
            "boxmin[0]": -0.5, "boxmax[0]": 0.5,
            "boxmin[1]": -0.5, "boxmax[1]": 0.5,
            "boxmin[2]": -0.5, "boxmax[2]": 0.5,
            "boundary_lhs[0]": "periodic", "boundary_rhs[0]": "periodic",
            "boundary_lhs[1]": "periodic", "boundary_rhs[1]": "periodic",
            "boundary_lhs[2]": "periodic", "boundary_rhs[2]": "periodic",
            "rhofluid1": 1.0, "press1": 1e-5,
            "gas_eos": "energy_eqn", "gamma_eos": 1.6666667,
            "hydro_forces": 1, "neib_search": "bruteforce",
            "supernova_feedback": "sedov_test", "tsupernova": 0.001,
    }.items():
        p.set(k, v)
    sim = GradhSphSimulation(p)
    sim.SetupSimulation()
    N = sim.state.N
    alive0 = int(np.asarray(sim.state.alive).sum())
    assert N - alive0 == 2                    # Minj/mmean spare slots
    E0 = float((np.asarray(sim.state.m) * np.asarray(sim.state.u)).sum())
    for _ in range(10):
        sim.main_loop_step()
    s = sim.state
    assert int(np.asarray(s.alive).sum()) == N     # spares activated
    m = np.asarray(s.m)
    v = np.asarray(s.v)
    u = np.asarray(s.u)
    E = 0.5 * (m * (v ** 2).sum(-1)).sum() + (m * u).sum()
    # E_tot = E0 + Einj (0.01) exactly at injection, conserved after
    assert E == pytest.approx(E0 + 0.01, rel=2e-3)
    assert np.isfinite(v).all()
    # blast wave: outward radial motion around the origin
    r = np.asarray(s.r)
    rad = np.sqrt((r ** 2).sum(-1))
    vrad = (r * v).sum(-1) / np.maximum(rad, 1e-10)
    inner = rad < 0.25
    assert vrad[inner].mean() > 0.0


def test_sedov_driver_block_timesteps():
    """SN injection under hierarchical block timesteps (Nlevels=3): the
    injection triggers a full level resync (fresh ladder via bootstrap),
    energy is conserved after injection, and the blast expands (reference
    call order: snDriver->Update before the block-step machinery,
    SphSimulation.cpp:600-604)."""
    p = Parameters()
    for k, v in {
            "ndim": 3, "sim": "sph", "ic": "box", "dimensionless": 1,
            "run_id": "",
            "Nlattice1[0]": 8, "Nlattice1[1]": 8, "Nlattice1[2]": 8,
            "boxmin[0]": -0.5, "boxmax[0]": 0.5,
            "boxmin[1]": -0.5, "boxmax[1]": 0.5,
            "boxmin[2]": -0.5, "boxmax[2]": 0.5,
            "boundary_lhs[0]": "periodic", "boundary_rhs[0]": "periodic",
            "boundary_lhs[1]": "periodic", "boundary_rhs[1]": "periodic",
            "boundary_lhs[2]": "periodic", "boundary_rhs[2]": "periodic",
            "rhofluid1": 1.0, "press1": 1e-5,
            "gas_eos": "energy_eqn", "gamma_eos": 1.6666667,
            "hydro_forces": 1, "neib_search": "bruteforce",
            "supernova_feedback": "sedov_test", "tsupernova": 0.001,
            "Nlevels": 3, "level_diff_max": 1,
    }.items():
        p.set(k, v)
    sim = GradhSphSimulation(p)
    sim.SetupSimulation()
    assert sim.use_block
    N = sim.state.N
    E0 = float((np.asarray(sim.state.m) * np.asarray(sim.state.u)).sum())
    # cold box: the first tick blows past tsupernova; injection applies
    # at the top of the following step
    n = 0
    while int(np.asarray(sim.state.alive).sum()) < N and n < 50:
        sim.main_loop_step()
        n += 1
    for _ in range(10):                     # evolve the blast
        sim.main_loop_step()
    s = sim.state
    assert int(np.asarray(s.alive).sum()) == N     # spares activated
    m, v, u = np.asarray(s.m), np.asarray(s.v), np.asarray(s.u)
    E = 0.5 * (m * (v ** 2).sum(-1)).sum() + (m * u).sum()
    assert E == pytest.approx(E0 + 0.01, rel=2e-3)
    assert np.isfinite(v).all()
    # after injection the hot bubble must occupy a deeper level than the
    # cold background: the ladder actually stratifies
    lvl = np.asarray(s.level)
    assert lvl.max() > lvl.min()


def test_random_sedov_driver():
    """RandomSedovTestDriver: SNe queued at (k+0.5) tsupernova at random
    box positions (SupernovaDriver.cpp RandomSedovTestDriver::Update)."""
    from gandalf_tpu.ops.feedback import driver_from_params
    from gandalf_tpu.params import Parameters

    p = Parameters()
    for k, v in dict(ndim=3, supernova_feedback="random_sedov",
                     tsupernova=0.1, tend=0.45, randseed=5).items():
        p.set(k, v)
    for k in range(3):
        p.set(f"boxmin[{k}]", -1.0)
        p.set(f"boxmax[{k}]", 1.0)
    drv = driver_from_params(p, mmean=1e-3)
    assert len(drv.events) == 5
    times = [e.t for e in drv.events]
    np.testing.assert_allclose(times, [0.05, 0.15, 0.25, 0.35, 0.45],
                               rtol=1e-12)
    pos = np.array([e.pos for e in drv.events])
    assert (pos >= -1.0).all() and (pos <= 1.0).all()
    # positions differ between events
    assert len(np.unique(pos.round(6))) > 3


def test_silcc_sn_driver(tmp_path):
    """SilccSupernovaDriver (SupernovaDriver.cpp:159-270): SN event table
    read from SNfile_name; events fire at their listed times/positions
    with per-event energies."""
    import numpy as np

    from gandalf_tpu.ops.feedback import driver_from_params
    from gandalf_tpu.params import Parameters

    sn = tmp_path / "sn.txt"
    sn.write_text("# t x y z Einj\n2\n"
                  "0.5  0.1 0.0 0.0  0.02\n"
                  "0.2  -0.1 0.0 0.0  0.01\n")
    p = Parameters()
    for k, v in dict(ndim=3, supernova_feedback="silcc",
                     SNfile_name=str(sn), Minj=0.004, Rinj=0.2,
                     R_therm_kin=2.0, dimensionless=1).items():
        p.set(k, v)
    drv = driver_from_params(p, mmean=0.001)
    assert drv is not None and len(drv.events) == 2
    # sorted by time; fields propagated
    assert drv.events[0].t == 0.2 and drv.events[1].t == 0.5
    assert drv.events[0].Einj == 0.01 and drv.events[1].Einj == 0.02
    assert drv.events[0].pos == (-0.1, 0.0, 0.0)
    assert drv.events[0].Rinj == 0.2
    assert drv.n_spare_needed == 8      # 2 events x Minj/mmean
    assert drv.pending(0.1) is None
    assert drv.pending(0.3).t == 0.2
