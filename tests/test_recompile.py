"""Replan/recompile thrash gate (VERDICT r3 weak #4 / next #8): a
clustered collapse must not pay repeated recompiles after warmup.

The reference sizes its neighbour buffers from observed demand and grows
them at most once per overflow (GradhSphTree.cpp:172-185 Nneibmax
doubling); here the analogue is measured-cap planning (native walk stats
for the tree, occupancy counts for the grid) + cap-monotone hysteresis.
`SimulationBase._compile` counts every rebuild of the jitted step."""

import numpy as np
import pytest

from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import SimulationBase

pytestmark = pytest.mark.slow


def _bb_params(**over):
    p = Parameters()
    base = dict(ndim=3, sim="sph", neib_search="kdtree",
                gas_eos="isothermal", dimensionless=1, run_id="",
                Nhydro=1500, ic="bossbodenheimer",
                self_gravity=1, hydro_forces=1,
                sink_particles=1, create_sinks=1,
                rho_sink=50.0, tend=1e30, tsnapfirst=1e30)
    base.update(over)
    for k, v in base.items():
        p.set(k, v)
    p.set("mcloud", 1.0)
    p.set("radius", 1.0)
    p.set("angvel", 0.2)
    return p


class TestRecompileThrash:
    def test_boss_collapse_recompiles_once_after_warmup(self):
        """Boss-Bodenheimer collapse (the reference's star-formation
        flagship, tests/gandalf_tests.py BOSSBODENHEIMER): after the
        16-step early-collapse adjustment (h and occupancy grow by
        factors while the cloud relaxes) the run must log at most 1
        step recompile over the next 24 steps — measured caps +
        quantised monotone growth absorb the rising density contrast
        without replan thrash.  (The remaining single recompile is
        GENUINE demand growth: the max cell occupancy outgrows the
        1.35x planning slack as the core condenses.)"""
        sim = SimulationBase.factory(_bb_params())
        sim.SetupSimulation()
        for _ in range(16):
            sim.main_loop_step()
        n0 = sim.n_recompiles
        for _ in range(24):
            sim.main_loop_step()
        extra = sim.n_recompiles - n0
        assert extra <= 1, (
            f"{extra} recompiles in 24 post-warmup steps (cap thrash)")
        assert np.isfinite(np.asarray(sim.state.r)).all()
        # the run actually collapsed (density contrast grew)
        rho = np.asarray(sim.state.rho)[np.asarray(sim.state.alive)]
        assert rho.max() / rho.mean() > 3.0
