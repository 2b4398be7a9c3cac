"""Mirror-wall boundaries on the structured-grid path vs the image-based
all-pairs oracle.

The reference builds explicit mirror ghost particles and searches them
through the tree (src/Hydrodynamics/Ghosts.cpp,
src/Headers/GhostNeighbours.hpp); the grid path reproduces this with a
dedicated image-cell layer beyond each wall (ops/sph_grid27:
plan_grid27 + grid_mirror_extend).  These gates pin the grid results to
the dense mirror-image path that the reference regression tests already
validate.
"""

import jax
import numpy as np
import pytest

from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.simulation import GradhSphSimulation
from gandalf_tpu.state import make_sph_state


def make_mirror_params(n_side=8, ndim=3, neib="kdtree",
                       walls=((0, "mirror", "mirror"),)):
    p = Parameters()
    updates = {
        "run_id": "MIRTEST", "sim": "gradhsph", "ic": "box", "ndim": ndim,
        "dimensionless": 1, "gas_eos": "energy_eqn", "gamma_eos": 1.4,
        "rhofluid1": 1.0, "press1": 1.0, "tend": 1.0e30,
        "tsnapfirst": 1.0e30, "neib_search": neib,
    }
    wall_of = {k: (lhs, rhs) for (k, lhs, rhs) in walls}
    for k in range(ndim):
        updates[f"boxmin[{k}]"] = 0.0
        updates[f"boxmax[{k}]"] = 1.0
        lhs, rhs = wall_of.get(k, ("periodic", "periodic"))
        updates[f"boundary_lhs[{k}]"] = lhs
        updates[f"boundary_rhs[{k}]"] = rhs
        updates[f"Nlattice1[{k}]"] = n_side
    for k, v in updates.items():
        p.set(k, v)
    return p


def jittered_state(sim, walls, seed=7, jitter=0.2):
    from gandalf_tpu.sim.ic import generate_ic

    ic = generate_ic(sim.params, sim.eos)
    rng = np.random.default_rng(seed)
    spacing = 1.0 / round(len(ic["m"]) ** (1.0 / sim.ndim))
    r = ic["r"] + jitter * spacing * rng.standard_normal(ic["r"].shape)
    wall_dims = {k for (k, _, _) in walls}
    for k in range(sim.ndim):
        if k in wall_dims:
            r[:, k] = np.clip(r[:, k], 1e-4, 1.0 - 1e-4)
        else:
            r[:, k] = np.mod(r[:, k], 1.0)
    ic["r"] = r
    ic["v"] = 0.1 * rng.standard_normal(ic["v"].shape)
    return make_sph_state(ic["r"], ic["v"], ic["m"], ic["h"], ic["u"])


def _pair(walls, ndim=3, n_side=8):
    sims = {}
    for neib in ("bruteforce", "kdtree"):
        sim = GradhSphSimulation(
            make_mirror_params(n_side=n_side, ndim=ndim, neib=neib,
                               walls=walls))
        sim.process_parameters()
        sims[neib] = sim
    assert not sims["bruteforce"].use_celllist
    assert sims["kdtree"].use_celllist, \
        "mirror walls must run on the grid path for the plain config"
    state = jittered_state(sims["bruteforce"], walls)
    sims["kdtree"]._plan_grid(state.r, state.h)
    out = {}
    for neib, sim in sims.items():
        out[neib] = jax.jit(sim._build_bootstrap())(state)
    return out


FIELDS = ["h", "rho", "invomega", "hfactor", "u", "pressure", "sound",
          "dudt", "div_v"]


class TestMirrorDim0:
    """Mirror walls on the grid's slab axis (both sides)."""

    @pytest.fixture(scope="class")
    def pair(self):
        return _pair(walls=((0, "mirror", "mirror"),))

    @pytest.mark.parametrize("field", FIELDS)
    def test_field(self, pair, field):
        bf = np.asarray(getattr(pair["bruteforce"], field))
        cl = np.asarray(getattr(pair["kdtree"], field))
        np.testing.assert_allclose(cl, bf, rtol=1e-10, atol=1e-12)

    def test_accel(self, pair):
        np.testing.assert_allclose(np.asarray(pair["kdtree"].a),
                                   np.asarray(pair["bruteforce"].a),
                                   rtol=1e-9, atol=1e-10)

    def test_no_overflow(self, pair):
        assert not bool(pair["kdtree"].neib_overflow)


class TestMirrorMixed:
    """One-sided wall on dim 1 + mirror lhs on dim 2, periodic dim 0."""

    @pytest.fixture(scope="class")
    def pair(self):
        return _pair(walls=((1, "mirror", "wall"), (2, "open", "mirror")))

    @pytest.mark.parametrize("field", FIELDS)
    def test_field(self, pair, field):
        bf = np.asarray(getattr(pair["bruteforce"], field))
        cl = np.asarray(getattr(pair["kdtree"], field))
        np.testing.assert_allclose(cl, bf, rtol=1e-10, atol=1e-12)

    def test_accel(self, pair):
        np.testing.assert_allclose(np.asarray(pair["kdtree"].a),
                                   np.asarray(pair["bruteforce"].a),
                                   rtol=1e-9, atol=1e-10)


def test_mirror_1d_grid():
    """1D column with mirror walls: grid path matches the oracle."""
    pair = _pair(walls=((0, "mirror", "mirror"),), ndim=1, n_side=64)
    for f in ("rho", "pressure"):
        np.testing.assert_allclose(np.asarray(getattr(pair["kdtree"], f)),
                                   np.asarray(getattr(pair["bruteforce"],
                                                      f)),
                                   rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pair["kdtree"].a),
                               np.asarray(pair["bruteforce"].a),
                               rtol=1e-9, atol=1e-10)
