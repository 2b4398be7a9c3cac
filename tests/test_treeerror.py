"""Tree force-accuracy gates (analogues of the reference paper tests
tests/paper_tests/treeerror.py — RMS force error vs MAC theta — and
treescaling.py — tree vs brute-force cost scaling)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from gandalf_tpu.kernels.smoothing import kernel_factory
from gandalf_tpu.ops.gravity import direct_nbody
from gandalf_tpu.ops.tree import (plan_buckets_kd, plan_tree_for_buckets,
                                  tree_gravity_grouped)


def _cloud(N=4096, seed=2):
    rng = np.random.default_rng(seed)
    n_side = round(N ** (1 / 3))
    g = np.stack(np.meshgrid(*[np.arange(n_side)] * 3, indexing="ij"),
                 -1).reshape(-1, 3) / n_side
    r = g + 0.25 / n_side * rng.standard_normal(g.shape)
    m = np.full(len(r), 1.0 / len(r))
    return np.asarray(r), m


def _rms_err(theta_sqd, quadrupole, fast=False, N=4096):
    r, m = _cloud(N)
    a_ref = np.asarray(direct_nbody(jnp.asarray(r), jnp.zeros_like(r),
                                    jnp.asarray(m), compute_jerk=False).a)
    gmap = plan_buckets_kd(r, leaf_size=16)
    spec = plan_tree_for_buckets(gmap, theta_sqd=theta_sqd,
                                 quadrupole=quadrupole, fast=fast)
    a_t, _, ov = tree_gravity_grouped(spec, jnp.asarray(gmap),
                                      jnp.asarray(r), jnp.asarray(m))
    assert not bool(ov), "tree overflow"
    err = np.linalg.norm(np.asarray(a_t) - a_ref, axis=1)
    scale = np.linalg.norm(a_ref, axis=1)
    return float(np.sqrt(np.mean((err / np.maximum(scale, 1e-30)) ** 2)))


class TestTreeError:
    """Reference figure: error decreases with theta and multipole order."""

    def test_error_decreases_with_theta(self):
        errs = [_rms_err(t, quadrupole=True) for t in (0.5, 0.2, 0.05)]
        assert errs[0] > errs[1] > errs[2]

    def test_quadrupole_beats_monopole(self):
        e_mono = _rms_err(0.3, quadrupole=False)
        e_quad = _rms_err(0.3, quadrupole=True)
        assert e_quad < e_mono

    def test_absolute_gates(self):
        # geometric MAC at the default theta^2 = 0.1 with quadrupoles:
        # sub-0.1% RMS force error (reference treeerror.py figure level)
        assert _rms_err(0.1, quadrupole=True) < 1e-3
        assert _rms_err(0.1, quadrupole=False) < 1e-2

    def test_fast_multipole_close_to_exact(self):
        e_fast = _rms_err(0.1, quadrupole=True, fast=True)
        # the cell-centred Taylor far field trades accuracy for speed: the
        # group-level expansion truncates at the acceleration Jacobian, so
        # the error is set by the group size, not theta (reference fast
        # multipole shows the same behaviour) — gate the absolute level
        assert e_fast < 5e-3


def test_tree_scaling_vs_bruteforce():
    """treescaling.py analogue: the tree's pair-interaction count per
    particle stays bounded as N grows (O(N log N) total), while brute
    force is O(N) per particle."""
    counts = {}
    for N in (4096, 32768):
        r, m = _cloud(N)
        gmap = plan_buckets_kd(r, leaf_size=16)
        spec = plan_tree_for_buckets(gmap, theta_sqd=0.1, quadrupole=True)
        # near-field pair work per particle ~ near_cap * leaf_size, which
        # plan keeps N-independent; depth grows logarithmically
        counts[N] = (spec.near_cap * spec.leaf_size, spec.depth)
    (pairs_small, depth_small), (pairs_big, depth_big) = \
        counts[4096], counts[32768]
    assert pairs_big <= 1.5 * pairs_small          # near work ~ constant
    assert depth_big - depth_small == 3            # log2(8x particles)
    # brute-force would be 8x: the tree's per-particle near work is far
    # below N at the larger size
    assert pairs_big < 0.25 * 32768


class TestMacOptions:
    """gadget2 and eigenmac opening criteria (KDTree.cpp:824-843 +
    Tree.h:413-432): both ADD accuracy-driven openings on top of the
    geometric MAC, so the force error must not exceed geometric's."""

    def test_mac_variants_tighten_error(self):
        import dataclasses as dc

        import jax.numpy as jnp

        from gandalf_tpu.kernels.smoothing import kernel_factory
        from gandalf_tpu.ops.tree import (plan_buckets_kd,
                                          plan_tree_for_buckets,
                                          tree_gravity_grouped)

        rng = np.random.default_rng(12)
        N = 4096
        # clustered distribution: MAC differences show up off-lattice
        r = rng.standard_normal((N, 3)) * np.array([1.0, 0.7, 0.5])
        m = np.full(N, 1.0 / N)
        h = np.full(N, 1e-3)
        kern = kernel_factory("m4", 3)
        gmap = plan_buckets_kd(r, leaf_size=32)

        # direct oracle
        rj = jnp.asarray(r)
        dr = rj[None, :, :] - rj[:, None, :]
        drsqd = jnp.sum(dr * dr, -1)
        eye = jnp.asarray(np.eye(N, dtype=bool))
        inv = jnp.where(eye, 0.0, 1.0 / jnp.sqrt(jnp.maximum(drsqd, 1e-30)))
        w = jnp.where(eye, 0.0, jnp.asarray(m)[None, :]) * inv ** 3
        a_ref = np.asarray(jnp.sum(w[..., None] * dr, 1))
        amag = jnp.sqrt(jnp.asarray((a_ref ** 2).sum(-1)))
        gpot = jnp.asarray(np.asarray(jnp.sum(
            jnp.where(eye, 0.0, jnp.asarray(m)[None, :]) * inv, 1)))

        errs = {}
        for mac in ("geometric", "gadget2", "eigenmac"):
            spec = plan_tree_for_buckets(
                gmap, theta_sqd=0.3, quadrupole=False, fast=False,
                near_cap=256, frontier=576, mac=mac, macerror=2e-4)
            kw = {}
            if mac == "gadget2":
                kw["amag"] = amag
            elif mac == "eigenmac":
                kw["gpot_prev"] = gpot
            a_t, _, ovf = tree_gravity_grouped(
                spec, jnp.asarray(gmap), rj, jnp.asarray(m),
                jnp.asarray(h), kern, **kw)
            assert not bool(ovf), mac
            rel = np.linalg.norm(np.asarray(a_t) - a_ref, axis=-1) \
                / np.linalg.norm(a_ref, axis=-1)
            errs[mac] = float(np.median(rel))
        # accuracy MACs only open MORE cells
        assert errs["gadget2"] <= errs["geometric"] * 1.001, errs
        assert errs["eigenmac"] <= errs["geometric"] * 1.001, errs
        # and they must actually engage (strictly tighter on this config)
        assert errs["gadget2"] < 0.7 * errs["geometric"], errs
        assert errs["eigenmac"] < 0.9 * errs["geometric"], errs


def test_grid_path_subquadratic_scaling():
    """treescaling.py analogue (tests/paper_tests/treescaling.py:20-60):
    measured WALL TIME of the production path must scale sub-quadratically
    with N (the all-pairs path is O(N^2)).  Lenient 0.6*quadratic bound —
    this is a scaling smoke test, not a microbenchmark."""
    import time

    import numpy as np

    from gandalf_tpu.params import Parameters
    from gandalf_tpu.sim.simulation import GradhSphSimulation

    def run(n_side, steps=3):
        p = Parameters()
        for k, v in {"ndim": 3, "sim": "gradhsph", "ic": "box",
                     "run_id": "", "dimensionless": 1,
                     "gas_eos": "energy_eqn", "rhofluid1": 1.0,
                     "press1": 1.0, "self_gravity": 1,
                     "neib_search": "kdtree", "tend": 1e30}.items():
            p.set(k, v)
        for k in range(3):
            p.set(f"Nlattice1[{k}]", n_side)
            p.set(f"boxmin[{k}]", 0.0)
            p.set(f"boxmax[{k}]", 1.0)
            p.set(f"boundary_lhs[{k}]", "periodic")
            p.set(f"boundary_rhs[{k}]", "periodic")
        sim = GradhSphSimulation(p)
        sim.SetupSimulation()
        sim.main_loop_step()          # compile + warm
        t0 = time.perf_counter()
        for _ in range(steps):
            sim.main_loop_step()
        return (time.perf_counter() - t0) / steps

    t_small = run(10)        # N = 1000
    t_big = run(20)          # N = 8000 (8x)
    ratio = t_big / max(t_small, 1e-9)
    # O(N^2) would be 64x; O(N) is 8x.  Allow generous noise headroom.
    assert ratio < 0.6 * 64, f"scaling ratio {ratio:.1f} (quadratic=64)"
