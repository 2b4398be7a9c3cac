"""Barnes-Hut tree gravity vs direct summation (the reference validates its
tree the same way: tests/paper_tests/treeerror.py force error vs theta, and
gtest KD-tree invariants in src/UnitTesting/TestTree.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gandalf_tpu.ops.gravity import direct_nbody
from gandalf_tpu.ops.tree import (build_tree, morton_codes, plan_tree,
                                  tree_gravity_all)


@pytest.fixture(scope="module")
def cluster():
    rng = np.random.default_rng(5)
    N = 3000
    # Plummer-ish cluster: concentrated centre + halo
    r = rng.standard_normal((N, 3))
    r *= (1.0 + (rng.random(N) * 2) ** 2)[:, None] / 3.0
    m = rng.random(N) * (2.0 / N)
    return jnp.asarray(r), jnp.asarray(m)


def force_error(a_tree, a_ref):
    num = np.linalg.norm(np.asarray(a_tree - a_ref), axis=-1)
    den = np.linalg.norm(np.asarray(a_ref), axis=-1)
    return num / den


def test_monopole_accuracy(cluster):
    r, m = cluster
    a_ref = direct_nbody(r, r * 0, m, compute_jerk=False).a
    spec = plan_tree(r.shape[0], theta_sqd=0.1, quadrupole=False)
    a, gpot, overflow = jax.jit(
        lambda r, m: tree_gravity_all(spec, r, m))(r, m)
    assert not bool(overflow)
    err = force_error(a, a_ref)
    assert np.median(err) < 3e-3
    assert err.mean() < 1e-2


def test_quadrupole_beats_monopole(cluster):
    r, m = cluster
    a_ref = direct_nbody(r, r * 0, m, compute_jerk=False).a
    errs = {}
    for quad in (False, True):
        spec = plan_tree(r.shape[0], theta_sqd=0.3, quadrupole=quad)
        a, _, overflow = jax.jit(
            lambda r, m: tree_gravity_all(spec, r, m))(r, m)
        assert not bool(overflow)
        errs[quad] = force_error(a, a_ref).mean()
    assert errs[True] < 0.5 * errs[False]


def test_theta_controls_error(cluster):
    r, m = cluster
    a_ref = direct_nbody(r, r * 0, m, compute_jerk=False).a
    errs = []
    for th in (0.5, 0.2, 0.05):
        spec = plan_tree(r.shape[0], theta_sqd=th, quadrupole=False)
        a, _, _ = jax.jit(lambda r, m: tree_gravity_all(spec, r, m))(r, m)
        errs.append(force_error(a, a_ref).mean())
    assert errs[0] > errs[1] > errs[2]


def test_potential_accuracy(cluster):
    r, m = cluster
    g_ref = direct_nbody(r, r * 0, m, compute_jerk=False).gpot
    spec = plan_tree(r.shape[0], theta_sqd=0.1)
    _, gpot, _ = jax.jit(lambda r, m: tree_gravity_all(spec, r, m))(r, m)
    rel = np.abs(np.asarray(gpot - g_ref)) / np.asarray(g_ref)
    assert np.median(rel) < 1e-3


def test_octtree_bucket_layout_accuracy(cluster):
    """neib_search=octtree selects Morton-octant-run buckets (the
    reference OctTree's Morton cell structure, src/Tree/OctTree.cpp:210)
    under the same implicit walk — force accuracy must match the KD
    layout's gate."""
    from gandalf_tpu.ops.tree import (plan_buckets, plan_tree_for_buckets,
                                      tree_gravity_grouped)

    r, m = cluster
    a_ref = direct_nbody(r, r * 0, m, compute_jerk=False).a
    gmap = plan_buckets(np.asarray(r), leaf_size=32)
    # every particle appears exactly once in the gather map
    flat = np.asarray(gmap).ravel()
    assert np.array_equal(np.sort(flat[flat >= 0]), np.arange(r.shape[0]))
    spec = plan_tree_for_buckets(gmap, theta_sqd=0.1, quadrupole=True)
    a, gpot, overflow = tree_gravity_grouped(spec, jnp.asarray(gmap), r, m)
    assert not bool(overflow)
    err = force_error(a, a_ref)
    assert np.median(err) < 3e-3
    assert err.mean() < 1e-2


def test_octtree_param_selects_octant_planner():
    """The simulation-level tree factory switch (reference
    HydroTree::CreateTree, src/Tree/HydroTree.cpp:151-192)."""
    from gandalf_tpu.params import Parameters
    from gandalf_tpu.sim.simulation import GradhSphSimulation

    rng = np.random.default_rng(7)
    r = rng.random((500, 3))
    gmaps = {}
    for tree_type in ("kdtree", "octtree"):
        p = Parameters()
        for k, v in {"sim": "gradhsph", "ic": "box", "ndim": 3,
                     "dimensionless": 1, "self_gravity": 1,
                     "neib_search": tree_type,
                     "Nlattice1[0]": 8, "Nlattice1[1]": 8,
                     "Nlattice1[2]": 8}.items():
            p.set(k, v)
        sim = GradhSphSimulation(p)
        sim.process_parameters()
        from gandalf_tpu.state import make_sph_state
        sim.state = make_sph_state(r, np.zeros_like(r),
                                   np.full(len(r), 1.0 / len(r)),
                                   np.full(len(r), 0.1),
                                   np.full(len(r), 1.0))
        sim._plan_tree_buckets(r)
        gmaps[tree_type] = np.asarray(sim.state.bucket_map)
        flat = gmaps[tree_type].ravel()
        assert np.array_equal(np.sort(flat[flat >= 0]), np.arange(len(r)))
    # the two layouts genuinely differ
    assert gmaps["kdtree"].shape != gmaps["octtree"].shape or \
        not np.array_equal(gmaps["kdtree"], gmaps["octtree"])


class TestListedWalk:
    """Listed (drift-skin) gravity walk: host-cached interaction lists
    (ops.tree.plan_walk_lists / tree_gravity_listed) must match the
    per-step frontier walk's accuracy gates, and the in-jit drift check
    must invalidate the lists once any particle leaves the skin (the
    Verlet-list criterion).  Replaces the per-step walk of the reference
    Tree::ComputeGravityInteractionAndGhostList (src/Tree/Tree.cpp:628)."""

    def _listed(self, r, m, gmap, margin, h=None, kern=None, zh=None,
                pext=None, **kw):
        import dataclasses

        from gandalf_tpu.ops.tree import (plan_tree_for_buckets,
                                          plan_walk_lists,
                                          tree_gravity_listed)

        spec = plan_tree_for_buckets(gmap, theta_sqd=0.1, quadrupole=True)
        lw = plan_walk_lists(gmap, np.asarray(r), np.asarray(m),
                             np.asarray(h) if h is not None else None,
                             theta_sqd=0.1,
                             kernrange=kern.kernrange if kern else 2.0,
                             margin=margin, periodic_extent=pext)
        if lw is None:
            pytest.skip("native planner unavailable")
        spec = dataclasses.replace(
            spec, near_cap=lw.near.shape[1], mp_cap=lw.mp.shape[1],
            support_cap=max(32, -(-int(1.2 * max(lw.sup_max, 1)) // 32)
                            * 32))
        return lw, tree_gravity_listed(
            spec, jnp.asarray(gmap), jnp.asarray(lw.mp),
            jnp.asarray(lw.near), jnp.asarray(lw.r_plan),
            jnp.asarray(lw.anchors), lw.margin, r, m, h=h, kern=kern,
            zh=zh, periodic_extent=pext, **kw)

    def test_matches_oracle(self, cluster):
        from gandalf_tpu.ops.tree import plan_buckets_kd

        r, m = cluster
        a_ref = direct_nbody(r, r * 0, m, compute_jerk=False).a
        gmap = plan_buckets_kd(np.asarray(r), leaf_size=32)
        _, (a, gpot, ovf) = self._listed(r, m, gmap, margin=0.01)
        assert not bool(ovf)
        err = force_error(a, a_ref)
        assert np.median(err) < 3e-3 and err.mean() < 1e-2

    def test_drift_triggers_overflow(self, cluster):
        from gandalf_tpu.ops.tree import plan_buckets_kd

        r, m = cluster
        gmap = plan_buckets_kd(np.asarray(r), leaf_size=32)
        lw, (_, _, ovf0) = self._listed(r, m, gmap, margin=0.01)
        assert not bool(ovf0)
        r2 = np.asarray(r).copy()
        r2[42] += 0.05                      # beyond the 0.01 skin
        import dataclasses

        from gandalf_tpu.ops.tree import (plan_tree_for_buckets,
                                          tree_gravity_listed)

        spec = plan_tree_for_buckets(gmap, theta_sqd=0.1, quadrupole=True)
        spec = dataclasses.replace(spec, near_cap=lw.near.shape[1],
                                   mp_cap=lw.mp.shape[1])
        _, _, ovf = tree_gravity_listed(
            spec, jnp.asarray(gmap), jnp.asarray(lw.mp),
            jnp.asarray(lw.near), jnp.asarray(lw.r_plan),
            jnp.asarray(lw.anchors), lw.margin, jnp.asarray(r2), m)
        assert bool(ovf)

    def test_smoothed_periodic_matches_frontier(self):
        """Kernel-softened near field + periodic bucket unwrap: listed vs
        frontier agree to MAC-error level on a periodic jittered box."""
        from gandalf_tpu.kernels.smoothing import kernel_factory
        from gandalf_tpu.ops.tree import (plan_buckets_kd,
                                          plan_tree_for_buckets,
                                          tree_gravity_grouped)

        rng = np.random.default_rng(9)
        n_side = 12
        g = np.stack(np.meshgrid(*[np.arange(n_side)] * 3, indexing="ij"),
                     -1).reshape(-1, 3) / n_side
        r = np.mod(g + 0.25 / n_side * rng.standard_normal(g.shape), 1.0)
        N = len(r)
        m = np.full(N, 1.0 / N)
        h = np.full(N, 1.2 / n_side)
        zh = jnp.asarray(0.01 * rng.standard_normal(N) / h ** 4)
        kern = kernel_factory("m4", 3)
        rj, mj, hj = jnp.asarray(r), jnp.asarray(m), jnp.asarray(h)
        pext = [1.0, 1.0, 1.0]
        gmap = plan_buckets_kd(r, leaf_size=32)
        _, (a_l, _, ovf) = self._listed(rj, mj, gmap, margin=0.005,
                                        h=hj, kern=kern, zh=zh, pext=pext)
        assert not bool(ovf)
        spec = plan_tree_for_buckets(gmap, theta_sqd=0.1, quadrupole=True)
        a_f, _, _ = tree_gravity_grouped(spec, jnp.asarray(gmap), rj, mj,
                                         h=hj, kern=kern, zh=zh,
                                         periodic_extent=pext)
        rel = np.linalg.norm(np.asarray(a_l - a_f), axis=1) \
            / np.maximum(np.linalg.norm(np.asarray(a_f), axis=1), 1e-30)
        assert np.median(rel) < 1e-3
        assert rel.max() < 2e-2


def test_tree_mass_conservation(cluster):
    """Root cell must hold the total mass and COM (KD-tree invariant test,
    src/UnitTesting/TestTree.cpp:36-57 analogue)."""
    r, m = cluster
    N = r.shape[0]
    spec = plan_tree(N)
    lo = jnp.min(r, axis=0)
    extent = jnp.max(r, axis=0) - lo
    order = jnp.argsort(morton_codes(r, lo, extent))
    pad = spec.n_pad - N
    r_s = jnp.concatenate([r[order], jnp.full((pad, 3), 1e15)])
    m_s = jnp.concatenate([m[order], jnp.zeros(pad)])
    alive = jnp.concatenate([jnp.ones(N, bool), jnp.zeros(pad, bool)])
    tree = build_tree(spec, r_s, m_s, alive)
    assert float(tree.m[0][0]) == pytest.approx(float(m.sum()), rel=1e-12)
    com_ref = np.asarray((m[:, None] * r).sum(0) / m.sum())
    np.testing.assert_allclose(np.asarray(tree.com[0][0]), com_ref,
                               rtol=1e-10)
    # every level conserves mass
    for ml in tree.m:
        assert float(ml.sum()) == pytest.approx(float(m.sum()), rel=1e-12)
