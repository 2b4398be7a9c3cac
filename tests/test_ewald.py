"""Ewald periodic self-gravity (reference src/Common/Ewald.cpp).

Validation strategy: the Ewald split must be independent of the splitting
parameter alpha (both tables represent the same conditionally-convergent
image sum), exact symmetry zeros at half-cell separations, antisymmetry,
and momentum conservation through the full force pass.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from gandalf_tpu.ops.ewald import (build_ewald_table, ewald_correction,
                                   ewald_pair_gravity)
from gandalf_tpu.state import DomainBox


def _box(L=1.0):
    from gandalf_tpu.state import PERIODIC

    return DomainBox(ndim=3, boxmin=(0.0,) * 3, boxmax=(L,) * 3,
                     lhs=(PERIODIC,) * 3, rhs=(PERIODIC,) * 3)


@pytest.fixture(scope="module")
def table():
    return build_ewald_table([1.0, 1.0, 1.0], ngrid=17)


class TestEwaldTable:
    def test_alpha_independence(self, table):
        tab2 = build_ewald_table([1.0, 1.0, 1.0], ngrid=17, nseries=6,
                                 ewald_mult=1.3)
        assert np.abs(np.asarray(table.acc)
                      - np.asarray(tab2.acc)).max() < 1e-10
        assert np.abs(np.asarray(table.pot)
                      - np.asarray(tab2.pot)).max() < 1e-10

    def test_symmetry_zeros(self, table):
        """At dr = (L/2,0,0) and (L/2,L/2,L/2) the TOTAL periodic force
        vanishes by symmetry, so the correction equals minus the direct
        Newtonian term."""
        for dr0 in ([0.5, 0.0, 0.0], [0.5, 0.5, 0.5], [0.0, 0.0, 0.5]):
            dr = jnp.asarray([dr0])
            ac, _ = ewald_correction(table, dr)
            newt = np.asarray(dr0) / np.linalg.norm(dr0) ** 3
            assert np.abs(np.asarray(ac[0]) + newt).max() < 1e-12

    def test_antisymmetry(self, table):
        rng = np.random.default_rng(5)
        d = rng.uniform(-0.5, 0.5, (32, 3))
        ap, _ = ewald_correction(table, jnp.asarray(d))
        am, _ = ewald_correction(table, jnp.asarray(-d))
        assert np.abs(np.asarray(ap) + np.asarray(am)).max() < 1e-12

    def test_correction_small_at_small_r(self, table):
        """Close pairs are dominated by the direct term: |corr| << 1/r^2."""
        dr = jnp.asarray([[0.05, 0.02, 0.01]])
        ac, _ = ewald_correction(table, dr)
        newt = 1.0 / np.sum(np.asarray(dr[0]) ** 2)
        assert np.linalg.norm(np.asarray(ac[0])) < 0.2 * newt


class TestMixedPeriodicityEwald:
    """Mixed-periodicity Ewald (reference ewald_periodicity 1-6,
    Ewald.cpp:149-420): 2D-periodic closed erfc forms, 1D-periodic
    quadrature + renormalised log term, analytic sheet/line far fields
    beyond the table range."""

    def test_2p_alpha_independence(self):
        """The real/reciprocal split must cancel the splitting parameter:
        tables at different alpha/nseries represent the same sum."""
        t1 = build_ewald_table([1.0] * 3, ngrid=9,
                               periodic=(True, True, False))
        t2 = build_ewald_table([1.0] * 3, ngrid=9, nseries=6,
                               ewald_mult=1.3, periodic=(True, True, False))
        assert np.abs(np.asarray(t1.acc) - np.asarray(t2.acc)).max() < 1e-10
        assert np.abs(np.asarray(t1.pot) - np.asarray(t2.pot)).max() < 1e-10

    def test_1p_alpha_independence(self):
        t1 = build_ewald_table([1.0] * 3, ngrid=9,
                               periodic=(True, False, False))
        t2 = build_ewald_table([1.0] * 3, ngrid=9, nseries=6,
                               ewald_mult=1.3, periodic=(True, False, False))
        assert np.abs(np.asarray(t1.acc) - np.asarray(t2.acc)).max() < 1e-10
        assert np.abs(np.asarray(t1.pot) - np.asarray(t2.pot)).max() < 1e-10

    @staticmethod
    def _brute_images(dr, N, axes):
        """Direct image-sum acceleration with Richardson extrapolation in
        the (slowly 1/N-converging) image count."""
        def partial(NN):
            n = np.arange(-NN, NN + 1)
            if len(axes) == 1:
                off = np.zeros((len(n), 3))
                off[:, axes[0]] = n
            else:
                NA, NB = np.meshgrid(n, n, indexing="ij")
                off = np.zeros(NA.shape + (3,))
                off[..., axes[0]] = NA
                off[..., axes[1]] = NB
                off = off.reshape(-1, 3)
            rn = dr[None, :] + off
            d = np.linalg.norm(rn, axis=1)
            return (rn / d[:, None] ** 3).sum(0)
        return 2.0 * partial(2 * N) - partial(N)

    def test_2p_brute_image_oracle(self):
        """Total (direct + correction) force vs the direct image sum over
        the periodic plane lattice."""
        tab = build_ewald_table([1.0] * 3, ngrid=9,
                                periodic=(True, True, False))
        for p in ([0.23, 0.11, 0.4], [0.4, 0.45, 0.05], [0.1, 0.2, 1.2]):
            p = np.asarray(p)
            a_ref = self._brute_images(p, 48, (0, 1))
            ac, _ = ewald_correction(tab, jnp.asarray(p[None, :]))
            a_tab = np.asarray(ac[0]) + p / np.linalg.norm(p) ** 3
            assert np.abs(a_tab - a_ref).max() < 5e-3, (p, a_tab, a_ref)

    def test_1p_brute_image_oracle(self):
        tab = build_ewald_table([1.0] * 3, ngrid=9,
                                periodic=(False, False, True))
        for p in ([0.11, 0.4, 0.23], [0.45, 0.05, 0.4], [1.2, 0.2, 0.1]):
            p = np.asarray(p)
            a_ref = self._brute_images(p, 200, (2,))
            ac, _ = ewald_correction(tab, jnp.asarray(p[None, :]))
            a_tab = np.asarray(ac[0]) + p / np.linalg.norm(p) ** 3
            assert np.abs(a_tab - a_ref).max() < 5e-3, (p, a_tab, a_ref)

    def test_far_field_continuity(self):
        """The analytic line/sheet far field must join the table smoothly
        at the switch radius (acc and pot)."""
        for per in ((True, False, False), (True, True, False)):
            tab = build_ewald_table([1.0] * 3, ngrid=9, periodic=per)
            oax = tab.open_axes[0]
            edge = tab.far_thresh[oax]
            lo = np.array([0.2, 0.3, 0.3])
            hi = lo.copy()
            lo[oax], hi[oax] = edge - 1e-4, edge + 1e-4
            a_lo, p_lo = ewald_correction(tab, jnp.asarray(lo[None, :]))
            a_hi, p_hi = ewald_correction(tab, jnp.asarray(hi[None, :]))
            assert np.abs(np.asarray(a_lo) - np.asarray(a_hi)).max() < 1e-3
            # pot has a genuine O(acc * dz) slope across the interval
            # (acc = -grad pot); the jump minus the trapezoid-integrated
            # slope isolates the table/far-formula mismatch
            slope = -0.5 * float(a_lo[0][oax] + a_hi[0][oax])
            dpot = float(p_hi[0]) - float(p_lo[0])
            assert abs(dpot - slope * 2e-4) < 3e-4

    def test_2p_sheet_limit(self):
        """Far beyond the table the field is the uniform sheet:
        acc -> 2 pi / A toward the plane (reference accPlane,
        Ewald.cpp:604-620)."""
        tab = build_ewald_table([1.0] * 3, ngrid=9,
                                periodic=(True, True, False))
        p = np.array([0.13, 0.27, 5.0])
        ac, _ = ewald_correction(tab, jnp.asarray(p[None, :]))
        total = np.asarray(ac[0]) + p / np.linalg.norm(p) ** 3
        assert abs(total[2] - 2.0 * np.pi) < 1e-6
        assert np.abs(total[:2]).max() < 1e-6

    def test_slab_sim_tree_path_runs(self):
        """Full controller on a slab box (periodic x,y / open z) with
        ewald = 1: the mixed table feeds the tree walk (zero-extent open
        dims disable the min-image wrap) and momentum stays conserved."""
        from gandalf_tpu.params import Parameters
        from gandalf_tpu.sim.simulation import SimulationBase

        p = Parameters()
        for k, v in dict(
                ndim=3, sim="gradhsph", ic="box", run_id="",
                dimensionless=1, gas_eos="energy_eqn",
                self_gravity=1, hydro_forces=1, ewald=1,
                rhofluid1=1.0, press1=1.0, neib_search="kdtree",
                **{"Nlattice1[0]": 8, "Nlattice1[1]": 8, "Nlattice1[2]": 8,
                   "boxmin[0]": 0.0, "boxmax[0]": 1.0,
                   "boxmin[1]": 0.0, "boxmax[1]": 1.0,
                   "boxmin[2]": 0.0, "boxmax[2]": 1.0},
                **{f"boundary_lhs[{k}]": "periodic" for k in range(2)},
                **{f"boundary_rhs[{k}]": "periodic" for k in range(2)}
        ).items():
            p.set(k, v)
        sim = SimulationBase.factory(p)
        sim.SetupSimulation()
        assert sim.use_ewald and sim.ewald_table.far_kind == 2
        for _ in range(3):
            sim.main_loop_step()
        s = sim.state
        assert np.isfinite(np.asarray(s.v)).all()
        mom = (np.asarray(s.m)[:, None] * np.asarray(s.v)).sum(0)
        assert np.abs(mom).max() < 1e-8


class TestEwaldPairGravity:
    def test_momentum_conserving(self, table):
        rng = np.random.default_rng(11)
        r = jnp.asarray(rng.uniform(0, 1, (24, 3)))
        m = jnp.asarray(rng.uniform(0.5, 1.5, 24))
        a, gpot = ewald_pair_gravity(table, _box(), r, m)
        ptot = np.asarray(m)[:, None] * np.asarray(a)
        assert np.abs(ptot.sum(0)).max() < 1e-12
        assert np.isfinite(np.asarray(gpot)).all()

    def test_uniform_lattice_total_force_zero(self, table):
        """A perfect periodic lattice feels no net gravity: the direct
        minimum-image sum plus the Ewald correction cancels exactly (the
        correction alone is nonzero at half-cell separations, where the
        minimum image is ambiguous — only the total is well defined)."""
        box = _box()
        n = 4
        g = (np.arange(n) + 0.5) / n
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        r = jnp.asarray(np.stack([X, Y, Z], -1).reshape(-1, 3))
        m = jnp.ones(r.shape[0])
        a_e, _ = ewald_pair_gravity(table, box, r, m)
        dr = box.min_image(r[None, :, :] - r[:, None, :])
        d2 = jnp.sum(dr * dr, -1)
        eye = jnp.eye(r.shape[0], dtype=bool)
        inv3 = jnp.where(eye, 0.0, jnp.where(d2 > 0, d2, 1.0) ** -1.5)
        a_d = jnp.sum((m[None, :] * inv3)[..., None] * dr, axis=1)
        total = np.asarray(a_e + a_d)
        # scale: single-pair force at lattice spacing is 1/0.25^2 = 16
        assert np.abs(total).max() < 0.05


class TestPeriodicSelfGravitySim:
    def test_periodic_jeans_box_runs(self):
        """Full controller: periodic 3D box with self-gravity no longer
        raises and conserves momentum over steps."""
        from gandalf_tpu.params import Parameters
        from gandalf_tpu.sim.simulation import GradhSphSimulation

        p = Parameters()
        for k, v in {
                "ndim": 3, "sim": "sph", "ic": "box",
                "Nlattice1[0]": 4, "Nlattice1[1]": 4, "Nlattice1[2]": 4,
                "dimensionless": 1, "run_id": "",
                "boxmin[0]": 0.0, "boxmax[0]": 1.0,
                "boxmin[1]": 0.0, "boxmax[1]": 1.0,
                "boxmin[2]": 0.0, "boxmax[2]": 1.0,
                "boundary_lhs[0]": "periodic", "boundary_rhs[0]": "periodic",
                "boundary_lhs[1]": "periodic", "boundary_rhs[1]": "periodic",
                "boundary_lhs[2]": "periodic", "boundary_rhs[2]": "periodic",
                "gas_eos": "energy_eqn", "self_gravity": 1,
                "hydro_forces": 1, "neib_search": "bruteforce",
                "rhofluid1": 1.0, "press1": 1.0,
        }.items():
            p.set(k, v)
        sim = GradhSphSimulation(p)
        sim.SetupSimulation()
        assert sim.use_ewald and sim.ewald_table is not None
        for _ in range(5):
            sim.main_loop_step()
        s = sim.state
        assert np.isfinite(np.asarray(s.v)).all()
        mom = (np.asarray(s.m)[:, None] * np.asarray(s.v)).sum(0)
        assert np.abs(mom).max() < 1e-10


class TestEwaldTreeWalk:
    """Ewald corrections INSIDE the Barnes-Hut walk (accepted cells at
    monopole level + per-pair near field, min-imaged) vs the brute
    Ewald-corrected direct sum (reference applies CalculatePeriodicCorrection
    in its tree force loops, Ewald.cpp:500 via GradhSphTree.cpp:443-657)."""

    def test_tree_ewald_matches_brute(self):
        import jax
        from gandalf_tpu.ops.sph_gravity import direct_sph_gravity
        from gandalf_tpu.ops.tree import (plan_buckets_kd,
                                          plan_tree_for_buckets,
                                          tree_gravity_grouped)
        from gandalf_tpu.kernels.smoothing import kernel_factory

        rng = np.random.default_rng(9)
        N = 2048
        L = 1.0
        r = rng.random((N, 3))
        m = np.full(N, 1.0 / N)
        # tiny h: the brute reference below is UNSOFTENED Newtonian +
        # correction, so keep the tree's kernel-softened region negligible
        h = np.full(N, 1e-3)
        kern = kernel_factory("m4", 3)
        box = _box(L)
        tab = build_ewald_table([L] * 3, ngrid=17)

        g = direct_sph_gravity(kern, jnp.asarray(r), jnp.asarray(m),
                               jnp.asarray(h), jnp.zeros(N), jnp.zeros(N))
        # brute reference: min-imaged Newtonian + per-pair Ewald correction
        # (box.min_image applied inside ewald_pair_gravity)
        ge = direct_sph_gravity(
            kern, jnp.asarray(box.min_image(jnp.asarray(r))),
            jnp.asarray(m), jnp.asarray(h), jnp.zeros(N), jnp.zeros(N))
        dr_mi = box.min_image(jnp.asarray(r)[None, :, :]
                              - jnp.asarray(r)[:, None, :])
        from gandalf_tpu.ops.ewald import ewald_correction as corr
        ac, pc = corr(tab, dr_mi)
        eye = np.eye(N, dtype=bool)
        mj = jnp.where(jnp.asarray(eye), 0.0, jnp.asarray(m)[None, :])
        # direct min-image Newtonian from scratch (pairwise, kernel-softened
        # by direct_sph_gravity's formulation is NOT min-imaged internally,
        # so rebuild the plain sum here)
        drsqd = jnp.sum(dr_mi * dr_mi, axis=-1)
        inv = jnp.where(jnp.asarray(eye), 0.0,
                        1.0 / jnp.sqrt(jnp.maximum(drsqd, 1e-30)))
        w = mj * inv ** 3
        a_ref = jnp.sum(w[..., None] * dr_mi, axis=1) \
            + jnp.sum(mj[..., None] * ac, axis=1)

        gmap = plan_buckets_kd(r, leaf_size=32)
        spec = plan_tree_for_buckets(gmap, theta_sqd=0.1, quadrupole=True,
                                     fast=False, near_cap=512,
                                     frontier=1088)
        a_t, gp_t, ovf = jax.jit(lambda rr, mm, hh: tree_gravity_grouped(
            spec, jnp.asarray(gmap), rr, mm, hh, kern,
            periodic_extent=[L] * 3, ewald_table=tab))(
            jnp.asarray(r), jnp.asarray(m), jnp.asarray(h))
        assert not bool(ovf)
        a_t, a_ref = np.asarray(a_t), np.asarray(a_ref)
        scale = np.sqrt((a_ref ** 2).sum(-1))
        rel = np.sqrt(((a_t - a_ref) ** 2).sum(-1)) \
            / np.maximum(scale, scale.mean())
        assert np.median(rel) < 3e-3, f"median {np.median(rel)}"
        assert np.percentile(rel, 99) < 3e-2, f"p99 {np.percentile(rel, 99)}"

    def test_jeans_tree_path_runs(self):
        """jeans IC with ewald=1 on neib_search=kdtree: periodic gravity
        leaves the O(N^2) path (VERDICT r2 missing #8)."""
        from gandalf_tpu.params import Parameters
        from gandalf_tpu.sim.simulation import SimulationBase

        p = Parameters()
        for k, v in dict(
                ndim=3, sim="gradhsph", ic="jeans", run_id="",
                dimensionless=1, gas_eos="energy_eqn",
                self_gravity=1, hydro_forces=1, ewald=1,
                neib_search="kdtree", amp=0.025, temp0=1.0, mu_bar=1.0,
                **{"Nlattice1[0]": 8, "Nlattice1[1]": 8, "Nlattice1[2]": 8,
                   "boxmin[0]": 0.0, "boxmax[0]": 1.0,
                   "boxmin[1]": 0.0, "boxmax[1]": 1.0,
                   "boxmin[2]": 0.0, "boxmax[2]": 1.0},
                **{f"boundary_lhs[{k}]": "periodic" for k in range(3)},
                **{f"boundary_rhs[{k}]": "periodic" for k in range(3)}
        ).items():
            p.set(k, v)
        sim = SimulationBase.factory(p)
        sim.SetupSimulation()
        assert sim.use_celllist and sim.use_ewald \
            and sim.treespec is not None
        for _ in range(3):
            sim.main_loop_step()
        assert np.isfinite(np.asarray(sim.state.v)).all()

    def test_mfv_jeans_tree_path_runs(self):
        """Periodic MFV self-gravity with ewald=1: the MFV controller
        builds the same correction table and the MFV tree walk applies
        it (reference: MeshlessFV sims share Ewald via the common
        periodic gravity path, Simulation.cpp:1189)."""
        from gandalf_tpu.params import Parameters
        from gandalf_tpu.sim.simulation import SimulationBase

        p = Parameters()
        for k, v in dict(
                ndim=3, sim="mfvmuscl", ic="box", run_id="",
                dimensionless=1, gas_eos="energy_eqn",
                self_gravity=1, hydro_forces=1, ewald=1,
                riemann_solver="hllc", zero_mass_flux=1,
                rhofluid1=1.0, press1=1.0,
                neib_search="kdtree",
                **{"Nlattice1[0]": 8, "Nlattice1[1]": 8, "Nlattice1[2]": 8,
                   "boxmin[0]": 0.0, "boxmax[0]": 1.0,
                   "boxmin[1]": 0.0, "boxmax[1]": 1.0,
                   "boxmin[2]": 0.0, "boxmax[2]": 1.0},
                **{f"boundary_lhs[{k}]": "periodic" for k in range(3)},
                **{f"boundary_rhs[{k}]": "periodic" for k in range(3)}
        ).items():
            p.set(k, v)
        sim = SimulationBase.factory(p)
        sim.SetupSimulation()
        assert sim.use_celllist and sim.use_ewald \
            and sim.treespec is not None
        for _ in range(3):
            sim.main_loop_step()
        s = sim.state
        assert np.isfinite(np.asarray(s.v)).all()
        # a uniform lattice feels zero net Ewald force: momentum stays 0
        mom = (np.asarray(s.m)[:, None] * np.asarray(s.v)).sum(0)
        assert np.abs(mom).max() < 1e-8
