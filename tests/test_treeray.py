"""TreeRay-style ray-traced radiation transport (reference
src/Radiation/TreeRay.cpp + TreeRayOnTheSpot.cpp + chealpix.c)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gandalf_tpu.ops.treeray import (cell_field, column_density_map,
                                     healpix_directions,
                                     treeray_ionisation)


class TestHealpix:
    def test_counts_and_norms(self):
        for nside in (1, 2, 4):
            v = healpix_directions(nside)
            assert v.shape == (12 * nside * nside, 3)
            np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0,
                                       rtol=1e-12)
            # equal-area set: vector sum ~ 0 and each octant populated
            assert np.abs(v.sum(0)).max() < 1e-10

    def test_nside1_rings(self):
        v = healpix_directions(1)
        z = np.sort(v[:, 2])
        expect = np.sort([2/3]*4 + [0.0]*4 + [-2/3]*4)
        np.testing.assert_allclose(z, expect, atol=1e-12)

    def test_uniformity(self):
        """Equal-area pixels: nearest-neighbour angular distances have
        small scatter."""
        v = healpix_directions(4)
        dots = v @ v.T
        np.fill_diagonal(dots, -1.0)
        ang = np.arccos(np.clip(dots.max(1), -1, 1))
        assert ang.std() / ang.mean() < 0.35


def _uniform_grid(N=6000, L=2.0, seed=3):
    from gandalf_tpu.ops import sph_grid27 as g
    from gandalf_tpu.state import DomainBox, OPEN

    rng = np.random.default_rng(seed)
    r = rng.uniform(-L / 2, L / 2, (N, 3))
    rho = np.ones(N)
    m = np.full(N, L ** 3 / N)
    box = DomainBox(ndim=3, boxmin=(-L/2,)*3, boxmax=(L/2,)*3,
                    lhs=(OPEN,)*3, rhs=(OPEN,)*3)
    spec = g.plan_grid27(box, r, 0.08, 2.0)
    b = g.bin_particles(spec, jnp.asarray(r))
    return spec, b, r, m, rho


def test_column_density_uniform():
    """Uniform density: the column to the edge along +x from the centre
    is rho * distance."""
    spec, b, r, m, rho = _uniform_grid()
    rho_cell, _ = cell_field(spec, b, jnp.asarray(m), jnp.asarray(rho))
    targets = jnp.asarray([[0.0, 0.0, 0.0], [-0.5, 0.0, 0.0]])
    dirs = np.array([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    cols = np.asarray(column_density_map(spec, rho_cell, targets, dirs,
                                         n_steps=64))
    # MC density estimate has ~10% cell noise
    assert cols[0, 0] == pytest.approx(1.0, rel=0.15)
    assert cols[1, 0] == pytest.approx(1.5, rel=0.15)
    assert cols[0, 1] == pytest.approx(1.0, rel=0.15)


class TestOnTheSpot:
    def test_uniform_matches_stromgren(self):
        """No clumps: the ray-traced front reproduces the analytic
        Stromgren radius (flux = recombination column balance)."""
        spec, b, r, m, rho = _uniform_grid()
        _, nh2 = cell_field(spec, b, jnp.asarray(m), jnp.asarray(rho))
        Rs = 0.5
        # flux/column balance front: ndot/(4 pi d^2) = alphaB * n^2 * d
        # -> d = (ndot / (4 pi alphaB n^2))^(1/3) = Rs * 3^(-1/3)... use
        # the ray criterion's own front: d_front^3 = ndot/(4 pi aB n2)
        alphaB = 1.0
        d_front = 0.45
        ndot = 4.0 * np.pi * alphaB * 1.0 * d_front ** 3
        ion = np.asarray(treeray_ionisation(
            spec, nh2, jnp.asarray(r), jnp.zeros((1, 3)),
            jnp.asarray([ndot]), jnp.asarray([True]), alphaB))
        d = np.linalg.norm(r, axis=1)
        assert ion[d < 0.8 * d_front].mean() > 0.95
        assert ion[(d > 1.25 * d_front) & (d < 0.95)].mean() < 0.05

    def test_shadowing(self):
        """A dense clump between the source and distant gas casts a
        SHADOW: gas behind the clump stays neutral while equidistant
        unshadowed gas ionises — the directional behaviour the
        spherically-averaged balance cannot produce."""
        from gandalf_tpu.ops import sph_grid27 as g
        from gandalf_tpu.state import DomainBox, OPEN

        rng = np.random.default_rng(5)
        L = 2.0
        N_bg = 6000
        r_bg = rng.uniform(-L / 2, L / 2, (N_bg, 3))
        # dense clump at x = +0.3 (100x density), radius 0.1
        N_cl = 2000
        r_cl = np.array([0.3, 0.0, 0.0]) \
            + 0.1 * rng.standard_normal((N_cl, 3)) * 0.5
        r = np.concatenate([r_bg, r_cl])
        rho = np.concatenate([np.ones(N_bg), np.full(N_cl, 100.0)])
        m = np.concatenate([np.full(N_bg, L ** 3 / N_bg),
                            np.full(N_cl, 100.0 * 0.01 / N_cl)])
        box = DomainBox(ndim=3, boxmin=(-L/2,)*3, boxmax=(L/2,)*3,
                        lhs=(OPEN,)*3, rhs=(OPEN,)*3)
        spec = g.plan_grid27(box, r, 0.06, 2.0)
        b = g.bin_particles(spec, jnp.asarray(r))
        _, nh2 = cell_field(spec, b, jnp.asarray(m), jnp.asarray(rho))

        alphaB = 1.0
        ndot = 4.0 * np.pi * alphaB * 1.0 * 0.9 ** 3    # reaches d ~ 0.9
        ion = np.asarray(treeray_ionisation(
            spec, nh2, jnp.asarray(r), jnp.zeros((1, 3)),
            jnp.asarray([ndot]), jnp.asarray([True]), alphaB))

        d = np.linalg.norm(r, axis=1)
        behind = (r[:, 0] > 0.45) & (r[:, 0] < 0.85) \
            & (np.abs(r[:, 1]) < 0.09) & (np.abs(r[:, 2]) < 0.09)
        side = (r[:, 0] < -0.45) & (r[:, 0] > -0.85) \
            & (np.abs(r[:, 1]) < 0.09) & (np.abs(r[:, 2]) < 0.09)
        assert behind.sum() > 5 and side.sum() > 5
        assert ion[side].mean() > 0.9, "unshadowed gas must ionise"
        assert ion[behind].mean() < 0.3, "shadowed gas must stay neutral"


def test_treeray_controller_wiring():
    """radiation = treeray drives the SPH loop end-to-end: the ray-traced
    Stromgren sphere forms around a central source (same harness as the
    Spitzer test, 3 steps)."""
    import sys
    sys.path.insert(0, "tests")
    from test_spitzer import _front_radius

    rho0 = 3.0 / (4.0 * np.pi)
    Rs = 0.35
    # OnTheSpot front: flux = alphaB n^2 d  ->  d^3 = ndot/(4 pi aB n^2)
    ndot = 4.0 * np.pi * 1.0 * rho0 ** 2 * Rs ** 3
    from gandalf_tpu.params import Parameters

    def make(ndot_, temp_ion):
        import gandalf_tpu.sim.ic as ic_mod
        import gandalf_tpu.sim.simulation as sim_mod
        from gandalf_tpu.ops.stellar import StellarTable
        from gandalf_tpu.sim.simulation import SimulationBase

        p = Parameters()
        base = dict(ndim=3, sim="sph", ic="spitzer", Nhydro=1000,
                    mcloud=1.0, radius=1.0, dimensionless=1, run_id="",
                    gas_eos="isothermal", gamma_eos=5.0 / 3.0,
                    hydro_forces=1, self_gravity=0,
                    neib_search="kdtree", radiation="treeray",
                    nradstep=1, sink_particles=1, create_sinks=0,
                    temp_ion=temp_ion, mu_ion=1.0, mu_bar=1.0,
                    arecomb=1.0, Ndotmin=0.0, temp0=1e-6,
                    courant_mult=0.1, accel_mult=0.3, Nlevels=1)
        for k, v in base.items():
            p.set(k, v)
        s = SimulationBase.factory(p)
        orig_ic = ic_mod.generate_ic

        def with_star(params, eos):
            ic = orig_ic(params, eos)
            ic["star"] = {"r": np.zeros((1, 3)), "v": np.zeros((1, 3)),
                          "m": np.asarray([1e-6]),
                          "h": np.asarray([1e-3])}
            return ic

        ic_mod.generate_ic = with_star
        sim_mod.generate_ic = with_star
        try:
            s.SetupSimulation()
        finally:
            ic_mod.generate_ic = orig_ic
            sim_mod.generate_ic = orig_ic
        logn = np.log10(ndot_)
        s.stellar_table = StellarTable(
            mass=np.asarray([0.0, 1e3]), log_lum=np.asarray([0.0, 0.0]),
            log_nlyc=np.asarray([logn, logn]),
            teff=np.asarray([4e4] * 2), mdot=np.asarray([0.0] * 2),
            vwind=np.asarray([0.0] * 2))
        return s

    sim = make(ndot, 0.05)
    for _ in range(3):
        sim.main_loop_step()
    ion = np.asarray(sim.state.ionfrac) > 0.5
    assert ion.any() and not ion.all()
    R0 = _front_radius(sim)
    assert abs(R0 - Rs) < 0.1, f"treeray front {R0} vs {Rs}"
