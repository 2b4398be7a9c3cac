"""Monte-Carlo radiation transport gates (reference TreeMonteCarlo +
MonochromaticIonisationMonteCarlo, src/Thermal/TreeMonteCarlo.cpp,
src/Thermal/MonochromaticIonisationMonteCarlo.cpp): Lucy estimator
against the analytic point-source field, energy conservation, and the
Stromgren sphere."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gandalf_tpu.ops.mcrt import (mc_radiation_field,
                                  monochromatic_ionisation_mc,
                                  propagate_packets)


def _spec(n=32, L=1.0, periodic=False):
    return SimpleNamespace(ndim=3, lo=(-L / 2,) * 3, extents=(L,) * 3,
                           ncells=(n, n, n), periodic=(periodic,) * 3)


def _radii(spec):
    n = spec.ncells[0]
    e = spec.extents[0]
    x = (np.arange(n) + 0.5) / n * e + spec.lo[0]
    g = np.meshgrid(x, x, x, indexing="ij")
    return np.sqrt(sum(c * c for c in g))


class TestLucyEstimator:
    def test_free_streaming_inverse_square(self):
        """No absorption: u_rad = L / (4 pi r^2 c) to MC noise."""
        spec = _spec()
        op = jnp.zeros(spec.ncells)
        u, _, esc = mc_radiation_field(
            spec, op, jnp.zeros((1, 3)), jnp.asarray([1.0]),
            jax.random.PRNGKey(0), n_packets=40000, n_steps=80,
            c_light=1.0)
        r = _radii(spec)
        sel = (r > 0.12) & (r < 0.42)
        expect = 1.0 / (4.0 * np.pi * r[sel] ** 2)
        ratio = np.asarray(u)[sel] / expect
        assert abs(np.median(ratio) - 1.0) < 0.1, np.median(ratio)
        # everything eventually leaves the open box
        assert esc > 0.99

    def test_uniform_absorber_attenuation(self):
        """kappa*rho = const: the radial profile gains exp(-k r)."""
        spec = _spec()
        kap = 4.0
        op = jnp.full(spec.ncells, kap)
        u, absorbed, esc = mc_radiation_field(
            spec, op, jnp.zeros((1, 3)), jnp.asarray([1.0]),
            jax.random.PRNGKey(1), n_packets=40000, n_steps=80)
        r = _radii(spec)
        sel = (r > 0.12) & (r < 0.38)
        expect = np.exp(-kap * r[sel]) / (4.0 * np.pi * r[sel] ** 2)
        ratio = np.asarray(u)[sel] / expect
        assert abs(np.median(ratio) - 1.0) < 0.12, np.median(ratio)

    def test_energy_conservation(self):
        """absorbed + escaped = emitted, exactly (continuous weights)."""
        spec = _spec()
        op = jnp.full(spec.ncells, 2.0)
        u, absorbed, esc = mc_radiation_field(
            spec, op, jnp.zeros((1, 3)), jnp.asarray([3.0]),
            jax.random.PRNGKey(2), n_packets=5000, n_steps=120)
        v_cell = (spec.extents[0] / spec.ncells[0]) ** 3
        total = float(jnp.sum(absorbed) * v_cell + esc * 3.0)
        assert total == pytest.approx(3.0, rel=1e-6)

    def test_luminosity_weighted_sources(self):
        """Two sources: emission samples follow the luminosities."""
        spec = _spec()
        op = jnp.zeros(spec.ncells)
        r_src = jnp.asarray([[-0.3, 0.0, 0.0], [0.3, 0.0, 0.0]])
        u, _, _ = mc_radiation_field(
            spec, op, r_src, jnp.asarray([10.0, 1.0]),
            jax.random.PRNGKey(3), n_packets=30000, n_steps=60)
        r = _radii(spec)
        u_np = np.asarray(u)
        # sample the field near each source at the same offset
        near = lambda c: u_np[np.argmin(
            np.abs(r - 0.08) + 10.0 * np.linalg.norm(
                np.stack(np.meshgrid(*[np.linspace(-0.484375, 0.484375,
                                                   32)] * 3,
                                     indexing="ij"), -1)
                - np.asarray(c), axis=-1).reshape(spec.ncells))]
        # integrate u over shells centred on each source instead: total
        # path length near source scales with its luminosity
        x = np.linspace(spec.lo[0] + 0.015625, -spec.lo[0] - 0.015625, 32)
        g = np.stack(np.meshgrid(x, x, x, indexing="ij"), -1)
        d0 = np.linalg.norm(g - np.asarray([-0.3, 0, 0]), axis=-1)
        d1 = np.linalg.norm(g - np.asarray([0.3, 0, 0]), axis=-1)
        s0 = u_np[(d0 > 0.05) & (d0 < 0.15)].sum()
        s1 = u_np[(d1 > 0.05) & (d1 < 0.15)].sum()
        assert 6.0 < s0 / s1 < 16.0, s0 / s1


class TestMonochromaticIonisation:
    @pytest.mark.slow
    def test_stromgren_sphere(self):
        """Uniform medium + central source: the ionised region matches
        the Stromgren radius (3 Ndot / 4 pi alphaB nH^2)^(1/3)."""
        spec = _spec(n=32, L=1.0)
        nH = 10.0
        alphaB = 1.0
        sigma = 200.0          # optically thick fronts (sharp edge)
        Rs = 0.3
        ndot = 4.0 * np.pi / 3.0 * alphaB * nH * nH * Rs ** 3
        xHI = monochromatic_ionisation_mc(
            spec, jnp.full(spec.ncells, nH), jnp.zeros((1, 3)),
            jnp.asarray([ndot]), jax.random.PRNGKey(4),
            n_packets=20000, sigma=sigma, alphaB=alphaB, n_steps=96,
            n_iter=10)
        v_cell = (spec.extents[0] / spec.ncells[0]) ** 3
        v_ion = float(jnp.sum(1.0 - xHI)) * v_cell
        r_eff = (3.0 * v_ion / (4.0 * np.pi)) ** (1.0 / 3.0)
        assert r_eff == pytest.approx(Rs, rel=0.15), r_eff
        # centre fully ionised, edge fully neutral
        c = spec.ncells[0] // 2
        assert float(xHI[c, c, c]) < 0.05
        assert float(xHI[0, 0, 0]) > 0.95
