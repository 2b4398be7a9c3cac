"""Long-tail IC generators (ic = file/polytrope/silcc/binaryacc +
aliases) and the Lloyd particle regulariser
(src/Common/SimulationIC.hpp:88-186, src/Ic/ICRegularization.cpp)."""

import numpy as np
import pytest

from gandalf_tpu.ops.eos import eos_factory
from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.ic import generate_ic


def _params(**over):
    p = Parameters()
    base = dict(ndim=3, dimensionless=1, gas_eos="energy_eqn", run_id="")
    base.update(over)
    for k, v in base.items():
        p.set(k, v)
    return p


def test_polytrope_lane_emden():
    """n = 1 polytrope (eta = 2): analytic theta = sin(xi)/xi, xi1 = pi;
    total mass and outer radius must match the requested values, and the
    density profile must follow rho_c sin(xi)/xi."""
    p = _params(ic="polytrope", Nhydro=3000, eta_eos=2.0,
                mcloud=2.0, radius=1.5)
    ic = generate_ic(p, eos_factory(p))
    r = ic["r"]
    rad = np.sqrt((r ** 2).sum(-1))
    assert ic["m"].sum() == pytest.approx(2.0, rel=1e-6)
    assert rad.max() <= 1.5 + 1e-6
    assert rad.max() > 1.3          # particles reach the surface
    # analytic: m(<R/2)/M for n=1 is (sin(x)-x cos(x))/pi with x=pi/2
    x = np.pi / 2.0
    mfrac_half = (np.sin(x) - x * np.cos(x)) / np.pi
    got = ic["m"][rad < 0.75].sum() / ic["m"].sum()
    assert got == pytest.approx(mfrac_half, abs=0.02)
    assert np.isfinite(ic["u"]).all() and (ic["u"] > 0).all()


def test_silcc_stratification():
    p = _params(ic="silcc", Nhydro=4000, a_midplane=0.5, h_midplane=0.2,
                rho_midplane=1.0, temp0=1.0, mu_bar=1.0, randseed=1,
                **{"boxmin[0]": -1.0, "boxmax[0]": 1.0,
                   "boxmin[1]": -1.0, "boxmax[1]": 1.0,
                   "boxmin[2]": -1.0, "boxmax[2]": 1.0})
    ic = generate_ic(p, eos_factory(p))
    z = np.abs(ic["r"][:, 2])
    # Gaussian stratification: far more particles near the midplane
    n_mid = (z < 0.1).sum()
    n_out = ((z > 0.6) & (z < 0.7)).sum()
    assert n_mid > 4 * n_out
    assert np.isfinite(ic["m"]).all() and ic["m"].min() > 0


def test_binaryacc_binary():
    p = _params(ic="binaryacc", Nstar=2, m1=0.4, m2=0.6, abin=0.5,
                ebin=0.0, vmachbin=1.0, rhofluid1=1.0, rhofluid2=0.1,
                press1=1.0,
                **{f"Nlattice1[{k}]": 8 for k in range(3)},
                **{f"Nlattice2[{k}]": 8 for k in range(3)},
                **{f"boxmin[{k}]": -1.0 for k in range(3)},
                **{f"boxmax[{k}]": 1.0 for k in range(3)})
    ic = generate_ic(p, eos_factory(p))
    assert "star" in ic and len(ic["star"]["m"]) == 2
    assert ic["star"]["m"].sum() == pytest.approx(1.0)
    # two-density split along x
    x = ic["r"][:, 0]
    m_lo = ic["m"][x < 0].mean()
    m_hi = ic["m"][x > 0].mean()
    assert m_lo > 5 * m_hi
    # binary separation = abin(1+e), COM moving at Mach 1
    dr = ic["star"]["r"][0] - ic["star"]["r"][1]
    assert np.sqrt((dr ** 2).sum()) == pytest.approx(0.5, rel=1e-9)
    vcom = (ic["star"]["m"][:, None] * ic["star"]["v"]).sum(0) / 1.0
    cs = np.sqrt(p.floatparams["gamma_eos"] * 1.0 / 1.0)
    assert vcom[0] == pytest.approx(cs, rel=1e-9)


def test_file_ic_roundtrip(tmp_path, monkeypatch):
    """ic = file reads a snapshot written by the framework."""
    from gandalf_tpu.sim import io as sim_io

    rng = np.random.default_rng(0)
    data = {"r": rng.random((64, 3)), "v": rng.random((64, 3)),
            "m": np.full(64, 0.1), "h": np.full(64, 0.2),
            "rho": np.ones(64), "u": np.full(64, 1.5)}
    fname = str(tmp_path / "snap.su.00000")
    sim_io.write_seren_unform(fname, 0.0, data, 3)
    p = _params(ic="file", in_file=fname, in_file_form="su")
    ic = generate_ic(p, eos_factory(p))
    np.testing.assert_allclose(ic["r"], data["r"], rtol=1e-12)
    np.testing.assert_allclose(ic["m"], data["m"], rtol=1e-12)


def test_regularise_uniform_box():
    """Lloyd regularisation of a random uniform box must reduce the SPH
    density scatter (the point of the scheme)."""
    from gandalf_tpu.kernels.smoothing import kernel_factory
    import jax.numpy as jnp

    p = _params(ic="box", regularise_particle_ics=1, Nreg=8,
                rhofluid1=1.0, press1=1.0,
                particle_distribution="random", Nhydro=512,
                **{f"Nlattice1[{k}]": 8 for k in range(3)},
                **{f"boxmin[{k}]": 0.0 for k in range(3)},
                **{f"boxmax[{k}]": 1.0 for k in range(3)},
                **{f"boundary_lhs[{k}]": "periodic" for k in range(3)},
                **{f"boundary_rhs[{k}]": "periodic" for k in range(3)})
    eos = eos_factory(p)
    # baseline: random positions, no regularisation
    rng = np.random.default_rng(5)
    base = generate_ic(p, eos)
    r0 = np.mod(base["r"] + 0.4 * rng.standard_normal(base["r"].shape),
                1.0)

    def rho_scatter(r, m, h):
        kern = kernel_factory("m4", 3)
        dr = r[:, None] - r[None, :]
        dr -= np.round(dr)
        s2 = (dr ** 2).sum(-1) / h[:, None] ** 2
        rho = (m[None, :]
               * np.asarray(kern.w0_s2(jnp.asarray(s2)))).sum(-1) / h ** 3
        return rho.std() / rho.mean()

    from gandalf_tpu.sim.ic import regularise_ic

    jittered = dict(base, r=r0)
    sc0 = rho_scatter(r0, base["m"], base["h"])
    reg = regularise_ic(p, jittered, rho_func=None,
                        periodic_dims=(0, 1, 2),
                        box_lo=[0.0] * 3, box_hi=[1.0] * 3)
    sc1 = rho_scatter(reg["r"], base["m"], base["h"])
    assert sc1 < 0.7 * sc0, f"scatter {sc0} -> {sc1}"


def test_isothermsphere_variants():
    """rotisothermsphere spins about z; turbisothermsphere carries a
    turbulent field with KE scaled to alpha_turb |Egrav|
    (IsothermalSphereIc.cpp:123-330)."""
    p = _params(ic="rotisothermsphere", Nhydro=500, mcloud=1.0,
                radius=1.0, omega=2.0, gas_eos="energy_eqn", press1=1.0)
    ic = generate_ic(p, eos_factory(p))
    r, v = ic["r"], ic["v"]
    # v = omega x r (z axis): vx = -w y, vy = w x
    np.testing.assert_allclose(v[:, 0], -2.0 * r[:, 1], rtol=1e-12)
    np.testing.assert_allclose(v[:, 1], 2.0 * r[:, 0], rtol=1e-12)
    assert np.abs(v[:, 2]).max() == 0.0

    p2 = _params(ic="turbisothermsphere", Nhydro=500, mcloud=1.0,
                 radius=1.0, alpha_turb=0.3, power_turb=-4.0,
                 gas_eos="energy_eqn", press1=1.0, randseed=2)
    ic2 = generate_ic(p2, eos_factory(p2))
    ke = 0.5 * (ic2["m"][:, None] * ic2["v"] ** 2).sum()
    gpe = 0.6 * 1.0 / 1.0
    assert ke == pytest.approx(0.3 * gpe, rel=1e-6)
    assert np.abs(ic2["v"]).max() > 0
