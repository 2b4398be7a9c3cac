"""Smoke + property tests for the round-2 IC generators (reference
src/Ic/{EwaldIc,BasicIc,ShearflowIc,RayleighTaylorIc,Shock2DIc,
SpitzerExpansionIc,FilamentIc,BondiAccretionIc,HierarchicalSystemIc}.cpp)."""

import numpy as np
import pytest

from gandalf_tpu.params import Parameters
from gandalf_tpu.sim.ic import generate_ic, generate_nbody_ic


def make_params(**over):
    p = Parameters()
    base = {
        "ndim": 3, "dimensionless": 1, "gas_eos": "energy_eqn",
        "gamma_eos": 1.4, "rhofluid1": 1.0, "press1": 1.0, "amp": 0.1,
        "randseed": 1,
    }
    base.update(over)
    for k, v in base.items():
        p.set(k, v)
    return p


def box_params(n=8, per="periodic", **over):
    kw = {}
    for k in range(over.get("ndim", 3)):
        kw[f"boxmin[{k}]"] = 0.0 if over.get("lo0") is None else over["lo0"]
        kw[f"boxmax[{k}]"] = 1.0
        kw[f"boundary_lhs[{k}]"] = per
        kw[f"boundary_rhs[{k}]"] = per
        kw[f"Nlattice1[{k}]"] = n
        kw[f"Nlattice2[{k}]"] = n
    kw.pop("lo0", None)
    over.pop("lo0", None)
    kw.update(over)
    return make_params(**kw)


def _finite(ic):
    for k in ("r", "v", "m", "h", "u"):
        assert np.isfinite(ic[k]).all(), k
    assert (ic["m"] > 0).all()
    assert (ic["h"] > 0).all()


def test_jeans_sine_density():
    p = box_params(ic="jeans")
    ic = generate_ic(p, None)
    _finite(ic)
    assert len(ic["r"]) == 512
    # displaced lattice: mean x shifts by -amp/(2 pi) for rho ~ 1+amp sin
    x = ic["r"][:, 0]
    lattice_mean = 0.5
    assert x.mean() < lattice_mean - 0.5 * 0.1 / (2 * np.pi)
    assert x.mean() > lattice_mean - 2.0 * 0.1 / (2 * np.pi)


def test_ewaldsine2_mass_profile():
    ic = generate_ic(box_params(ic="ewaldsine2"), None)
    _finite(ic)
    x = ic["r"][:, 0]
    m = ic["m"]
    expect = 1.0 + 0.1 * np.sin(2 * np.pi * x)
    np.testing.assert_allclose(m / m.mean() * expect.mean(), expect,
                               rtol=1e-6)


def test_ewaldslab_profile():
    p = box_params(ic="ewaldslab", lo0=-0.5)
    # slab: periodic in x,y; open in z
    p.set("boundary_lhs[2]", "open")
    p.set("boundary_rhs[2]", "open")
    ic = generate_ic(p, None)
    _finite(ic)
    z = ic["r"][:, 2]
    m = ic["m"]
    assert m[np.abs(z) < 0.1].mean() > m[np.abs(z) > 0.4].mean()


def test_ewaldcylinder_profile():
    p = box_params(ic="ewaldcylinder", lo0=-0.5)
    for k in (1, 2):
        p.set(f"boundary_lhs[{k}]", "open")
        p.set(f"boundary_rhs[{k}]", "open")
    ic = generate_ic(p, None)
    _finite(ic)
    rad = np.hypot(ic["r"][:, 1], ic["r"][:, 2])
    assert ic["m"][rad < 0.15].mean() > ic["m"][rad > 0.5].mean()


def test_shearflow():
    ic = generate_ic(box_params(ic="shearflow", ndim=2, n=16), None)
    _finite(ic)
    y = ic["r"][:, 1]
    vx = ic["v"][:, 0]
    np.testing.assert_allclose(vx, 0.1 * np.sin(2 * np.pi * y), atol=1e-12)
    assert np.abs(ic["v"][:, 1]).max() == 0.0


def test_rti():
    p = box_params(ic="rti", ndim=2, n=16, rhofluid2=2.0, press2=1.0)
    ic = generate_ic(p, None)
    _finite(ic)
    y = ic["r"][:, 1]
    m = ic["m"]
    assert m[y > 0.75].mean() > m[y < 0.25].mean()  # heavy on top
    assert np.abs(ic["v"][(y >= 0.3) & (y <= 0.7), 1]).max() > 0.0
    assert np.abs(ic["v"][(y < 0.29) | (y > 0.71), 1]).max() == 0.0


def test_shock2d():
    ic = generate_ic(box_params(ic="shock2d", ndim=2, n=16), None)
    _finite(ic)
    # the diagonal split is at scaled x + y = 0.5 (triangle of area 1/8)
    xi = ic["r"][:, 0] + ic["r"][:, 1]
    hi_side = xi >= 0.5
    # total masses match the 0.875/0.125 volume-density split
    assert ic["m"][hi_side].sum() == pytest.approx(0.875, rel=1e-6)
    assert ic["m"][~hi_side].sum() == pytest.approx(0.125 * 0.125, rel=1e-6)


def test_spitzer():
    p = make_params(ic="spitzer", Nhydro=200, mcloud=1.0, radius=0.5)
    ic = generate_ic(p, None)
    _finite(ic)
    assert np.linalg.norm(ic["r"], axis=1).max() <= 0.5
    assert ic["u"].max() < 1e-10


def test_filament():
    p = box_params(ic="filament", lo0=-0.5, Nhydro=500, mcloud=1.0,
                   radius=0.1)
    ic = generate_ic(p, None)
    _finite(ic)
    rad = np.hypot(ic["r"][:, 0], ic["r"][:, 1])
    # centrally concentrated: number density per unit area much higher in
    # the core than in the outer annulus
    n_core = (rad < 0.15).sum() / (np.pi * 0.15 ** 2)
    n_out = ((rad > 0.35) & (rad < 0.5)).sum() / (np.pi * (0.25 - 0.1225))
    assert n_core > 3.0 * n_out


def test_basic_sine():
    p = box_params(ic="basic_sine", Nhydro=2000)
    ic = generate_ic(p, None)
    _finite(ic)
    x = ic["r"][:, 0]
    assert ((x > 0.0) & (x < 0.5)).sum() > ((x >= 0.5) & (x < 1.0)).sum()


def test_bondi():
    p = make_params(ic="bondi", Nhydro=300, mcloud=1.0, m1=1.0,
                    gas_eos="isothermal", temp0=1.0, mu_bar=1.0,
                    sink_radius=1.0)
    ic = generate_ic(p, None)
    _finite(ic)
    # inflow everywhere, faster inside the sonic radius (r < rsonic = 0.5)
    rhat = ic["r"] / np.linalg.norm(ic["r"], axis=1, keepdims=True)
    vr = np.sum(ic["v"] * rhat, axis=1)
    assert (vr < 0.0).all()
    rad = np.linalg.norm(ic["r"], axis=1)
    assert np.abs(vr[rad < 0.5]).min() > 1.0   # supersonic inside
    assert ic["star"]["m"][0] == 1.0


def test_bondi_solution_sonic_point():
    from gandalf_tpu.sim.ic import _bondi_solution

    x, w, y, z = _bondi_solution()
    i = np.argmin(np.abs(x - 1.0))
    assert w[i] == pytest.approx(1.0, abs=2e-3)
    assert y[i] == pytest.approx(np.exp(1.5), rel=5e-3)
    # enclosed mass at sonic point matches the reference's tabulated value
    assert z[i] == pytest.approx(2.4102434440, rel=1e-3)


def test_triple_quadruple_com():
    for ic_name, n in (("triple", 3), ("quadruple", 4)):
        p = make_params(ic=ic_name, abin=1.0, ebin=0.1, abin2=0.1,
                        ebin2=0.0, m1=0.5, m2=0.5, m3=0.5, m4=0.5,
                        rstar=0.01)
        ic = generate_nbody_ic(p)
        assert len(ic["m"]) == n
        com = (ic["m"][:, None] * ic["r"]).sum(0) / ic["m"].sum()
        vcom = (ic["m"][:, None] * ic["v"]).sum(0) / ic["m"].sum()
        np.testing.assert_allclose(com, 0.0, atol=1e-12)
        np.testing.assert_allclose(vcom, 0.0, atol=1e-12)
