"""Initial-condition generators.

Host-side numpy implementations of the reference IC factory
(src/Common/SimulationIC.hpp:88-186, generators in src/Ic/).  ICs run once
at setup on the host, so plain numpy (float64) is the right tool; the
result is converted to device arrays by the simulation controller.

Each generator returns a dict with keys r, v, m, h, u (+ optional extras).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def add_cubic_lattice(n_lattice, boxmin, boxmax) -> np.ndarray:
    """Cell-centred cubic lattice (Ic::AddCubicLattice, src/Ic/Ic.cpp:629)."""
    ndim = len(n_lattice)
    axes = [boxmin[k] + (np.arange(n_lattice[k]) + 0.5)
            * (boxmax[k] - boxmin[k]) / n_lattice[k] for k in range(ndim)]
    grids = np.meshgrid(*axes, indexing="ij")
    # match reference ordering: x fastest (ii innermost loop)
    r = np.stack([g.reshape(-1, order="F") for g in grids], axis=-1)
    return r


def shocktube_ic(params, eos) -> Dict[str, np.ndarray]:
    """1D Riemann-problem shocktube (src/Ic/ShocktubeIc.cpp:57-206)."""
    ndim = params.intparams["ndim"]
    if ndim != 1:
        raise ValueError("shocktube IC is 1D only")
    fp = params.floatparams
    ip = params.intparams
    rho1, rho2 = fp["rhofluid1"], fp["rhofluid2"]
    press1, press2 = fp["press1"], fp["press2"]
    v1, v2 = fp["vfluid1[0]"], fp["vfluid2[0]"]
    N1, N2 = ip["Nlattice1[0]"], ip["Nlattice2[0]"]
    xmin, xmax = fp["boxmin[0]"], fp["boxmax[0]"]
    h_fac = fp["h_fac"]
    gammam1 = fp["gamma_eos"] - 1.0

    if params.stringparams["gas_eos"] == "isothermal":
        u1 = u2 = fp["temp0"] / gammam1 / fp["mu_bar"]
    else:
        u1 = press1 / (gammam1 * rho1)
        u2 = press2 / (gammam1 * rho2)

    r1 = add_cubic_lattice([N1], [xmin], [0.0])
    r2 = add_cubic_lattice([N2], [0.0], [xmax])
    vol1, vol2 = -xmin, xmax
    m1 = np.full(N1, rho1 * vol1 / N1)
    m2 = np.full(N2, rho2 * vol2 / N2)
    u = np.concatenate([np.full(N1, u1), np.full(N2, u2)])
    v = np.zeros((N1 + N2, 1))
    v[:N1, 0] = v1
    v[N1:, 0] = v2
    r = np.concatenate([r1, r2], axis=0)
    m = np.concatenate([m1, m2])
    rho = np.concatenate([np.full(N1, rho1), np.full(N2, rho2)])
    h = h_fac * (m / rho) ** (1.0 / ndim)
    return {"r": r, "v": v, "m": m, "h": h, "u": u}


def soundwave_ic(params, eos) -> Dict[str, np.ndarray]:
    """1D linear soundwave perturbation (src/Ic/SoundwaveIc.cpp:
    lattice + Ic::AddSinusoidalDensityPerturbation)."""
    ndim = params.intparams["ndim"]
    if ndim != 1:
        raise ValueError("soundwave IC is 1D only")
    fp = params.floatparams
    ip = params.intparams
    rho0 = fp["rhofluid1"]
    press0 = fp["press1"]
    amp = fp["amp"]
    temp0 = fp["temp0"]
    mu_bar = fp["mu_bar"]
    gamma = fp["gamma_eos"]
    gammam1 = gamma - 1.0
    N = ip["Nhydro"] if ip["Nhydro"] > 0 else ip["Nlattice1[0]"]
    xmin, xmax = fp["boxmin[0]"], fp["boxmax[0]"]
    h_fac = fp["h_fac"]

    if params.stringparams["gas_eos"] == "isothermal":
        u0 = temp0 / gammam1 / mu_bar
        press0 = gammam1 * rho0 * u0
        csound = np.sqrt(press0 / rho0)
    else:
        u0 = press0 / (gammam1 * rho0)
        csound = np.sqrt(gamma * press0 / rho0)

    lam = xmax - xmin
    kwave = 2.0 * np.pi / lam
    x = add_cubic_lattice([N], [xmin], [xmax])[:, 0]
    # iterate x_new = x - amp*(1 - cos(k x_new))/k  (reference fixed point)
    xnew = x.copy()
    for _ in range(200):
        xnew = x - amp * (1.0 - np.cos(kwave * xnew)) / kwave
    xnew = np.where(xnew > xmax, xnew - lam, xnew)
    xnew = np.where(xnew < xmin, xnew + lam, xnew)
    x = xnew
    v = np.zeros((N, 1))
    v[:, 0] = csound * amp * np.sin(kwave * x)
    m = np.full(N, rho0 * lam / N)
    h = h_fac * (m / rho0)
    u = u0 * np.ones(N)
    return {"r": x[:, None], "v": v, "m": m, "h": h, "u": u}


def uniform_box_ic(params, eos) -> Dict[str, np.ndarray]:
    """Uniform-density box ('box' IC, src/Ic/UniformIc.cpp)."""
    ndim = params.intparams["ndim"]
    fp = params.floatparams
    ip = params.intparams
    n_lattice = [ip[f"Nlattice1[{k}]"] for k in range(ndim)]
    boxmin = [fp[f"boxmin[{k}]"] for k in range(ndim)]
    boxmax = [fp[f"boxmax[{k}]"] for k in range(ndim)]
    rho0 = fp["rhofluid1"]
    press0 = fp["press1"]
    gammam1 = fp["gamma_eos"] - 1.0
    h_fac = fp["h_fac"]
    r = add_cubic_lattice(n_lattice, boxmin, boxmax)
    N = r.shape[0]
    volume = np.prod([boxmax[k] - boxmin[k] for k in range(ndim)])
    m = np.full(N, rho0 * volume / N)
    h = h_fac * (m / rho0) ** (1.0 / ndim)
    if params.stringparams["gas_eos"] == "isothermal":
        u = np.full(N, fp["temp0"] / gammam1 / fp["mu_bar"])
    else:
        u = np.full(N, press0 / (gammam1 * rho0))
    return {"r": r, "v": np.zeros((N, ndim)), "m": m, "h": h, "u": u}


def add_lattice_sphere(n_target: int, radius: float, ndim: int = 3
                       ) -> np.ndarray:
    """Cubic-lattice points inside a sphere, tuned to ~n_target points
    (Ic::AddLatticeSphere, src/Ic/Ic.cpp)."""
    # binary-search the lattice resolution whose sphere cut best matches
    best = None
    lo, hi = 2, max(4, int(3.0 * n_target ** (1.0 / ndim)))
    for n_lat in range(lo, hi):
        r = add_cubic_lattice([n_lat] * ndim, [-radius] * ndim,
                              [radius] * ndim)
        inside = (r ** 2).sum(-1) <= radius * radius
        cnt = int(inside.sum())
        if best is None or abs(cnt - n_target) < abs(best[0] - n_target):
            best = (cnt, r[inside])
        if cnt >= n_target and best[0] == cnt:
            break
    return best[1]


def sphere_ic(params, eos) -> Dict[str, np.ndarray]:
    """Uniform-density sphere ('sphere' IC; UniformIc sphere branch,
    src/Ic/UniformIc.cpp)."""
    ip, fp = params.intparams, params.floatparams
    ndim = ip["ndim"]
    n_target = ip["Nhydro"]
    mcloud = fp["mcloud"]
    radius = fp["radius"]
    press = fp["press1"]
    gammam1 = fp["gamma_eos"] - 1.0
    h_fac = fp["h_fac"]
    dist = params.stringparams["particle_distribution"]
    if dist == "random":
        rng = np.random.default_rng(ip["randseed"])
        pts = []
        while len(pts) < n_target:
            cand = rng.uniform(-radius, radius, size=(n_target * 2, ndim))
            cand = cand[(cand ** 2).sum(-1) <= radius * radius]
            pts.extend(cand.tolist())
        r = np.asarray(pts[:n_target])
    else:
        r = add_lattice_sphere(n_target, radius, ndim)
    N = r.shape[0]
    if ndim == 1:
        volume = 2.0 * radius
    elif ndim == 2:
        volume = np.pi * radius ** 2
    else:
        volume = 4.0 / 3.0 * np.pi * radius ** 3
    rho0 = mcloud / volume
    m = np.full(N, mcloud / N)
    h = h_fac * (m / rho0) ** (1.0 / ndim)
    u = np.full(N, press / (gammam1 * rho0))
    return {"r": r, "v": np.zeros((N, ndim)), "m": m, "h": h, "u": u}


def sedov_ic(params, eos) -> Dict[str, np.ndarray]:
    """Sedov-Taylor blast wave: cold lattice + energy injected in a central
    kernel-sized hot region (src/Ic/SedovBlastwaveIc.cpp)."""
    ip, fp = params.intparams, params.floatparams
    ndim = ip["ndim"]
    n_lattice = [ip[f"Nlattice1[{k}]"] for k in range(ndim)]
    boxmin = [fp[f"boxmin[{k}]"] for k in range(ndim)]
    boxmax = [fp[f"boxmax[{k}]"] for k in range(ndim)]
    rho0 = fp["rhofluid1"]
    kefrac = fp["kefrac"]
    h_fac = fp["h_fac"]
    smooth = bool(ip["smooth_ic"])
    from ..kernels.smoothing import kernel_factory
    kern = kernel_factory(params.stringparams["kernel"], ndim)

    r = add_cubic_lattice(n_lattice, boxmin, boxmax)
    N = r.shape[0]
    volume = np.prod([boxmax[k] - boxmin[k] for k in range(ndim)])
    m = np.full(N, rho0 * volume / N)
    h = h_fac * (m / rho0) ** (1.0 / ndim)
    r_hot = h_fac * kern.kernrange * (boxmax[0] - boxmin[0]) / n_lattice[0]

    drsqd = (r ** 2).sum(-1)
    hot = drsqd < r_hot * r_hot
    if smooth:
        import jax.numpy as jnp
        w = np.asarray(kern.w0(jnp.asarray(
            kern.kernrange * np.sqrt(drsqd) / r_hot)))
        u = np.where(hot, m * w, 0.0)
    else:
        u = np.where(hot, m, 0.0)
    utot = u.sum()
    ufrac = max(0.0, 1.0 - kefrac)
    u_hot = u / utot / m
    v = np.zeros((N, ndim))
    drmag = np.sqrt(drsqd) + 1e-30
    vmag = np.sqrt(2.0 * kefrac * u_hot)
    v = np.where(hot[:, None], vmag[:, None] * r / drmag[:, None], v)
    u = np.where(hot, ufrac * u_hot, 1.0e-6 / m)
    return {"r": r, "v": v, "m": m, "h": h, "u": u}


def khi_ic(params, eos) -> Dict[str, np.ndarray]:
    """Kelvin-Helmholtz instability: two shearing layers + seeded mode
    (src/Ic/KhiIc.cpp)."""
    ip, fp = params.intparams, params.floatparams
    if ip["ndim"] != 2:
        raise ValueError("khi IC is 2D only")
    boxmin = [fp["boxmin[0]"], fp["boxmin[1]"]]
    boxmax = [fp["boxmax[0]"], fp["boxmax[1]"]]
    Ly = boxmax[1] - boxmin[1]
    rho1, rho2 = fp["rhofluid1"], fp["rhofluid2"]
    press1, press2 = fp["press1"], fp["press2"]
    v1, v2 = fp["vfluid1[0]"], fp["vfluid2[0]"]
    amp, lam = fp["amp"], fp["lambda"]
    gammam1 = fp["gamma_eos"] - 1.0
    h_fac = fp["h_fac"]
    N1 = [ip["Nlattice1[0]"], ip["Nlattice1[1]"]]
    N2 = [ip["Nlattice2[0]"], ip["Nlattice2[1]"]]
    # bottom half = fluid 1, top half = fluid 2, both then shifted down by
    # Ly/4 so the interfaces sit at y = +-0.25 (reference :31-76)
    half = boxmin[1] + 0.5 * Ly
    r1 = add_cubic_lattice(N1, boxmin, [boxmax[0], half])
    r2 = add_cubic_lattice(N2, [boxmin[0], half], boxmax)
    volume = (boxmax[0] - boxmin[0]) * 0.5 * Ly
    r = np.concatenate([r1, r2], axis=0)
    r[:, 1] -= 0.25 * Ly
    r[:, 1] = np.where(r[:, 1] < boxmin[1], r[:, 1] + Ly, r[:, 1])
    n1, n2 = len(r1), len(r2)
    m = np.concatenate([np.full(n1, rho1 * volume / n1),
                        np.full(n2, rho2 * volume / n2)])
    rho = np.concatenate([np.full(n1, rho1), np.full(n2, rho2)])
    u = np.concatenate([np.full(n1, press1 / rho1 / gammam1),
                        np.full(n2, press2 / rho2 / gammam1)])
    h = h_fac * (m / rho) ** 0.5
    v = np.zeros((n1 + n2, 2))
    v[:n1, 0] = v1
    v[n1:, 0] = v2
    sigma = 0.05 / np.sqrt(2.0)
    v[:, 1] = amp * np.sin(2.0 * np.pi * r[:, 0] / lam) * (
        np.exp(-((r[:, 1] + 0.25) ** 2) / (2.0 * sigma ** 2))
        + np.exp(-((r[:, 1] - 0.25) ** 2) / (2.0 * sigma ** 2)))
    return {"r": r, "v": v, "m": m, "h": h, "u": u}


def gresho_ic(params, eos) -> Dict[str, np.ndarray]:
    """Gresho-Chan vortex (src/Ic/GreshoVortexIc.cpp): rotationally
    supported vortex, exact steady state."""
    ip, fp = params.intparams, params.floatparams
    if ip["ndim"] != 2:
        raise ValueError("gresho IC is 2D only")
    n_lattice = [ip["Nlattice1[0]"], ip["Nlattice1[1]"]]
    boxmin = [fp["boxmin[0]"], fp["boxmin[1]"]]
    boxmax = [fp["boxmax[0]"], fp["boxmax[1]"]]
    gammam1 = fp["gamma_eos"] - 1.0
    h_fac = fp["h_fac"]
    rho0 = 1.0
    r = add_cubic_lattice(n_lattice, boxmin, boxmax)
    N = r.shape[0]
    rad = np.sqrt((r ** 2).sum(-1)) + 1e-30
    # azimuthal velocity / pressure profile (Gresho & Chan 1990)
    vphi = np.where(rad < 0.2, 5.0 * rad,
                    np.where(rad < 0.4, 2.0 - 5.0 * rad, 0.0))
    press = np.where(
        rad < 0.2, 5.0 + 12.5 * rad ** 2,
        np.where(rad < 0.4,
                 9.0 + 12.5 * rad ** 2 - 20.0 * rad + 4.0 * np.log(rad / 0.2),
                 3.0 + 4.0 * np.log(2.0)))
    v = np.stack([-vphi * r[:, 1] / rad, vphi * r[:, 0] / rad], axis=-1)
    volume = np.prod([boxmax[k] - boxmin[k] for k in range(2)])
    m = np.full(N, rho0 * volume / N)
    h = h_fac * (m / rho0) ** 0.5
    u = press / (rho0 * gammam1)
    return {"r": r, "v": v, "m": m, "h": h, "u": u}


def noh_ic(params, eos) -> Dict[str, np.ndarray]:
    """Noh problem: uniform gas with radial inflow v_r = -1
    (src/Ic/NohIc.cpp)."""
    ip, fp = params.intparams, params.floatparams
    ndim = ip["ndim"]
    n_lattice = [ip[f"Nlattice1[{k}]"] for k in range(ndim)]
    boxmin = [fp[f"boxmin[{k}]"] for k in range(ndim)]
    boxmax = [fp[f"boxmax[{k}]"] for k in range(ndim)]
    rho0 = fp["rhofluid1"]
    press0 = fp["press1"]
    gammam1 = fp["gamma_eos"] - 1.0
    h_fac = fp["h_fac"]
    r = add_cubic_lattice(n_lattice, boxmin, boxmax)
    N = r.shape[0]
    rad = np.sqrt((r ** 2).sum(-1)) + 1e-30
    v = -r / rad[:, None]
    volume = np.prod([boxmax[k] - boxmin[k] for k in range(ndim)])
    m = np.full(N, rho0 * volume / N)
    h = h_fac * (m / rho0) ** (1.0 / ndim)
    u = np.full(N, press0 / (rho0 * gammam1))
    return {"r": r, "v": v, "m": m, "h": h, "u": u}


def bossbodenheimer_ic(params, eos) -> Dict[str, np.ndarray]:
    """Boss-Bodenheimer rotating cloud collapse with an m=2 azimuthal
    density perturbation (src/Ic/BossBodenheimerIc.cpp)."""
    ip, fp = params.intparams, params.floatparams
    if ip["ndim"] != 3:
        raise ValueError("bossbodenheimer IC is 3D only")
    Npart = ip["Nhydro"]
    mcloud = fp["mcloud"]
    radius = fp["radius"]
    angvel = fp["angvel"]
    amp = fp["amp"]
    temp0 = fp["temp0"]
    mu_bar = fp["mu_bar"]
    gammam1 = fp["gamma_eos"] - 1.0
    h_fac = fp["h_fac"]
    mpert = 2

    dist = params.stringparams["particle_distribution"]
    if dist == "random":
        rng = np.random.default_rng(ip["randseed"])
        pts = []
        while len(pts) < Npart:
            cand = rng.uniform(-radius, radius, size=(Npart * 2, 3))
            cand = cand[(cand ** 2).sum(-1) <= radius * radius]
            pts.extend(cand.tolist())
        r = np.asarray(pts[:Npart])
    else:
        r = add_lattice_sphere(Npart, radius, 3)
    N = r.shape[0]

    # azimuthal remap: find phi' with phi = phi' + (amp/m) cos(m phi')
    # (Ic::AddAzimuthalDensityPerturbation) — Newton iteration
    phi = np.arctan2(r[:, 1], r[:, 0]) % (2 * np.pi)
    Rmag = np.sqrt(r[:, 0] ** 2 + r[:, 1] ** 2)
    phip = phi.copy()
    for _ in range(60):
        f = phip + (amp / mpert) * np.cos(mpert * phip) - phi
        fp_ = 1.0 - amp * np.sin(mpert * phip)
        phip = phip - f / fp_
    r[:, 0] = Rmag * np.cos(phip)
    r[:, 1] = Rmag * np.sin(phip)

    # solid-body rotation about z (Ic::AddRotationalVelocityField)
    v = np.zeros((N, 3))
    v[:, 0] = -angvel * r[:, 1]
    v[:, 1] = angvel * r[:, 0]

    rho0 = 3.0 * mcloud / (4.0 * np.pi * radius ** 3)
    u0 = temp0 / gammam1 / mu_bar
    m = np.full(N, mcloud / N)
    h = h_fac * (m / rho0) ** (1.0 / 3.0)
    u = np.full(N, u0)
    return {"r": r, "v": v, "m": m, "h": h, "u": u}


def plummer_hybrid_ic(params, eos) -> Dict[str, np.ndarray]:
    """Plummer sphere with both gas and stars (gasfrac/starfrac;
    src/Ic/PlummerSphereIc.cpp hybrid branch — the 'hybridplummer' test)."""
    ip, fp = params.intparams, params.floatparams
    gasfrac = fp["gasfrac"]
    starfrac = fp["starfrac"]
    tot = gasfrac + starfrac
    gasfrac, starfrac = gasfrac / tot, starfrac / tot
    gamma = fp["gamma_eos"]
    mplummer, rplummer = fp["mplummer"], fp["rplummer"]

    star = plummer_stars_ic(params)     # star positions/velocities
    Nhydro = ip["Nhydro"]
    out: Dict[str, np.ndarray] = {}
    if Nhydro > 0:
        p2 = params.copy()
        p2.set("Nstar", Nhydro)
        # independent draw from the same distribution (a shared seed would
        # place the first Nstar gas particles exactly on top of the stars)
        p2.set("randseed", params.intparams["randseed"] + 1)
        gas = plummer_stars_ic(p2)
        N = len(gas["m"])
        rad = np.sqrt((gas["r"] ** 2).sum(-1)) / rplummer
        sound = np.sqrt(1.0 / 6.0 / np.sqrt(1.0 + rad * rad)) \
            * np.sqrt(mplummer / rplummer)
        out["r"] = gas["r"]
        out["v"] = np.zeros_like(gas["v"])   # gas pressure-supported
        out["m"] = np.full(N, gasfrac * mplummer / N)
        out["u"] = sound ** 2 / (gamma - 1.0)
        rho0 = 3.0 * mplummer / (4.0 * np.pi * rplummer ** 3)
        out["h"] = fp["h_fac"] * (out["m"] / rho0) ** (1.0 / 3.0)
    star["m"] = star["m"] * starfrac
    out["star"] = star
    return out


def plummer_stars_ic(params) -> Dict[str, np.ndarray]:
    """Plummer sphere of stars via the Aarseth rejection method
    (src/Ic/PlummerSphereIc.cpp:57-170, star branch)."""
    ip, fp = params.intparams, params.floatparams
    Nstar = ip["Nstar"]
    mplummer = fp["mplummer"]
    rplummer = fp["rplummer"]
    radius = fp["radius"]
    rstar = fp["rstar"]
    rng = np.random.default_rng(ip["randseed"])

    r = np.zeros((Nstar, 3))
    v = np.zeros((Nstar, 3))
    n = 0
    while n < Nstar:
        x1, x2, x3 = rng.random(3)
        if x1 <= 0.0:
            continue
        rad = 1.0 / np.sqrt(x1 ** (-2.0 / 3.0) - 1.0)
        if rad > radius / rplummer:
            continue
        z = (1.0 - 2.0 * x2) * rad
        rxy = np.sqrt(max(rad * rad - z * z, 0.0))
        r[n] = [rxy * np.cos(2 * np.pi * x3), rxy * np.sin(2 * np.pi * x3), z]
        # velocity: rejection-sample q = v/v_esc from q^2 (1-q^2)^3.5
        ve = np.sqrt(2.0 / np.sqrt(1.0 + rad * rad))
        while True:
            x4, x5 = rng.random(2)
            if 0.1 * x5 <= x4 * x4 * (1.0 - x4 * x4) ** 3.5:
                break
        vm = ve * x4
        x6, x7 = rng.random(2)
        w = (1.0 - 2.0 * x6) * vm
        vxy = np.sqrt(max(vm * vm - w * w, 0.0))
        v[n] = [vxy * np.cos(2 * np.pi * x7), vxy * np.sin(2 * np.pi * x7), w]
        n += 1

    # scale to physical units (G = 1; Plummer natural units -> mplummer,
    # rplummer; velocity scale sqrt(M/R))
    vscale = np.sqrt(mplummer / rplummer)
    r *= rplummer
    v *= vscale
    m = np.full(Nstar, mplummer / Nstar)
    h = np.full(Nstar, rstar)
    ndim = params.intparams["ndim"]
    return {"r": r[:, :ndim], "v": v[:, :ndim], "m": m, "h": h}


def binary_ic(params) -> Dict[str, np.ndarray]:
    """Binary star from orbital elements (Ic::AddBinaryStar,
    src/Ic/Ic.cpp)."""
    fp = params.floatparams
    ndim = params.intparams["ndim"]
    if ndim < 2:
        raise ValueError("binary IC needs ndim >= 2")
    sma, ecc = fp["abin"], fp["ebin"]
    m1, m2 = fp["m1"], fp["m2"]
    rng = np.random.default_rng(params.intparams["randseed"])
    M = 2.0 * np.pi * rng.random()
    # solve Kepler's equation for the eccentric anomaly
    Ee = M
    for _ in range(100):
        Ee = Ee - (Ee - ecc * np.sin(Ee) - M) / (1.0 - ecc * np.cos(Ee))
    theta = 2.0 * np.arctan(np.sqrt((1.0 + ecc) / (1.0 - ecc))
                            * np.tan(0.5 * Ee))
    sep = sma * (1.0 - ecc * ecc) / (1.0 + ecc * np.cos(theta))
    vel = np.sqrt((m1 + m2) * (2.0 / sep - 1.0 / sma))
    hc = np.sqrt((1.0 + ecc * np.cos(theta)) / (2.0 - sep / sma))
    phi = np.arccos(np.clip(hc, -1.0, 1.0))
    mbin = m1 + m2

    r = np.zeros((2, ndim))
    v = np.zeros((2, ndim))
    rx = sep * np.cos(theta)
    ry = sep * np.sin(theta)
    vx = -vel * np.cos(0.5 * np.pi - theta + phi)
    vy = vel * np.sin(0.5 * np.pi - theta + phi)
    r[0, 0], r[0, 1] = rx * m2 / mbin, ry * m2 / mbin
    v[0, 0], v[0, 1] = vx * m2 / mbin, vy * m2 / mbin
    r[1, 0], r[1, 1] = -rx * m1 / mbin, -ry * m1 / mbin
    v[1, 0], v[1, 1] = -vx * m1 / mbin, -vy * m1 / mbin
    m = np.array([m1, m2])
    h = np.full(2, fp["rstar"])
    return {"r": r, "v": v, "m": m, "h": h}


def evrard_ic(params, eos) -> Dict[str, np.ndarray]:
    """Evrard collapse: 1/r density sphere, cold gas
    (src/Ic/EvrardCollapseIc.cpp:50-135).  A unit lattice sphere is
    stretched with rnew = R r^{3/2} so rho ~ 1/r."""
    ip, fp = params.intparams, params.floatparams
    ndim = ip["ndim"]
    if ndim != 3:
        raise ValueError("evrard IC is 3D only")
    mcloud = fp["mcloud"]
    radius = fp["radius"]
    u_fac = fp["thermal_energy"]
    r = add_lattice_sphere(ip["Nhydro"], 1.0, ndim)
    N = r.shape[0]
    rad = np.sqrt((r ** 2).sum(-1)) + 1e-30
    rnew = radius * rad * np.sqrt(rad)
    r = r * (rnew / rad)[:, None]
    m = np.full(N, mcloud / N)
    rho = (mcloud / (2.0 * np.pi * radius ** ndim)) * (radius / rnew)
    h = fp["h_fac"] * (m / rho) ** (1.0 / ndim)
    u = np.full(N, u_fac * mcloud / radius)
    out = {"r": r, "v": np.zeros((N, ndim)), "m": m, "h": h, "u": u}
    if params.stringparams["dust_forces"] not in ("none", "null", ""):
        from ..state import DUST_TYPE, GAS_TYPE

        d2g = fp["dust_mass_factor"]
        rd = r.copy()
        rd += 0.01 * h[:, None]
        out = {
            "r": np.concatenate([r, rd]),
            "v": np.zeros((2 * N, ndim)),
            "m": np.concatenate([m, m * d2g]),
            "h": np.concatenate([h, h]),
            "u": np.concatenate([u, np.zeros(N)]),
            "ptype": np.concatenate([np.full(N, GAS_TYPE, np.int32),
                                     np.full(N, DUST_TYPE, np.int32)]),
        }
    return out


def isothermsphere_ic(params, eos) -> Dict[str, np.ndarray]:
    """Static r^-2 density sphere (Ic::IsothermSphere + Addr2Sphere,
    src/Ic/IsothermalSphereIc.cpp:55-140, src/Ic/Ic.cpp:582-620)."""
    ip, fp = params.intparams, params.floatparams
    ndim = ip["ndim"]
    N = ip["Nhydro"]
    mcloud, radius = fp["mcloud"], fp["radius"]
    gammam1 = fp["gamma_eos"] - 1.0
    rng = np.random.default_rng(ip["randseed"])
    # uniform-in-radius sampling gives n(r) ~ r^-2
    phi = 2.0 * np.pi * rng.random(N)
    costheta = 2.0 * rng.random(N) - 1.0
    sintheta = np.sqrt(1.0 - costheta ** 2)
    rp = radius * rng.random(N)
    r = np.stack([rp * sintheta * np.cos(phi),
                  rp * sintheta * np.sin(phi),
                  rp * costheta], axis=-1)[:, :ndim]
    volume = 4.0 / 3.0 * np.pi * radius ** 3 if ndim == 3 else (
        np.pi * radius ** 2 if ndim == 2 else 2.0 * radius)
    rhofluid = mcloud / volume
    if params.stringparams["gas_eos"] == "isothermal":
        u0 = fp["temp0"] / gammam1 / fp["mu_bar"]
    else:
        u0 = fp["press1"] / rhofluid / gammam1
    m = np.full(N, mcloud / N)
    h = fp["h_fac"] * (m / rhofluid) ** (1.0 / ndim)
    return {"r": r, "v": np.zeros((N, ndim)), "m": m, "h": h,
            "u": np.full(N, u0)}


def turbulent_velocity_field(gridsize: int, power_turb: float,
                             seed: int, field_type: int = 2) -> np.ndarray:
    """Gaussian random velocity field with P(k) ~ k^power_turb
    (Ic::GenerateTurbulentVelocityField, src/Ic/Ic.cpp:1028-1260 —
    numpy-FFT reformulation of the FFTW original).  field_type 2 =
    divergence-free (solenoidal projection), 1 = curl-free."""
    rng = np.random.default_rng(seed)
    n = gridsize
    k1 = np.fft.fftfreq(n, d=1.0 / n)           # integer wavenumbers
    KX, KY, KZ = np.meshgrid(k1, k1, k1, indexing="ij")
    ksqd = KX ** 2 + KY ** 2 + KZ ** 2
    kmag = np.sqrt(np.maximum(ksqd, 1e-30))
    kmax = n // 2
    live = (ksqd > 0) & (ksqd < kmax * kmax)
    amp = np.where(live, kmag ** (power_turb / 2.0), 0.0)

    F = np.stack([amp * rng.standard_normal((n, n, n))
                  * np.exp(2j * np.pi * rng.random((n, n, n)))
                  for _ in range(3)])
    khat = np.stack([KX, KY, KZ]) / kmag
    fdotk = (F * khat).sum(0)
    if field_type == 2:       # solenoidal: remove the longitudinal part
        F = F - khat * fdotk
    elif field_type == 1:     # compressive: keep only the longitudinal part
        F = khat * fdotk
    v = np.real(np.fft.ifftn(F, axes=(1, 2, 3)))
    return np.moveaxis(v, 0, -1)                 # (n, n, n, 3)


def turbcore_ic(params, eos) -> Dict[str, np.ndarray]:
    """Uniform-density sphere with a turbulent velocity field scaled to
    alpha_turb = Ekin/|Egrav| (src/Ic/TurbulentCoreIc.cpp:60-220)."""
    ip, fp = params.intparams, params.floatparams
    ndim = ip["ndim"]
    if ndim != 3:
        raise ValueError("turbcore IC is 3D only")
    mcloud, radius = fp["mcloud"], fp["radius"]
    alpha_turb = fp["alpha_turb"]
    gridsize = max(ip["gridsize"], 8)
    r = add_lattice_sphere(ip["Nhydro"], radius, ndim)
    N = r.shape[0]
    rho0 = 3.0 * mcloud / (4.0 * np.pi * radius ** 3)
    m = np.full(N, mcloud / N)
    h = fp["h_fac"] * (m / rho0) ** (1.0 / 3.0)
    gammam1 = fp["gamma_eos"] - 1.0
    u0 = fp["temp0"] / gammam1 / fp["mu_bar"]

    vgrid = turbulent_velocity_field(gridsize, fp["power_turb"],
                                     ip["randseed"])
    # trilinear interpolation of the grid onto particle positions
    gpos = (r + radius) / (2.0 * radius) * (gridsize - 1)
    i0 = np.clip(gpos.astype(int), 0, gridsize - 2)
    w = gpos - i0
    v = np.zeros((N, 3))
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                wt = ((w[:, 0] if cx else 1 - w[:, 0])
                      * (w[:, 1] if cy else 1 - w[:, 1])
                      * (w[:, 2] if cz else 1 - w[:, 2]))
                v += wt[:, None] * vgrid[i0[:, 0] + cx, i0[:, 1] + cy,
                                         i0[:, 2] + cz]
    # scale to the requested virial ratio (TurbulentCoreIc.cpp:185-200)
    gpecloud = 0.6 * mcloud ** 2 / radius
    keturb = 0.5 * (m[:, None] * v * v).sum()
    vfactor = np.sqrt(alpha_turb * gpecloud / max(keturb, 1e-30))
    v *= vfactor
    return {"r": r, "v": v, "m": m, "h": h, "u": np.full(N, u0)}


def blob_ic(params, eos) -> Dict[str, np.ndarray]:
    """Dense cloud in a supersonic wind, pressure equilibrium
    (src/Ic/BlobIc.cpp:50-180)."""
    ip, fp = params.intparams, params.floatparams
    ndim = ip["ndim"]
    rho_bg = fp["rhofluid1"]
    rho_sph = fp["rhofluid2"]
    press = fp["press1"]
    mach = fp["mach"]
    radius = fp["radius"]
    gamma = fp["gamma_eos"]
    gammam1 = gamma - 1.0
    n_lattice = [ip[f"Nlattice1[{k}]"] for k in range(ndim)]
    boxmin = [fp[f"boxmin[{k}]"] for k in range(ndim)]
    boxmax = [fp[f"boxmax[{k}]"] for k in range(ndim)]
    rbg = add_cubic_lattice(n_lattice, boxmin, boxmax)
    rad_bg = np.sqrt((rbg ** 2).sum(-1))
    rbg = rbg[rad_bg > radius]
    volume_box = np.prod([boxmax[k] - boxmin[k] for k in range(ndim)])
    volume_sphere = (4.0 / 3.0 * np.pi * radius ** 3 if ndim == 3
                     else np.pi * radius ** 2)
    mpart = rho_bg * (volume_box - volume_sphere) / len(rbg)
    n_sphere = int(rho_sph * volume_sphere / mpart)
    rsph = add_lattice_sphere(n_sphere, radius, ndim)
    N = len(rsph) + len(rbg)
    r = np.concatenate([rsph, rbg])
    rho = np.concatenate([np.full(len(rsph), rho_sph),
                          np.full(len(rbg), rho_bg)])
    m = np.full(N, mpart)
    h = fp["h_fac"] * (m / rho) ** (1.0 / ndim)
    u = press / rho / gammam1
    v = np.zeros((N, ndim))
    sound_bg = np.sqrt(gamma * gammam1 * press / rho_bg / gammam1)
    v[len(rsph):, 0] = mach * sound_bg
    return {"r": r, "v": v, "m": m, "h": h, "u": u}


def cdiscontinuity_ic(params, eos) -> Dict[str, np.ndarray]:
    """1D contact discontinuity: two densities, equal pressure
    (src/Ic/ContactDiscontinuityIc.cpp)."""
    p2 = params.copy()
    p2.set("press2", params.floatparams["press1"])
    p2.set("vfluid1[0]", 0.0)
    p2.set("vfluid2[0]", 0.0)
    return shocktube_ic(p2, eos)


def disc_ic(params, eos) -> Dict[str, np.ndarray]:
    """Accretion disc around a central star (src/Ic/DiscIc.cpp:21-260):
    surface density Sigma ~ r^-p between rin/rout (rejection-sampled),
    Gaussian vertical structure with H = cs/Omega, locally-isothermal
    cs = H_r sqrt(M*/rin) (r/rin)^-q, Keplerian rotation (gas gets the
    pressure-gradient correction; the reference applies it to the dust
    branch, which looks like an index slip), central star + optional
    planet returned under 'star'."""
    ip, fp = params.intparams, params.floatparams
    ndim = ip["ndim"]
    if ndim < 2:
        raise ValueError("disc IC needs ndim >= 2")
    N = ip["Nhydro"]
    Mstar = fp["DiscIcStarMass"]
    mdisc = fp["DiscIcMass"]
    p_idx, q_idx = fp["DiscIcP"], fp["DiscIcQ"]
    rin, rout = fp["DiscIcRin"], fp["DiscIcRout"]
    H_r = fp["DiscIcHr"]
    gammam1 = fp["gamma_eos"] - 1.0
    rng = np.random.default_rng(ip["randseed"])

    # rejection-sample r from Sigma(r) r dr ~ (r/rin)^(1-p)
    f_max = (rout / rin) ** -(p_idx - 1) if p_idx <= 1 else 1.0
    rs = np.empty(N)
    got = 0
    while got < N:
        cand = rin + (rout - rin) * rng.random(2 * N)
        f = (cand / rin) ** -(p_idx - 1)
        keep = cand[rng.random(2 * N) * f_max < f]
        take = min(N - got, len(keep))
        rs[got:got + take] = keep[:take]
        got += take
    phi = 2.0 * np.pi * rng.random(N)

    cs0 = H_r * np.sqrt(Mstar / rin)
    cs = cs0 * (rs / rin) ** -q_idx
    omega = np.sqrt(Mstar / rs ** 3)
    H = cs / omega
    r = np.zeros((N, ndim))
    r[:, 0] = rs * np.cos(phi)
    r[:, 1] = rs * np.sin(phi)
    if ndim == 3:
        r[:, 2] = H * rng.standard_normal(N) / np.sqrt(2.0)

    # sub-Keplerian gas rotation (pressure-gradient correction)
    vk = np.sqrt(Mstar / rs)
    if ndim == 3:
        vk = vk * np.sqrt(np.maximum(
            1.0 - 0.5 * (H / rs) ** 2 * (1.5 + p_idx + q_idx), 0.0))
    else:
        vk = vk * np.sqrt(np.maximum(
            1.0 - (H / rs) ** 2 * (p_idx + 2 * q_idx), 0.0))
    v = np.zeros((N, ndim))
    v[:, 0] = -vk * np.sin(phi)
    v[:, 1] = vk * np.cos(phi)

    m = np.full(N, mdisc / N)
    if p_idx != 2:
        sig0 = (2 - p_idx) * mdisc * rin ** -p_idx / (2 * np.pi) \
            / (rout ** (2 - p_idx) - rin ** (2 - p_idx))
    else:
        sig0 = mdisc * rin ** 2 / (2 * np.pi) / np.log(rout / rin)
    sigma = sig0 * (rs / rin) ** -p_idx
    rho = sigma / (H * np.sqrt(np.pi)) if ndim == 3 else sigma
    h = 2.0 * fp["h_fac"] * (m / np.maximum(rho, 1e-30)) ** (1.0 / ndim)
    u = cs * cs / gammam1

    out = {"r": r, "v": v, "m": m, "h": h, "u": u}
    star_r = [np.zeros(ndim)]
    star_v = [np.zeros(ndim)]
    star_m = [Mstar]
    star_h = [rin / 2.0]
    if ip["DiscIcPlanet"]:
        rp = fp["DiscIcPlanetRadius"]
        mp = fp["DiscIcPlanetMass"]
        star_r.append(np.array([rp, 0.0] + [0.0] * (ndim - 2)))
        star_v.append(np.array([0.0, np.sqrt(Mstar / rp)]
                               + [0.0] * (ndim - 2)))
        star_m.append(mp)
        star_h.append(rp * (mp / 3.0) ** (1.0 / 3.0))
    out["star"] = {"r": np.asarray(star_r), "v": np.asarray(star_v),
                   "m": np.asarray(star_m), "h": np.asarray(star_h)}
    return out


def gaussianring_ic(params, eos) -> Dict[str, np.ndarray]:
    """2D Gaussian ring around a unit point mass (Murray 1996 viscous
    ring; src/Ic/GaussianRingIc.cpp:30-110)."""
    ip, fp = params.intparams, params.floatparams
    if ip["ndim"] != 2:
        raise ValueError("gaussianring IC is 2D only")
    temp0, mu_bar = fp["temp0"], fp["mu_bar"]
    gammam1 = fp["gamma_eos"] - 1.0
    N_req = ip["Nhydro"] if ip["Nhydro"] > 0 else 26376
    rcentre, width = 0.85, 0.025
    inner, outer = 0.80, 0.90
    nrings = 21
    nper = max(N_req // nrings, 1)
    N = nrings * nper
    iring = np.repeat(np.arange(nrings), nper)
    rr = inner + (outer - inner) * iring / (nrings - 1.0)
    jj = np.tile(np.arange(nper), nrings)
    phi = 2.0 * np.pi * jj / nper + 0.01 * iring   # de-align rings
    r = np.stack([rr * np.cos(phi), rr * np.sin(phi)], -1)
    sigma = np.exp(-((rr - rcentre) / width) ** 2)
    m = 0.01 / N * sigma
    vk = np.sqrt(1.0 / rr)
    v = np.stack([-vk * np.sin(phi), vk * np.cos(phi)], -1)
    u0 = temp0 / mu_bar / gammam1
    h = fp["h_fac"] * np.sqrt(m / np.maximum(
        sigma * 0.01 / (np.pi * (outer ** 2 - inner ** 2)), 1e-30))
    return {"r": r, "v": v, "m": m, "h": h, "u": np.full(N, u0),
            "star": {"r": np.zeros((1, 2)), "v": np.zeros((1, 2)),
                     "m": np.array([1.0]), "h": np.array([0.05])}}


def dustybox_ic(params, eos) -> Dict[str, np.ndarray]:
    """Uniform gas box + slightly-offset dust lattice with a velocity
    offset (DUSTYBOX drag test; src/Ic/DustyBoxIc.cpp:40-150)."""
    from ..state import DUST_TYPE, GAS_TYPE

    gas = uniform_box_ic(params, eos)
    fp = params.floatparams
    N = len(gas["m"])
    gas["v"][:, 0] = fp["vfluid1[0]"]
    d2g = fp["dust_mass_factor"]
    dust_r = gas["r"].copy()
    dust_r[:, 0] += 0.01 * gas["h"]
    dust_v = np.zeros_like(gas["v"])
    dust_v[:, 0] = fp["vfluid2[0]"]
    return {
        "r": np.concatenate([gas["r"], dust_r]),
        "v": np.concatenate([gas["v"], dust_v]),
        "m": np.concatenate([gas["m"], gas["m"] * d2g]),
        "h": np.concatenate([gas["h"], gas["h"]]),
        "u": np.concatenate([gas["u"], np.zeros(N)]),
        "ptype": np.concatenate([np.full(N, GAS_TYPE, np.int32),
                                 np.full(N, DUST_TYPE, np.int32)]),
    }


_IC_REGISTRY = {
    "disc": disc_ic,
    "gaussianring": gaussianring_ic,
    "dustybox": dustybox_ic,
    "evrard": evrard_ic,
    "isothermsphere": isothermsphere_ic,
    "turbcore": turbcore_ic,
    "blob": blob_ic,
    "cdiscontinuity": cdiscontinuity_ic,
    "shocktube": shocktube_ic,
    "soundwave": soundwave_ic,
    "box": uniform_box_ic,
    "sphere": sphere_ic,
    "sedov": sedov_ic,
    "khi": khi_ic,
    "gresho": gresho_ic,
    "noh": noh_ic,
    "bossbodenheimer": bossbodenheimer_ic,
    "plummer": plummer_hybrid_ic,
}

_NBODY_IC_REGISTRY = {
    "plummer": plummer_stars_ic,
    "binary": binary_ic,
}


def generate_nbody_ic(params) -> Dict[str, np.ndarray]:
    name = params.stringparams["ic"]
    if name not in _NBODY_IC_REGISTRY:
        raise ValueError(
            f"Unrecognised or not-yet-implemented nbody ic: {name!r}")
    return _NBODY_IC_REGISTRY[name](params)


def generate_ic(params, eos) -> Dict[str, np.ndarray]:
    """IC factory keyed by the `ic` parameter (SimulationIC.hpp:88-186)."""
    name = params.stringparams["ic"]
    if name not in _IC_REGISTRY:
        raise ValueError(f"Unrecognised or not-yet-implemented ic: {name!r}")
    return _IC_REGISTRY[name](params, eos)
