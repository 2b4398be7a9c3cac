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

from ..utils.rng import rng_from_params as _rng_from_params


def _sample_sphere(rng, n: int, ndim: int, radius: float) -> np.ndarray:
    """Uniform points in a sphere.  With the bit-exact xorshift generator
    this follows the reference's EXACT draw order and rejection cadence
    (Ic::AddRandomSphere, src/Ic/Ic.cpp:481-492) so same-seed ICs are
    particle-identical; the numpy-Generator path keeps the batched
    equivalent-distribution sampler."""
    from ..utils.rng import XorshiftRand

    if isinstance(rng, XorshiftRand):
        return radius * rng.random_sphere(n, ndim)
    pts = []
    got = 0
    while got < n:
        cand = rng.uniform(-radius, radius, size=(2 * n, ndim))
        cand = cand[(cand ** 2).sum(-1) <= radius * radius]
        pts.append(cand[: n - got])
        got += len(pts[-1])
    return np.concatenate(pts, axis=0)


def _mc_density_field(rng, n: int, ndim: int, lo, hi, density_fn,
                      rho_max: float) -> np.ndarray:
    """Monte-Carlo density-field sampling.  The xorshift path replays the
    reference cadence exactly (Ic::AddMonteCarloDensityField preceded by
    the 10^6-sample GetMaximumDensity scan, src/Ic/Ic.cpp:375-428);
    `rho_max` is used directly on the numpy-Generator path (same
    distribution, batched)."""
    from ..utils.rng import XorshiftRand

    lo = np.asarray(lo, float)
    hi = np.asarray(hi, float)
    if isinstance(rng, XorshiftRand):
        # GetMaximumDensity prelude: 1e6 samples, ndim draws each
        u = rng.fill(1000000 * ndim).reshape(-1, ndim)
        rho_scan = float(np.max(np.asarray(
            density_fn(lo[None, :] + (hi - lo)[None, :] * u))))
        return rng.montecarlo_field(n, ndim, lo, hi, density_fn,
                                    max(rho_scan, 1e-300))
    out = []
    need = n
    while need > 0:
        cand = lo + (hi - lo) * rng.random((2 * need + 64, ndim))
        keep = rng.random(len(cand)) * rho_max < np.asarray(
            density_fn(cand))
        out.append(cand[keep][:need])
        need = n - sum(len(o) for o in out)
    return np.concatenate(out)[:n]


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
        r = _sample_sphere(_rng_from_params(params), n_target, ndim,
                           radius)
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
    kern = kernel_factory(params.stringparams["kernel"], ndim,
                          params.intparams["tabulated_kernel"])

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
        r = _sample_sphere(_rng_from_params(params), Npart, 3, radius)
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
    rng = _rng_from_params(params)

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


def _binary_offsets(sma, ecc, m1, m2, M, ndim):
    """Positions/velocities of a two-body pair about its barycentre from
    orbital elements at mean anomaly M (Ic::AddBinaryStar, src/Ic/Ic.cpp).

    Returns (r1, v1, r2, v2) each of shape (ndim,)."""
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
    rx = sep * np.cos(theta)
    ry = sep * np.sin(theta)
    vx = -vel * np.cos(0.5 * np.pi - theta + phi)
    vy = vel * np.sin(0.5 * np.pi - theta + phi)
    r1 = np.zeros(ndim)
    v1 = np.zeros(ndim)
    r2 = np.zeros(ndim)
    v2 = np.zeros(ndim)
    r1[0], r1[1] = rx * m2 / mbin, ry * m2 / mbin
    v1[0], v1[1] = vx * m2 / mbin, vy * m2 / mbin
    r2[0], r2[1] = -rx * m1 / mbin, -ry * m1 / mbin
    v2[0], v2[1] = -vx * m1 / mbin, -vy * m1 / mbin
    return r1, v1, r2, v2


def binary_ic(params) -> Dict[str, np.ndarray]:
    """Binary star from orbital elements (Ic::AddBinaryStar,
    src/Ic/Ic.cpp)."""
    fp = params.floatparams
    ndim = params.intparams["ndim"]
    if ndim < 2:
        raise ValueError("binary IC needs ndim >= 2")
    rng = _rng_from_params(params)
    M = 2.0 * np.pi * rng.random()
    m1, m2 = fp["m1"], fp["m2"]
    r1, v1, r2, v2 = _binary_offsets(fp["abin"], fp["ebin"], m1, m2, M,
                                     ndim)
    return {"r": np.stack([r1, r2]), "v": np.stack([v1, v2]),
            "m": np.array([m1, m2]), "h": np.full(2, fp["rstar"])}


def triple_ic(params) -> Dict[str, np.ndarray]:
    """Hierarchical triple: outer binary of (m1+m2) and m3 at abin, the
    first component replaced by an inner (m1, m2) binary at abin2
    (HierarchicalSystemIc.cpp:88-117)."""
    fp = params.floatparams
    ndim = params.intparams["ndim"]
    if ndim < 2:
        raise ValueError("triple IC needs ndim >= 2")
    rng = _rng_from_params(params)
    m1, m2, m3 = fp["m1"], fp["m2"], fp["m3"]
    R1, V1, R3, V3 = _binary_offsets(fp["abin"], fp["ebin"], m1 + m2, m3,
                                     2.0 * np.pi * rng.random(), ndim)
    r1, v1, r2, v2 = _binary_offsets(fp["abin2"], fp["ebin2"], m1, m2,
                                     2.0 * np.pi * rng.random(), ndim)
    return {
        "r": np.stack([R1 + r1, R1 + r2, R3]),
        "v": np.stack([V1 + v1, V1 + v2, V3]),
        "m": np.array([m1, m2, m3]),
        "h": np.full(3, fp["rstar"]),
    }


def quadruple_ic(params) -> Dict[str, np.ndarray]:
    """Hierarchical quadruple: outer binary of (m1+m2) and (m3+m4), each
    component an inner binary at abin2 (HierarchicalSystemIc.cpp:119-150)."""
    fp = params.floatparams
    ndim = params.intparams["ndim"]
    if ndim < 2:
        raise ValueError("quadruple IC needs ndim >= 2")
    rng = _rng_from_params(params)
    m1, m2, m3, m4 = fp["m1"], fp["m2"], fp["m3"], fp["m4"]
    RA, VA, RB, VB = _binary_offsets(fp["abin"], fp["ebin"],
                                     m1 + m2, m3 + m4,
                                     2.0 * np.pi * rng.random(), ndim)
    r1, v1, r2, v2 = _binary_offsets(fp["abin2"], fp["ebin2"], m1, m2,
                                     2.0 * np.pi * rng.random(), ndim)
    r3, v3, r4, v4 = _binary_offsets(fp["abin2"], fp["ebin2"], m3, m4,
                                     2.0 * np.pi * rng.random(), ndim)
    return {
        "r": np.stack([RA + r1, RA + r2, RB + r3, RB + r4]),
        "v": np.stack([VA + v1, VA + v2, VB + v3, VB + v4]),
        "m": np.array([m1, m2, m3, m4]),
        "h": np.full(4, fp["rstar"]),
    }


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
    rng = _rng_from_params(params)
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
    v = np.zeros((N, ndim))
    name = params.stringparams["ic"]
    if name == "rotisothermsphere" and ndim == 3:
        # solid-body rotation about z at angular velocity omega
        # (IsothermalSphereIc.cpp:123-215 rotisothermsphere branch)
        omega = fp["omega"] or fp["angvel"]
        v[:, 0] = -omega * r[:, 1]
        v[:, 1] = omega * r[:, 0]
    elif name == "turbisothermsphere" and ndim == 3:
        # turbulent velocities scaled to alpha_turb * |Egrav|
        # (IsothermalSphereIc.cpp:216-330)
        gridsize = ip.get("gridsize", 32) if hasattr(ip, "get") else 32
        vgrid = turbulent_velocity_field(gridsize, fp["power_turb"],
                                         ip["randseed"])
        # trilinear-free nearest-cell sample of the periodic field
        scale = (r / (2.0 * radius) + 0.5) * (gridsize - 1)
        idx = np.clip(scale.astype(np.int64), 0, gridsize - 1)
        v = vgrid[idx[:, 0], idx[:, 1], idx[:, 2]]
        keturb = 0.5 * (m[:, None] * v ** 2).sum()
        gpecloud = 3.0 / 5.0 * mcloud ** 2 / radius
        v *= np.sqrt(fp["alpha_turb"] * gpecloud
                     / max(keturb, 1e-30))
    return {"r": r, "v": v, "m": m, "h": h,
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
    rng = _rng_from_params(params)

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


def _thermal_u(params) -> float:
    """u from either the isothermal (temp0/mu_bar) or adiabatic
    (press1/rho1) parameters, as the reference IC generators do."""
    fp = params.floatparams
    gammam1 = fp["gamma_eos"] - 1.0
    if params.stringparams["gas_eos"] == "isothermal":
        return fp["temp0"] / gammam1 / fp["mu_bar"]
    return fp["press1"] / fp["rhofluid1"] / gammam1


def _sinusoidal_displace(x: np.ndarray, amp: float, lam: float) -> np.ndarray:
    """Displace lattice x so the density becomes rho0(1 + amp sin(k x))
    (Ic::AddSinusoidalDensityPerturbation fixed-point iteration)."""
    kwave = 2.0 * np.pi / lam
    xnew = x.copy()
    for _ in range(200):
        xnew = x - amp * (1.0 - np.cos(kwave * xnew)) / kwave
    return xnew


def jeans_ic(params, eos) -> Dict[str, np.ndarray]:
    """Sinusoidal density perturbation on a 3D periodic lattice for the
    Jeans-instability / Ewald sine-perturbation tests
    (src/Ic/EwaldIc.cpp:139-186, 'ewaldsine' == 'jeans')."""
    fp, ip = params.floatparams, params.intparams
    ndim = ip["ndim"]
    n_lat = [ip[f"Nlattice1[{k}]"] for k in range(ndim)]
    lo = [fp[f"boxmin[{k}]"] for k in range(ndim)]
    hi = [fp[f"boxmax[{k}]"] for k in range(ndim)]
    rho0 = fp["rhofluid1"]
    amp = fp["amp"]
    lam = hi[0] - lo[0]
    r = add_cubic_lattice(n_lat, lo, hi)
    r[:, 0] = _sinusoidal_displace(r[:, 0], amp, lam)
    # wrap displaced particles back into the periodic box
    r[:, 0] = lo[0] + np.mod(r[:, 0] - lo[0], lam)
    N = len(r)
    volume = np.prod(np.asarray(hi) - np.asarray(lo))
    m = np.full(N, rho0 * volume / N)
    h = fp["h_fac"] * (m / rho0) ** (1.0 / ndim)
    u = np.full(N, _thermal_u(params))
    return {"r": r, "v": np.zeros_like(r), "m": m, "h": h, "u": u}


def basic_sine_ic(params, eos) -> Dict[str, np.ndarray]:
    """Monte-Carlo sampled rho0(1 + amp sin(2 pi x / lambda)) density field
    (src/Ic/BasicIc.cpp)."""
    fp, ip = params.floatparams, params.intparams
    ndim = ip["ndim"]
    N = ip["Nhydro"]
    lo = np.array([fp[f"boxmin[{k}]"] for k in range(ndim)])
    hi = np.array([fp[f"boxmax[{k}]"] for k in range(ndim)])
    rho0, amp = fp["rhofluid1"], fp["amp"]
    lam = hi[0] - lo[0]
    rng = _rng_from_params(params)
    # rejection sampling against the density envelope
    # (Ic::AddMonteCarloDensityField over BasicIc::GetValue)
    dens_fn = lambda rr: 1.0 + amp * np.sin(2.0 * np.pi
                                            * rr[:, 0] / lam)
    r = _mc_density_field(rng, N, ndim, lo, hi, dens_fn, 1.0 + abs(amp))
    volume = np.prod(hi - lo)
    m = np.full(N, rho0 * volume / N)
    h = fp["h_fac"] * (m / rho0) ** (1.0 / ndim)
    u = np.full(N, _thermal_u(params))
    return {"r": r, "v": np.zeros_like(r), "m": m, "h": h, "u": u}


def _mass_weighted_box(params, rho_fn) -> Dict[str, np.ndarray]:
    """Lattice positions with per-particle masses following rho_fn(r)
    (the EwaldIc variable-mass pattern, src/Ic/EwaldIc.cpp:187-320)."""
    fp, ip = params.floatparams, params.intparams
    ndim = ip["ndim"]
    n_lat = [ip[f"Nlattice1[{k}]"] for k in range(ndim)]
    lo = [fp[f"boxmin[{k}]"] for k in range(ndim)]
    hi = [fp[f"boxmax[{k}]"] for k in range(ndim)]
    r = add_cubic_lattice(n_lat, lo, hi)
    N = len(r)
    volume = np.prod(np.asarray(hi) - np.asarray(lo))
    rho = rho_fn(r)
    m = rho * volume / N
    h = fp["h_fac"] * (m / np.maximum(rho, 1e-30)) ** (1.0 / ndim)
    u = np.full(N, _thermal_u(params))
    return {"r": r, "v": np.zeros_like(r), "m": m, "h": h, "u": u}


def _periodicity_code(params) -> int:
    """Bitmask of fully-periodic dimensions (EwaldIc.cpp:122-134)."""
    ndim = params.intparams["ndim"]
    code = 0
    for k in range(ndim):
        if (params.stringparams[f"boundary_lhs[{k}]"] == "periodic"
                and params.stringparams[f"boundary_rhs[{k}]"] == "periodic"):
            code |= 1 << k
    return code


def _ic_sound_speed(params) -> float:
    fp = params.floatparams
    if params.stringparams["gas_eos"] == "isothermal":
        return float(np.sqrt(fp["temp0"] / fp["mu_bar"]))
    return float(np.sqrt(fp["gamma_eos"] * fp["press1"] / fp["rhofluid1"]))


def ewaldsine2_ic(params, eos) -> Dict[str, np.ndarray]:
    fp = params.floatparams
    lam = fp["boxmax[0]"] - fp["boxmin[0]"]
    kwave = 2.0 * np.pi / lam
    return _mass_weighted_box(
        params, lambda r: fp["rhofluid1"]
        * (1.0 + fp["amp"] * np.sin(kwave * r[:, 0])))


def ewaldslab_ic(params, eos) -> Dict[str, np.ndarray]:
    """Self-gravitating isothermal slab: rho = rho0 sech^2(z/h0) with
    h0 = cs/sqrt(2 pi rho0) normal to the non-periodic dimension."""
    fp = params.floatparams
    rho0 = fp["rhofluid1"]
    cs = _ic_sound_speed(params)
    h0 = cs / np.sqrt(2.0 * np.pi * rho0)
    per = _periodicity_code(params)
    axis = {3: 2, 5: 1, 6: 0}.get(per)
    if axis is None:
        raise ValueError("ewaldslab needs periodic boundaries in exactly "
                         "two dimensions")
    return _mass_weighted_box(
        params, lambda r: rho0 / np.cosh(r[:, axis] / h0) ** 2)


def ewaldcylinder_ic(params, eos) -> Dict[str, np.ndarray]:
    """Self-gravitating isothermal cylinder (Ostriker profile):
    rho = rho0 / (1 + pi rho0 r_perp^2 / (2 cs^2))^2."""
    fp = params.floatparams
    rho0 = fp["rhofluid1"]
    cs = _ic_sound_speed(params)
    a2inv = np.pi * rho0 * 0.5 / cs ** 2
    per = _periodicity_code(params)
    perp = {1: (1, 2), 2: (0, 2), 4: (0, 1)}.get(per)
    if perp is None:
        raise ValueError("ewaldcylinder needs periodic boundaries in "
                         "exactly one dimension")
    return _mass_weighted_box(
        params, lambda r: rho0 / (1.0 + a2inv * (r[:, perp[0]] ** 2
                                                 + r[:, perp[1]] ** 2)) ** 2)


def shearflow_ic(params, eos) -> Dict[str, np.ndarray]:
    """2D sinusoidal shear flow: vx = amp sin(2 pi y / Ly)
    (src/Ic/ShearflowIc.cpp:57-118)."""
    fp, ip = params.floatparams, params.intparams
    ndim = ip["ndim"]
    if ndim < 2:
        raise ValueError("shearflow IC needs ndim >= 2")
    n_lat = [ip[f"Nlattice1[{k}]"] for k in range(ndim)]
    lo = [fp[f"boxmin[{k}]"] for k in range(ndim)]
    hi = [fp[f"boxmax[{k}]"] for k in range(ndim)]
    rho0, amp = fp["rhofluid1"], fp["amp"]
    kwave = 2.0 * np.pi / (hi[1] - lo[1])
    r = add_cubic_lattice(n_lat, lo, hi)
    N = len(r)
    v = np.zeros_like(r)
    v[:, 0] = amp * np.sin(kwave * r[:, 1])
    volume = np.prod(np.asarray(hi) - np.asarray(lo))
    m = np.full(N, rho0 * volume / N)
    h = fp["h_fac"] * (m / rho0) ** (1.0 / ndim)
    u = np.full(N, fp["press1"] / rho0 / (fp["gamma_eos"] - 1.0))
    return {"r": r, "v": v, "m": m, "h": h, "u": u}


def rti_ic(params, eos) -> Dict[str, np.ndarray]:
    """2D Rayleigh-Taylor instability: heavy-over-light with a smooth
    (sigmoid) interface at y = 0.5 and a seeded vy perturbation
    (src/Ic/RayleighTaylorIc.cpp:57-161)."""
    fp, ip = params.floatparams, params.intparams
    if ip["ndim"] != 2:
        raise ValueError("rti IC is 2D only")
    rho1, rho2 = fp["rhofluid1"], fp["rhofluid2"]
    press1, press2 = fp["press1"], fp["press2"]
    gammam1 = fp["gamma_eos"] - 1.0
    amp = fp["amp"]
    lo = [fp["boxmin[0]"], fp["boxmin[1]"]]
    hi = [fp["boxmax[0]"], fp["boxmax[1]"]]
    ymid = 0.5 * (lo[1] + hi[1])
    n1 = [ip["Nlattice1[0]"], ip["Nlattice1[1]"]]
    n2 = [ip["Nlattice2[0]"], ip["Nlattice2[1]"]]
    r1 = add_cubic_lattice(n1, lo, [hi[0], ymid])
    r2 = add_cubic_lattice(n2, [lo[0], ymid], hi)
    volume = (hi[0] - lo[0]) * (ymid - lo[1])
    delta = 0.025

    def rho_at(r):
        return rho1 + (rho2 - rho1) / (1.0 + np.exp(-(r[:, 1] - 0.5)
                                                    / delta))

    m1 = rho_at(r1) * volume / len(r1)
    m2 = rho_at(r2) * volume / len(r2)
    h1 = fp["h_fac"] * (m1 / rho1) ** 0.5
    h2 = fp["h_fac"] * (m2 / rho2) ** 0.5
    u1 = np.full(len(r1), press1 / rho1 / gammam1)
    u2 = np.full(len(r2), press2 / rho2 / gammam1)
    r = np.concatenate([r1, r2])
    m = np.concatenate([m1, m2])
    h = np.concatenate([h1, h2])
    u = np.concatenate([u1, u2])
    v = np.zeros_like(r)
    band = (r[:, 1] >= 0.3) & (r[:, 1] <= 0.7)
    v[:, 1] = np.where(
        band,
        amp * (1.0 + np.cos(8.0 * np.pi * (r[:, 0] + 0.25)))
        * (1.0 + np.cos(5.0 * np.pi * (r[:, 1] - 0.5))), 0.0)
    return {"r": r, "v": v, "m": m, "h": h, "u": u}


def shock2d_ic(params, eos) -> Dict[str, np.ndarray]:
    """Diagonal 2D/3D Sod-like shock: high-density state where
    x/Lx + y/Ly >= 0.5, low-density state elsewhere
    (src/Ic/Shock2DIc.cpp:55-200; fixed rho/P states 1/1 and 0.125/0.14)."""
    fp, ip = params.floatparams, params.intparams
    ndim = ip["ndim"]
    rho0, p0 = 1.0, 1.0
    rho1, p1 = 0.125, 0.14
    gammam1 = fp["gamma_eos"] - 1.0
    n_lat = [ip[f"Nlattice1[{k}]"] for k in range(ndim)]
    lo = [fp[f"boxmin[{k}]"] for k in range(ndim)]
    hi = [fp[f"boxmax[{k}]"] for k in range(ndim)]
    volume = np.prod(np.asarray(hi) - np.asarray(lo))
    scale = [1.0 / (hi[k] - lo[k]) for k in range(2)]

    ra = add_cubic_lattice(n_lat, lo, hi)
    xa = ra[:, 0] * scale[0] + ra[:, 1] * scale[1]
    ra = ra[xa >= 0.5]
    ratio = (rho1 / rho0) ** (1.0 / ndim)
    n_lat2 = [max(int(n * ratio), 1) for n in n_lat]
    rb = add_cubic_lattice(n_lat2, lo, hi)
    xb = rb[:, 0] * scale[0] + rb[:, 1] * scale[1]
    rb = rb[xb < 0.5]
    m_a = np.full(len(ra), 0.875 * volume * rho0 / len(ra))
    m_b = np.full(len(rb), 0.125 * volume * rho1 / len(rb))
    h_a = fp["h_fac"] * (m_a / rho0) ** (1.0 / ndim)
    h_b = fp["h_fac"] * (m_b / rho1) ** (1.0 / ndim)
    u_a = np.full(len(ra), p0 / rho0 / gammam1)
    u_b = np.full(len(rb), p1 / rho1 / gammam1)
    r = np.concatenate([ra, rb])
    m = np.concatenate([m_a, m_b])
    h = np.concatenate([h_a, h_b])
    u = np.concatenate([u_a, u_b])
    return {"r": r, "v": np.zeros_like(r), "m": m, "h": h, "u": u}


def spitzer_ic(params, eos) -> Dict[str, np.ndarray]:
    """Cold uniform sphere for the Spitzer HII-region expansion test
    (src/Ic/SpitzerExpansionIc.cpp:57-130): u = tiny, ionisation drives
    the dynamics."""
    fp, ip = params.floatparams, params.intparams
    if ip["ndim"] != 3:
        raise ValueError("spitzer IC is 3D only")
    N = ip["Nhydro"]
    mcloud, radius = fp["mcloud"], fp["radius"]
    r = add_lattice_sphere(N, radius, 3)
    N = len(r)
    volume = 4.0 / 3.0 * np.pi * radius ** 3
    rho = mcloud / volume
    m = np.full(N, mcloud / N)
    h = fp["h_fac"] * (m / rho) ** (1.0 / 3.0)
    u = np.full(N, 1e-20)
    return {"r": r, "v": np.zeros_like(r), "m": m, "h": h, "u": u}


def filament_ic(params, eos) -> Dict[str, np.ndarray]:
    """Rejection-sampled filament rho(R, z) = rho0 / (1 + R^2/r0^2
    + z^2/(a^2 r0^2)) with aconst = 10.9 (src/Ic/FilamentIc.cpp:160-175;
    dimensionless variant of the reference's physical-unit setup)."""
    fp, ip = params.floatparams, params.intparams
    if ip["ndim"] != 3:
        raise ValueError("filament IC is 3D only")
    N = ip["Nhydro"]
    r0 = fp["radius"]
    aconst = 10.9
    lo = np.array([fp[f"boxmin[{k}]"] for k in range(3)])
    hi = np.array([fp[f"boxmax[{k}]"] for k in range(3)])
    rng = _rng_from_params(params)
    out = []
    need = N
    while need > 0:
        cand = lo + (hi - lo) * rng.random((4 * need + 16, 3))
        radsqd = cand[:, 0] ** 2 + cand[:, 1] ** 2
        dens = 1.0 / (1.0 + radsqd / r0 ** 2
                      + cand[:, 2] ** 2 / (r0 * aconst) ** 2)
        keep = rng.random(len(cand)) < dens
        out.append(cand[keep][:need])
        need = N - sum(len(o) for o in out)
    r = np.concatenate(out)[:N]
    mcloud = fp["mcloud"]
    m = np.full(N, mcloud / N)
    # crude local rho estimate for the initial h
    rho_c = mcloud / np.prod(hi - lo)
    h = fp["h_fac"] * (m / rho_c) ** (1.0 / 3.0)
    u = np.full(N, _thermal_u(params))
    return {"r": r, "v": np.zeros_like(r), "m": m, "h": h, "u": u}


def _bondi_solution(n: int = 4096):
    """Dimensionless transonic isothermal Bondi solution via the Lambert-W
    closed form (x = r/r_sonic, w = |v|/a, y = rho/rho_inf,
    z = enclosed mass in units of 4 pi r_sonic^3 rho_inf).

    Bernoulli + continuity give  w^2 - 2 ln w = 4 ln x + 4/x - 3, i.e.
    w^2 = -W(-exp(-(4 ln x + 4/x - 3)))  on the W_-1 branch inside the
    sonic point and W_0 outside (reference: tabulated RK4,
    src/Ic/BondiAccretionIc.cpp:44-200 — same solution, different route).
    """
    from scipy.special import lambertw

    x = np.geomspace(1e-4, 40.0, n)
    g = 4.0 * np.log(x) + 4.0 / x - 3.0
    # clamp to the W branch point -1/e: near the sonic point (g -> 1)
    # rounding can push the argument just past it, where W returns NaN
    arg = np.maximum(-np.exp(-g), -(1.0 - 1e-12) / np.e)
    wsq = np.empty_like(x)
    inside = x < 1.0
    wsq[inside] = -lambertw(arg[inside], k=-1).real
    wsq[~inside] = -lambertw(arg[~inside], k=0).real
    # deep inside the sonic point e^-g underflows to 0 and W_-1(-0) = -inf;
    # there f = w^2 solves f - ln f = g with f >> 1, i.e. f ~ g + ln g
    under = inside & (arg > -1e-280)
    f = np.maximum(g, 2.0)
    for _ in range(50):
        f = g + np.log(f)
    wsq[under] = f[under]
    w = np.sqrt(np.maximum(wsq, 1e-30))
    y = np.exp(1.5) / (x * x * w)
    # z(x) = int_0^x y x'^2 dx' = e^1.5 int dx'/w
    dz = np.exp(1.5) / w
    z = np.concatenate([[0.0], np.cumsum(0.5 * (dz[1:] + dz[:-1])
                                         * np.diff(x))])
    return x, w, y, z


def bondi_ic(params, eos) -> Dict[str, np.ndarray]:
    """Bondi accretion onto a sink: a uniform sphere stretched so the
    enclosed-mass profile matches the transonic Bondi solution, with the
    matching radial inflow (src/Ic/BondiAccretionIc.cpp:205-350).

    Returns gas + one star (the sink) at the origin.
    """
    fp, ip = params.floatparams, params.intparams
    if ip["ndim"] != 3:
        raise ValueError("bondi IC is 3D only")
    N = ip["Nhydro"]
    temp0, mu_bar = fp["temp0"], fp["mu_bar"]
    mcloud, msink = fp["mcloud"], fp["m1"]
    rhogas = fp["rhofluid1"]
    asound = np.sqrt(temp0 / mu_bar)
    rsonic = 0.5 * msink / asound ** 2

    x, w, y, z = _bondi_solution()
    if mcloud > z[-1]:
        raise ValueError("bondi: cloud mass too big for solution table")
    r_sphere = add_lattice_sphere(N, 1.0, 3)
    N = len(r_sphere)
    drmag = np.linalg.norm(r_sphere, axis=1) + 1e-30
    mint = mcloud * drmag ** 3
    radp = np.interp(mint, z, x)
    vradp = np.interp(mint, z, w)
    r = rsonic * r_sphere * (radp / drmag)[:, None]
    v = -asound * (vradp / drmag)[:, None] * r_sphere
    mp = 4.0 * np.pi * rsonic ** 3 * rhogas * mcloud / N
    m = np.full(N, mp)
    rho_local = rhogas * np.interp(radp, x, y)
    h = fp["h_fac"] * (m / np.maximum(rho_local, 1e-30)) ** (1.0 / 3.0)
    gammam1 = fp["gamma_eos"] - 1.0
    u = np.full(N, temp0 / gammam1 / mu_bar)
    return {
        "r": r, "v": v, "m": m, "h": h, "u": u,
        "star": {"r": np.zeros((1, 3)), "v": np.zeros((1, 3)),
                 "m": np.array([msink]),
                 "h": np.array([fp["sink_radius"] * rsonic])},
    }


# ---------------------------------------------------------------------------
# file / polytrope / silcc / binaryacc ICs + Lloyd regularisation
# ---------------------------------------------------------------------------

def file_ic(params, eos) -> Dict[str, np.ndarray]:
    """Read initial conditions from a snapshot file
    (ic = file; SimulationIC.hpp:88-92 ReadSnapshotFile).  The controller's
    setup path applies the unit rescale exactly as for a restart; the run
    starts at t = 0 (the reference also discards the snapshot time)."""
    from . import io as sim_io

    fname = params.stringparams["in_file"]
    form = params.stringparams["in_file_form"]
    if not fname:
        raise ValueError("ic = file requires in_file")
    if form in ("su", "seren_unform"):
        _, data = sim_io.read_seren_unform(fname)
    elif form in ("sf", "seren_form"):
        _, data = sim_io.read_seren_form(fname)
    elif form in ("column", "ascii"):
        _, data = sim_io.read_column_snapshot(fname)
    else:
        raise ValueError(f"unknown in_file_form {form!r}")
    if not params.intparams["dimensionless"]:
        # file data is in OUTPUT units (reference rescale_particle_data)
        from ..units import SimUnits

        units = SimUnits()
        units.setup_units(params)
        for k, q in (("r", "r"), ("v", "v"), ("m", "m"), ("h", "r"),
                     ("rho", "rho"), ("u", "u")):
            if k in data:
                data[k] = np.asarray(data[k]) / units.output_scale(q)
    N = len(data["m"])
    ndim = params.intparams["ndim"]
    data.setdefault("v", np.zeros((N, ndim)))
    data.setdefault("u", np.zeros(N))
    if "h" not in data or np.all(np.asarray(data.get("h", 0)) == 0):
        h_fac = params.floatparams["h_fac"]
        rho0 = np.asarray(data.get("rho", np.ones(N)))
        rho0 = np.where(rho0 > 0, rho0, 1.0)
        data["h"] = h_fac * (np.asarray(data["m"]) / rho0) ** (1.0 / ndim)
    return data


def _lane_emden(n_poly: float, dxi: float = 1e-3):
    """Integrate the Lane-Emden equation theta'' + 2 theta'/xi = -theta^n
    to the first zero.  Returns (xi, theta, dtheta_dxi) arrays."""
    xis, thetas, dthetas = [dxi], [1.0 - dxi * dxi / 6.0], [-dxi / 3.0]
    xi, th, dth = xis[0], thetas[0], dthetas[0]

    def rhs(xi, y):
        th, dth = y
        return np.array([dth, -max(th, 0.0) ** n_poly - 2.0 * dth / xi])

    y = np.array([th, dth])
    while y[0] > 0.0 and xi < 50.0:
        k1 = rhs(xi, y)
        k2 = rhs(xi + 0.5 * dxi, y + 0.5 * dxi * k1)
        k3 = rhs(xi + 0.5 * dxi, y + 0.5 * dxi * k2)
        k4 = rhs(xi + dxi, y + dxi * k3)
        y = y + dxi / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        xi += dxi
        xis.append(xi)
        thetas.append(max(y[0], 0.0))
        dthetas.append(y[1])
    return np.asarray(xis), np.asarray(thetas), np.asarray(dthetas)


def polytrope_ic(params, eos) -> Dict[str, np.ndarray]:
    """Equilibrium polytropic sphere from the Lane-Emden solution with
    index n = 1/(eta_eos - 1) (ic = polytrope; the reference's
    PolytropeIc tabulates the same arrays, src/Ic/PolytropeIc.cpp:42-64,
    but its Generate() was left unfinished — this is the completed
    mass-shell-stretched lattice version).  mcloud/radius set the total
    mass and outer radius; u is the equilibrium polytropic internal
    energy (G = 1)."""
    fp, ip = params.floatparams, params.intparams
    if ip["ndim"] != 3:
        raise ValueError("polytrope IC is 3D only")
    eta = fp["eta_eos"]
    if eta <= 1.0:
        raise ValueError("polytrope needs eta_eos > 1")
    n_poly = 1.0 / (eta - 1.0)
    N = ip["Nhydro"]
    M, R = fp["mcloud"], fp["radius"]

    xi, theta, dtheta = _lane_emden(n_poly)
    xi1 = xi[-1]
    # cumulative dimensionless mass mu(xi) = -xi^2 theta'
    mu = -xi * xi * dtheta
    mu = np.maximum.accumulate(np.maximum(mu, 0.0))
    mu1 = mu[-1]

    alpha = R / xi1                      # length scale
    rhoc = M / (4.0 * np.pi * alpha ** 3 * mu1)
    K = 4.0 * np.pi * alpha * alpha * rhoc ** (eta - 2.0) / (n_poly + 1.0)

    # uniform lattice sphere stretched so enclosed mass matches mu(xi)
    r_unit = add_lattice_sphere(N, 1.0, 3)
    N = len(r_unit)
    rad = np.sqrt((r_unit ** 2).sum(-1))
    mfrac = np.clip(rad, 1e-12, 1.0) ** 3      # uniform-sphere mass frac
    xi_of_m = np.interp(mfrac * mu1, mu, xi)
    scale = (alpha * xi_of_m) / np.maximum(rad, 1e-12)
    r = r_unit * scale[:, None]
    theta_p = np.interp(xi_of_m, xi, theta)
    rho = rhoc * np.maximum(theta_p, 1e-10) ** n_poly
    m = np.full(N, M / N)
    h = fp["h_fac"] * (m / rho) ** (1.0 / 3.0)
    # equilibrium internal energy: u = K rho^(eta-1) / (eta-1)
    u = K * rho ** (eta - 1.0) / (eta - 1.0)
    return {"r": r, "v": np.zeros((N, 3)), "m": m, "h": h, "u": u}


def silcc_density(params):
    """SILCC stratified-disc density profile (SilccIc::GetDensity,
    src/Ic/SilccIc.cpp:139-150): Gaussian within |z| <= a_midplane, a
    uniform atmosphere outside."""
    fp = params.floatparams
    a_mid = fp["a_midplane"]
    h_mid = fp["h_midplane"]
    rho_mid = fp["rho_midplane"]
    rho_a = rho_mid * np.exp(-a_mid * a_mid / (h_mid * h_mid))

    def rho(r):
        z = np.abs(np.asarray(r)[..., -1])
        return np.where(z <= a_mid,
                        rho_mid * np.exp(-z * z / (h_mid * h_mid)), rho_a)

    return rho


def silcc_ic(params, eos) -> Dict[str, np.ndarray]:
    """SILCC-type stratified galactic-disc slab (ic = silcc,
    src/Ic/SilccIc.cpp:55-137): Monte-Carlo sampled Gaussian vertical
    profile + uniform atmosphere, equal-mass particles, u from temp0.
    Implemented in code units (dimensionless = 1) or pre-scaled params."""
    fp, ip = params.floatparams, params.intparams
    if ip["ndim"] != 3:
        raise ValueError("silcc IC is 3D only")
    N = ip["Nhydro"]
    lo = np.array([fp[f"boxmin[{k}]"] for k in range(3)])
    hi = np.array([fp[f"boxmax[{k}]"] for k in range(3)])
    gammam1 = fp["gamma_eos"] - 1.0
    u0 = fp["temp0"] / gammam1 / fp["mu_bar"]

    rho_func = silcc_density(params)
    rng = _rng_from_params(params)
    # rejection-sample the density field (Ic::AddMonteCarloDensityField)
    rho_max = rho_func(np.array([[0.0, 0.0, 0.0]]))[0]
    r = _mc_density_field(rng, N, 3, lo, hi, rho_func, rho_max)

    # total mass from the integrated profile (SilccIc.cpp:73-80)
    a_mid, h_mid = fp["a_midplane"], fp["h_midplane"]
    rho_mid = fp["rho_midplane"]
    try:
        from math import erf

        erf_v = erf(a_mid / h_mid)
    except Exception:  # pragma: no cover
        erf_v = 1.0
    area = (hi[0] - lo[0]) * (hi[1] - lo[1])
    rho_a = rho_mid * np.exp(-a_mid * a_mid / (h_mid * h_mid))
    m_exp = 0.5 * np.sqrt(np.pi) * rho_mid * h_mid * erf_v * area
    m_uniform = rho_a * area * (hi[2] - a_mid)
    m_box = 2.0 * (m_exp + m_uniform)
    m = np.full(N, m_box / N)
    rho_p = rho_func(r)
    h = fp["h_fac"] * (m / np.maximum(rho_p, 1e-30)) ** (1.0 / 3.0)
    return {"r": r, "v": np.zeros((N, 3)), "m": m, "h": h,
            "u": np.full(N, u0)}


def binaryacc_ic(params, eos) -> Dict[str, np.ndarray]:
    """Binary (or single-star) accretion through a two-density gas stream
    (ic = binaryacc, src/Ic/BinaryAccretionIc.cpp:54-280): two lattice
    boxes of gas with rhofluid1/rhofluid2 split along x, plus 1-2 sink
    stars at the box centre moving at Mach vmachbin through the gas."""
    fp, ip = params.floatparams, params.intparams
    ndim = ip["ndim"]
    if ndim not in (2, 3):
        raise ValueError("binaryacc IC is 2D/3D only")
    Nstar = ip["Nstar"]
    m1s, m2s = fp["m1"], fp["m2"]
    abin, ebin = fp["abin"], fp["ebin"]
    vmachbin = fp["vmachbin"]
    rho1, rho2 = fp["rhofluid1"], fp["rhofluid2"]
    press1 = fp["press1"]
    gammam1 = fp["gamma_eos"] - 1.0
    lo = np.array([fp[f"boxmin[{k}]"] for k in range(ndim)])
    hi = np.array([fp[f"boxmax[{k}]"] for k in range(ndim)])
    n1 = [ip[f"Nlattice1[{k}]"] for k in range(ndim)]
    n2 = [ip[f"Nlattice2[{k}]"] for k in range(ndim)]

    Nbox2 = int(np.prod(n2))
    mid = lo[0] + 0.5 * (hi[0] - lo[0])
    if Nbox2 > 0:
        hi1 = hi.copy(); hi1[0] = mid
        lo2 = lo.copy(); lo2[0] = mid
        r1 = add_cubic_lattice(n1, lo, hi1)
        r2 = add_cubic_lattice(n2, lo2, hi)
        v1 = np.prod(hi1 - lo); v2 = np.prod(hi - lo2)
        m = np.concatenate([np.full(len(r1), rho1 * v1 / len(r1)),
                            np.full(len(r2), rho2 * v2 / len(r2))])
        rho = np.concatenate([np.full(len(r1), rho1),
                              np.full(len(r2), rho2)])
        r = np.concatenate([r1, r2])
    else:
        r = add_cubic_lattice(n1, lo, hi)
        m = np.full(len(r), rho1 * np.prod(hi - lo) / len(r))
        rho = np.full(len(r), rho1)
    N = len(r)
    u0 = press1 / (gammam1 * rho1)
    sound = np.sqrt(fp["gamma_eos"] * press1 / rho1)
    v = np.zeros((N, ndim))

    # binary/star at the domain centre, moving at Mach number vmachbin
    centre = 0.5 * (lo + hi)
    vbin = vmachbin * sound
    hsink = fp["h_fac"] * (m.mean() / rho1) ** (1.0 / ndim)
    if Nstar >= 2:
        # a = abin, e = ebin circularised in the x-y plane
        mtot = m1s + m2s
        rsep = abin * (1.0 + ebin)
        vorb = np.sqrt(mtot * (2.0 / rsep - 1.0 / abin))
        f1, f2 = m2s / mtot, m1s / mtot
        sr = np.zeros((2, ndim)); sv = np.zeros((2, ndim))
        sr[0, 0] = centre[0] + f1 * rsep
        sr[1, 0] = centre[0] - f2 * rsep
        sr[:, 1:] += centre[1:]
        sv[0, 1] = f1 * vorb
        sv[1, 1] = -f2 * vorb
        sv[:, 0] += vbin
        sm = np.array([m1s, m2s])
    else:
        sr = centre[None, :].copy()
        sv = np.zeros((1, ndim)); sv[0, 0] = vbin
        sm = np.array([m1s + m2s])
    star = {"r": sr, "v": sv, "m": sm,
            "h": np.full(len(sm), hsink)}
    return {"r": r, "v": v, "m": m,
            "h": fp["h_fac"] * (m / rho) ** (1.0 / ndim),
            "u": np.full(N, u0), "star": star}


def regularise_ic(params, ic: Dict[str, np.ndarray], rho_func=None,
                  periodic_dims=(), box_lo=None, box_hi=None
                  ) -> Dict[str, np.ndarray]:
    """Lloyd-style particle regularisation
    (Regularization::ParticleRegularizer, src/Ic/ICRegularization.cpp:45-150
    + DefaultRegularizerFunction, src/Headers/Ic.h:1194-1286):

    Nreg iterations of  r_i -= sum_j dr_ij w0(s^2) [rho_reg * clip(
    (rho_j - rho_true_j)/rho_true_j, -0.1, 10) + alpha_reg], each step
    clipped to 0.5 h_i.  rho_true comes from the IC's analytic density
    (uniform mean when absent); the SPH density is evaluated with a
    chunked all-pairs kernel sum (host-side, one-off)."""
    from ..kernels.smoothing import kernel_factory

    fp, ip = params.floatparams, params.intparams
    ndim = ip["ndim"]
    kern = kernel_factory(params.stringparams["kernel"], ndim,
                          params.intparams["tabulated_kernel"])
    n_reg = max(ip["Nreg"], 1)
    alpha_reg = fp["alpha_reg"]
    rho_reg = fp["rho_reg"]
    h_fac = fp["h_fac"]
    kr = kern.kernrange

    r = np.array(ic["r"], dtype=np.float64)
    m = np.asarray(ic["m"], dtype=np.float64)
    N = len(r)
    if box_lo is None:
        box_lo = r.min(0) - 1e-9
        box_hi = r.max(0) + 1e-9
    size = np.asarray(box_hi) - np.asarray(box_lo)

    def min_image(dr):
        for k in periodic_dims:
            dr[..., k] -= size[k] * np.round(dr[..., k] / size[k])
        return dr

    import jax.numpy as jnp

    def w0_s2(s2):
        return np.asarray(kern.w0_s2(jnp.asarray(s2)))

    for _ in range(n_reg):
        rho_true = (rho_func(r) if rho_func is not None
                    else np.full(N, (m.sum()
                                     / max(np.prod(size), 1e-30))))
        rho_true = np.maximum(rho_true, 1e-30)
        h = h_fac * (m / rho_true) ** (1.0 / ndim)
        # chunked SPH density + displacement
        rho_sph = np.zeros(N)
        chunk = max(1, int(2e7 // max(N, 1)))
        for c0 in range(0, N, chunk):
            sl = slice(c0, min(c0 + chunk, N))
            dr = min_image(r[sl][:, None] - r[None, :])   # (c, N, nd)
            drsqd = (dr ** 2).sum(-1)
            s2 = drsqd / (h[sl, None] ** 2)
            rho_sph[sl] = (m[None, :] * w0_s2(s2)).sum(-1) \
                / h[sl] ** ndim
        rhofrac = np.clip((rho_sph - rho_true) / rho_true, -0.1, 10.0)
        weight = rho_reg * rhofrac + alpha_reg                 # per j
        rreg = np.zeros_like(r)
        for c0 in range(0, N, chunk):
            sl = slice(c0, min(c0 + chunk, N))
            dr = min_image(r[None, :] - r[sl][:, None])   # j - i, (c,N,nd)
            drsqd = (dr ** 2).sum(-1)
            invh2 = 1.0 / h[sl] ** 2
            w = w0_s2(drsqd * invh2[:, None])
            inside = drsqd < (kr * h[sl][:, None]) ** 2
            coef = np.where(inside, w * weight[None, :], 0.0)
            rreg[sl] = -(coef[..., None] * dr).sum(1)
        # limit the move to half a smoothing length
        step = np.sqrt((rreg ** 2).sum(-1))
        over = step > 0.5 * h
        rreg[over] *= (0.5 * h[over] / step[over])[:, None]
        r = r + rreg
        for k in periodic_dims:
            r[:, k] = box_lo[k] + np.mod(r[:, k] - box_lo[k], size[k])
    out = dict(ic)
    out["r"] = r
    if rho_func is not None:
        rho_new = np.maximum(rho_func(r), 1e-30)
        out["h"] = h_fac * (m / rho_new) ** (1.0 / ndim)
    return out


_IC_REGISTRY = {
    "disc": disc_ic,
    "gaussianring": gaussianring_ic,
    "dustybox": dustybox_ic,
    "evrard": evrard_ic,
    "isothermsphere": isothermsphere_ic,
    "turbcore": turbcore_ic,
    "basic_sine": basic_sine_ic,
    "jeans": jeans_ic,
    "ewaldsine": jeans_ic,
    "ewaldsine2": ewaldsine2_ic,
    "ewaldslab": ewaldslab_ic,
    "ewaldcylinder": ewaldcylinder_ic,
    "shearflow": shearflow_ic,
    "rti": rti_ic,
    "shock2d": shock2d_ic,
    "spitzer": spitzer_ic,
    "filament": filament_ic,
    "bondi": bondi_ic,
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
    "bb": bossbodenheimer_ic,
    "plummer": plummer_hybrid_ic,
    "file": file_ic,
    "polytrope": polytrope_ic,
    "silcc": silcc_ic,
    "binaryacc": binaryacc_ic,
    "rotisothermsphere": isothermsphere_ic,
    "turbisothermsphere": isothermsphere_ic,
}

# analytic target densities for the Lloyd regulariser (per IC); absent
# entries regularise toward the uniform mean density
_RHO_FUNCS = {
    "silcc": silcc_density,
}

_NBODY_IC_REGISTRY = {
    "plummer": plummer_stars_ic,
    "binary": binary_ic,
    "triple": triple_ic,
    "quadruple": quadruple_ic,
}


def generate_nbody_ic(params) -> Dict[str, np.ndarray]:
    name = params.stringparams["ic"]
    if name not in _NBODY_IC_REGISTRY:
        raise ValueError(
            f"Unrecognised or not-yet-implemented nbody ic: {name!r}")
    return _NBODY_IC_REGISTRY[name](params)


def generate_ic(params, eos) -> Dict[str, np.ndarray]:
    """IC factory keyed by the `ic` parameter (SimulationIC.hpp:88-186),
    with optional Lloyd regularisation of the particle distribution
    (regularise_particle_ics = 1, src/Ic/ICRegularization.cpp)."""
    name = params.stringparams["ic"]
    if name not in _IC_REGISTRY:
        raise ValueError(f"Unrecognised or not-yet-implemented ic: {name!r}")
    ic = _IC_REGISTRY[name](params, eos)
    if params.intparams["regularise_particle_ics"] and name != "file":
        ndim = params.intparams["ndim"]
        fp = params.floatparams
        pdims = []
        lo = hi = None
        try:
            lo = [fp[f"boxmin[{k}]"] for k in range(ndim)]
            hi = [fp[f"boxmax[{k}]"] for k in range(ndim)]
            pdims = [k for k in range(ndim)
                     if params.stringparams[f"boundary_lhs[{k}]"]
                     == "periodic"]
        except KeyError:
            pass
        rho_fn = _RHO_FUNCS.get(name)
        ic = regularise_ic(params, ic,
                           rho_func=rho_fn(params) if rho_fn else None,
                           periodic_dims=tuple(pdims),
                           box_lo=lo, box_hi=hi)
    return ic
