"""SPH kernel-interpolated rendering grids (analogue of Render,
src/Headers/Render.h:53-128 / src/Common/Render.cpp).

Column-integrated and slice grids of any particle quantity:
  A(x_px) = sum_j (m_j/rho_j) A_j W(|x_px - r_j|, h_j)
evaluated on a pixel grid.  TPU-native: one vectorised (pixels x particles)
kernel sum, chunked over pixel rows — rendering is itself a jax op here, so
it runs on the accelerator (the reference renders in C++ on the host).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.smoothing import kernel_factory


def render_grid(snap, xquantity: str, yquantity: str, quantity: str,
                xmin: float, xmax: float, ymin: float, ymax: float,
                nx: int = 128, ny: int = 128, kernel: str = "m4",
                column: bool = True, zslice: float = None) -> np.ndarray:
    """2D rendering grid of `quantity` over the (xquantity, yquantity)
    plane (CreateColumnRenderingGrid / CreateSliceRenderingGrid,
    reference src/Common/Render.cpp:64-232).

    For column rendering the 2D column kernel sum uses the 2D kernel
    normalisation (the reference uses dedicated LOS kernels; the 2D kernel
    is the standard approximation for column plots).  With `zslice` set
    (3D snapshots) the grid is a true z-plane slice: the FULL-DIMENSIONAL
    kernel evaluated at the 3D distance including the pixel-to-slice
    offset (z_j - zslice), matching CreateSliceRenderingGrid
    (Render.cpp:169-232) rather than a column integral.
    """
    axes = {"x": 0, "y": 1, "z": 2}
    ix = axes[xquantity]
    iy = axes[yquantity]
    r = np.asarray(snap.data["r"])
    ndim = r.shape[1]
    m = np.asarray(snap.data["m"])
    rho = np.asarray(snap.data["rho"])
    h = np.asarray(snap.data["h"])
    A = np.asarray(snap.extract_array(quantity))

    px = jnp.linspace(xmin, xmax, nx)
    py = jnp.linspace(ymin, ymax, ny)

    rx = jnp.asarray(r[:, ix])
    ry = jnp.asarray(r[:, iy])
    w = jnp.asarray(m / np.maximum(rho, 1e-300) * A)
    hj = jnp.asarray(h)

    if zslice is not None and ndim == 3:
        iz = ({0, 1, 2} - {ix, iy}).pop()
        kern3d = kernel_factory(kernel, 3)
        dz = jnp.asarray(r[:, iz]) - zslice

        @jax.jit
        def row(yv):
            dx = px[:, None] - rx[None, :]
            dy = yv - ry[None, :]
            s = jnp.sqrt(dx * dx + dy * dy + dz[None, :] ** 2) \
                / hj[None, :]
            wk = kern3d.w0(s) / hj[None, :] ** 3
            return jnp.sum(w[None, :] * wk, axis=-1)
    else:
        kern2d = kernel_factory(kernel, 2)

        @jax.jit
        def row(yv):
            dx = px[:, None] - rx[None, :]
            dy = yv - ry[None, :]
            s = jnp.sqrt(dx * dx + dy * dy) / hj[None, :]
            wk = kern2d.w0(s) / hj[None, :] ** 2
            return jnp.sum(w[None, :] * wk, axis=-1)

    grid = jax.lax.map(row, py)
    return np.asarray(grid)
