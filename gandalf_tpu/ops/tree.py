"""Barnes-Hut gravity tree: TPU-native implicit balanced tree.

Re-design of the reference KD-tree gravity walk (src/Tree/KDTree.cpp,
Tree::ComputeGravityInteractionAndGhostList src/Tree/Tree.cpp:628-735,
multipole kernels src/Headers/NeighbourSearch.h:350-520) for XLA:

- particles are sorted by Morton code once per rebuild (the analogue of
  KDTree::BuildTree's recursive median splits — Morton order gives the same
  spatial locality with a single `argsort`),
- the tree is IMPLICIT: leaf g covers sorted particles [g*L, (g+1)*L); level
  ell cell c covers 2^(D-ell) leaves.  Cell properties (mass, COM, bounding
  centre/half-extent, quadrupole moments) are computed bottom-up with
  reshape-reductions — no pointers, no copen/cnext indices
  (KDTree::StockCellProperties :808-1090 equivalent),
- the walk is a per-leaf-group breadth-first frontier over levels with a
  fixed width W: cells passing the geometric MAC contribute multipole
  forces immediately; failing cells expand their two children into the next
  frontier (KDTree walk's stack becomes a statically-shaped frontier
  compaction).  Cells that reach the bottom level unresolved become
  particle-particle (leaf x leaf) direct interactions.

Monopole + quadrupole supported (multipole = "monopole" | "quadrupole").
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TreeSpec:
    """Static tree geometry."""

    n_pad: int          # padded particle count (power-of-two multiple of L)
    leaf_size: int      # L
    depth: int          # number of levels below the root (leaves at `depth`)
    frontier: int       # frontier width W
    theta_sqd: float    # geometric MAC opening angle^2
    quadrupole: bool = True

    @property
    def n_leaves(self) -> int:
        return self.n_pad // self.leaf_size


def plan_tree(N: int, leaf_size: int = 32, frontier: int = 256,
              theta_sqd: float = 0.1, quadrupole: bool = True) -> TreeSpec:
    n_leaves = max(1, -(-N // leaf_size))
    n_leaves = 1 << int(np.ceil(np.log2(n_leaves)))
    return TreeSpec(n_pad=n_leaves * leaf_size, leaf_size=leaf_size,
                    depth=int(np.log2(n_leaves)), frontier=frontier,
                    theta_sqd=theta_sqd, quadrupole=quadrupole)


def morton_codes(r: Array, lo: Array, extent: Array, bits: int = 10) -> Array:
    """Interleaved-bit Morton codes on a 2^bits grid per dimension."""
    ndim = r.shape[1]
    scaled = jnp.clip((r - lo) / extent, 0.0, 1.0 - 1e-9)
    cells = (scaled * (1 << bits)).astype(jnp.uint32)
    code = jnp.zeros(r.shape[0], dtype=jnp.uint32)
    for b in range(bits):
        for k in range(ndim):
            bit = (cells[:, k] >> b) & 1
            code = code | (bit << (b * ndim + k))
    return code


class TreeLevels(NamedTuple):
    """Per-level cell properties, root (level 0) to leaves (level D).

    Lists of arrays indexed by level ell (each of length 2^ell):
    m, com (.., ndim), centre, half (bounding box), quad (.., ndim, ndim).
    """

    m: list
    com: list
    centre: list
    half: list
    quad: list


def build_tree(spec: TreeSpec, r_s: Array, m_s: Array,
               alive: Array) -> TreeLevels:
    """Bottom-up cell properties over Morton-SORTED padded arrays."""
    L = spec.leaf_size
    n_leaves = spec.n_leaves
    ndim = r_s.shape[1]
    big = 1e30

    m_leaf_p = jnp.where(alive, m_s, 0.0).reshape(n_leaves, L)
    r_leaf = r_s.reshape(n_leaves, L, ndim)
    m_tot = jnp.sum(m_leaf_p, axis=1)
    com = jnp.sum(m_leaf_p[..., None] * r_leaf, axis=1) \
        / jnp.maximum(m_tot, 1e-300)[..., None]
    rmin = jnp.min(jnp.where(alive.reshape(n_leaves, L, 1), r_leaf, big),
                   axis=1)
    rmax = jnp.max(jnp.where(alive.reshape(n_leaves, L, 1), r_leaf, -big),
                   axis=1)
    # empty leaves: collapse the box to the COM (zero size)
    empty = (m_tot <= 0.0)[..., None]
    rmin = jnp.where(empty, com, rmin)
    rmax = jnp.where(empty, com, rmax)

    if spec.quadrupole:
        dr = r_leaf - com[:, None, :]
        q = jnp.einsum("lp,lpi,lpj->lij", m_leaf_p, dr, dr)
        tr = jnp.einsum("lii->l", q)
        q = 3.0 * q - tr[:, None, None] * jnp.eye(ndim)
    else:
        q = jnp.zeros((n_leaves, ndim, ndim), dtype=r_s.dtype)

    ms, coms, centres, halves, quads = [m_tot], [com], \
        [0.5 * (rmin + rmax)], [0.5 * (rmax - rmin)], [q]
    lo, hi = rmin, rmax
    # merge pairs up to the root
    for _ in range(spec.depth):
        m2 = ms[0].reshape(-1, 2)
        c2 = coms[0].reshape(-1, 2, ndim)
        mm = jnp.sum(m2, axis=1)
        cc = jnp.sum(m2[..., None] * c2, axis=1) \
            / jnp.maximum(mm, 1e-300)[..., None]
        lo2 = jnp.min(lo.reshape(-1, 2, ndim), axis=1)
        hi2 = jnp.max(hi.reshape(-1, 2, ndim), axis=1)
        if spec.quadrupole:
            q2 = quads[0].reshape(-1, 2, ndim, ndim)
            d = c2 - cc[:, None, :]
            dq = jnp.einsum("lp,lpi,lpj->lij", m2, d, d)
            trdq = jnp.einsum("lii->l", dq)
            qq = jnp.sum(q2, axis=1) + 3.0 * dq \
                - trdq[:, None, None] * jnp.eye(ndim)
        else:
            qq = jnp.zeros((mm.shape[0], ndim, ndim), dtype=r_s.dtype)
        ms.insert(0, mm)
        coms.insert(0, cc)
        centres.insert(0, 0.5 * (lo2 + hi2))
        halves.insert(0, 0.5 * (hi2 - lo2))
        quads.insert(0, qq)
        lo, hi = lo2, hi2
    return TreeLevels(m=ms, com=coms, centre=centres, half=halves,
                      quad=quads)


def _multipole_accel(dr: Array, m: Array, quad: Array, quadrupole: bool):
    """Acceleration + potential from cells at displacement dr (= com - x)."""
    drsqd = jnp.sum(dr * dr, axis=-1)
    inv_r = 1.0 / jnp.sqrt(jnp.maximum(drsqd, 1e-300))
    inv_r3 = inv_r * inv_r * inv_r
    a = m[..., None] * dr * inv_r3[..., None]
    pot = m * inv_r
    if quadrupole:
        # traceless-quadrupole expansion (ComputeQuadropole,
        # NeighbourSearch.h:423-448; note the reference's dr = x - com is
        # the negative of ours, flipping the odd-order terms)
        inv_r5 = inv_r3 * inv_r * inv_r
        qdr = jnp.einsum("...ij,...j->...i", quad, dr)
        drqdr = jnp.sum(qdr * dr, axis=-1)
        a = a - inv_r5[..., None] * qdr \
            + 2.5 * (drqdr * inv_r5 * inv_r * inv_r)[..., None] * dr
        pot = pot + 0.5 * drqdr * inv_r5
    return a, pot


class TreeGravityResult(NamedTuple):
    a: Array        # (n_pad, ndim), sorted order
    gpot: Array     # (n_pad,)


def tree_gravity(spec: TreeSpec, tree: TreeLevels,
                 r_s: Array, m_s: Array, alive: Array,
                 h_s: Array = None, kern=None) -> TreeGravityResult:
    """Frontier-walk gravity for every particle (sorted order).

    Near-field (unopened leaf pairs) uses kernel-softened pair forces when
    (h_s, kern) are given, Newtonian otherwise.
    """
    L = spec.leaf_size
    W = spec.frontier
    ndim = r_s.shape[1]
    n_leaves = spec.n_leaves
    theta_sqd = spec.theta_sqd

    r_leaf = r_s.reshape(n_leaves, L, ndim)
    m_leaf = jnp.where(alive, m_s, 0.0).reshape(n_leaves, L)
    leaf_centre = tree.centre[-1]
    leaf_half = tree.half[-1]

    # stack level arrays into padded tables indexed by (level, cell)
    def stack(tab, fill=0.0):
        padded = []
        width = 1 << spec.depth
        for ell, x in enumerate(tab):
            n = x.shape[0]
            pad = [(0, width - n)] + [(0, 0)] * (x.ndim - 1)
            padded.append(jnp.pad(x, pad, constant_values=fill))
        return jnp.stack(padded)           # (depth+1, width, ...)

    m_tab = stack(tree.m)
    com_tab = stack(tree.com)
    centre_tab = stack(tree.centre)
    half_tab = stack(tree.half)
    quad_tab = stack(tree.quad)

    def walk_group(g):
        """Gravity on the L particles of leaf group g."""
        rt = r_leaf[g]                                    # (L, ndim)
        gc = leaf_centre[g]
        gh = leaf_half[g]

        a_acc = jnp.zeros((L, ndim), dtype=r_s.dtype)
        pot_acc = jnp.zeros((L,), dtype=r_s.dtype)

        # frontier of cell ids at the current level; -1 = empty slot
        front0 = jnp.full((W,), -1, dtype=jnp.int32)
        front0 = front0.at[0].set(0)

        def level_step(carry, ell):
            front, a_acc, pot_acc, overflow = carry
            valid = front >= 0
            idx = jnp.maximum(front, 0)
            m_c = jnp.where(valid, m_tab[ell, idx], 0.0)
            com_c = com_tab[ell, idx]
            cen_c = centre_tab[ell, idx]
            half_c = half_tab[ell, idx]

            # geometric MAC (reference KDTree.cpp:824-843: open if
            # drsqd < rmax^2/theta^2).  d = worst-case distance from any
            # group particle to the cell COM (COM-to-group-box gap), rmax =
            # cell half-diagonal; conservative for the whole group at once.
            gap = jnp.maximum(jnp.abs(com_c - gc) - gh, 0.0)
            dsqd = jnp.sum(gap * gap, axis=-1)
            rmax_sqd = jnp.sum(half_c * half_c, axis=-1)
            is_leaf_level = ell == spec.depth
            accept = valid & (dsqd * theta_sqd > rmax_sqd) & (m_c > 0.0)
            open_ = valid & ~accept & (m_c > 0.0)

            # far-field contribution from accepted cells
            dr = com_c[None, :, :] - rt[:, None, :]       # (L, W, ndim)
            a_far, p_far = _multipole_accel(
                dr, jnp.where(accept, m_c, 0.0),
                jnp.where(accept[:, None, None], quad_tab[ell, idx], 0.0),
                spec.quadrupole)
            a_acc = a_acc + jnp.sum(a_far, axis=1)
            pot_acc = pot_acc + jnp.sum(p_far, axis=1)

            # leaf-level unopened cells -> direct particle sums
            def leaf_direct(a_acc, pot_acc):
                near = open_ & is_leaf_level
                # (W, L) neighbour particles of each near leaf
                r_nb = r_leaf[idx]                        # (W, L, ndim)
                m_nb = jnp.where(near[:, None], m_leaf[idx], 0.0)
                drn = r_nb[None, :, :, :] - rt[:, None, None, :]
                dsq = jnp.sum(drn * drn, axis=-1)         # (L, W, L)
                self_pair = dsq <= 0.0
                if h_s is not None and kern is not None:
                    h_t = h_s.reshape(n_leaves, L)[g]
                    h_nb = h_s.reshape(n_leaves, L)[idx]
                    hbar = 0.5 * (h_t[:, None, None] + h_nb[None, :, :])
                    dmag = jnp.sqrt(jnp.maximum(dsq, 1e-300))
                    s = dmag / hbar
                    wg = kern.wgrav(s) / (hbar * hbar)
                    wp = kern.wpot(s) / hbar
                    coef = jnp.where(self_pair, 0.0, m_nb[None] * wg / dmag)
                    a_n = jnp.sum(coef[..., None] * drn, axis=(1, 2))
                    p_n = jnp.sum(jnp.where(self_pair, 0.0,
                                            m_nb[None] * wp), axis=(1, 2))
                else:
                    inv_d = jnp.where(self_pair, 0.0,
                                      1.0 / jnp.sqrt(jnp.maximum(dsq,
                                                                 1e-300)))
                    inv_d3 = inv_d ** 3
                    a_n = jnp.sum((m_nb[None] * inv_d3)[..., None] * drn,
                                  axis=(1, 2))
                    p_n = jnp.sum(m_nb[None] * inv_d, axis=(1, 2))
                return a_acc + a_n, pot_acc + p_n

            a_acc, pot_acc = jax.lax.cond(
                is_leaf_level, leaf_direct,
                lambda a, p: (a, p), a_acc, pot_acc)

            # expand opened (non-leaf) cells into children
            expand = open_ & ~is_leaf_level
            child0 = jnp.where(expand, 2 * front, -1)
            kids = jnp.stack([child0, jnp.where(expand, child0 + 1, -1)],
                             axis=-1).reshape(-1)         # (2W,)
            # compact valid children to the front of the next frontier
            order = jnp.argsort(jnp.where(kids >= 0, 0, 1), stable=True)
            kids_sorted = kids[order]
            n_kids = jnp.sum(kids >= 0)
            overflow = overflow | (n_kids > W)
            front_next = kids_sorted[:W]
            return (front_next, a_acc, pot_acc, overflow), None

        carry0 = (front0, a_acc, pot_acc, jnp.asarray(False))
        (front, a_acc, pot_acc, overflow), _ = jax.lax.scan(
            level_step, carry0, jnp.arange(spec.depth + 1))
        return a_acc, pot_acc, overflow

    # vmap over a chunk of groups, lax.map over chunks: keeps each device
    # step large enough to fill the VPU without materialising all groups.
    group_chunk = min(64, n_leaves)
    n_chunks = -(-n_leaves // group_chunk)
    gids = jnp.arange(n_chunks * group_chunk, dtype=jnp.int32) % n_leaves
    gids = gids.reshape(n_chunks, group_chunk)
    a, pot, overflow = jax.lax.map(jax.vmap(walk_group), gids)
    a = a.reshape(-1, L, ndim)[:n_leaves]
    pot = pot.reshape(-1, L)[:n_leaves]
    return TreeGravityResult(a=a.reshape(spec.n_pad, ndim),
                             gpot=pot.reshape(spec.n_pad)), jnp.any(overflow)


def tree_gravity_all(spec: TreeSpec, r: Array, m: Array,
                     h: Array = None, kern=None):
    """Convenience wrapper: sort -> build -> walk -> unsort.

    Returns (a, gpot, overflow) in ORIGINAL particle order.
    """
    N = r.shape[0]
    ndim = r.shape[1]
    lo = jnp.min(r, axis=0)
    extent = jnp.maximum(jnp.max(r, axis=0) - lo, 1e-30)
    codes = morton_codes(r, lo, extent)
    order = jnp.argsort(codes)
    pad = spec.n_pad - N
    r_s = jnp.concatenate([r[order], jnp.full((pad, ndim), 1e15,
                                              dtype=r.dtype)])
    m_s = jnp.concatenate([m[order], jnp.zeros((pad,), dtype=m.dtype)])
    alive = jnp.concatenate([jnp.ones((N,), bool), jnp.zeros((pad,), bool)])
    h_s = None
    if h is not None:
        h_s = jnp.concatenate([h[order], jnp.ones((pad,), dtype=h.dtype)])
    tree = build_tree(spec, r_s, m_s, alive)
    res, overflow = tree_gravity(spec, tree, r_s, m_s, alive, h_s, kern)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(N, dtype=order.dtype))
    return res.a[:N][inv], res.gpot[:N][inv], overflow
