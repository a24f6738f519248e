"""Cell-patch PPPM pipeline — the TPU-fast deposition/gather path.

The generic deposit/gather in pppm.py uses per-atom scatter/gather of
N * order^3 mesh points; measured on TPU v5e that is 42 ms (deposit) +
~80 ms (gather) for 32k atoms — scatter/gather bound, like the pair pass
before the cell-slot layout.  This module removes it the same way:

* The PPPM grid is aligned to the MD cell grid (S grid points per cell and
  axis).  Each cell owns a (P, P, P) patch, P = S + order + margin, that
  covers every stencil its atoms can touch (margin absorbs inter-rebin
  drift, the skin argument).
* Deposition: per-cell dense B-spline weight planes (cap, P) per axis, then
  a batched rank-1-sum contraction (two batched matmuls — MXU) into patches;
  patches accumulate into the grid through 27 statically-sliced,
  cell-axis-rolled adds — NO scatter anywhere.
* Field gather: the exact transpose — 27 rolled slices assemble per-cell
  patches of each E component, three batched contractions produce per-slot
  forces.

This is the make_rho / fieldforce_ik pair of the reference
(pppm_intel.cpp:403-527, :540-640) in TPU form: the reference's per-thread
grid privatization becomes patch privatization with a dense reduction.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.box import Box
from ...neighbor.cell_slots import CellGrid, SlotState
from .base import KSpaceResult
from .pppm import PPPM, mspline


@dataclasses.dataclass(frozen=True)
class PatchSpec:
    """Static geometry binding a PPPM grid to a CellGrid."""

    S: tuple[int, int, int]        # grid points per cell per axis
    P: tuple[int, int, int]        # patch extent per axis
    lo_off: tuple[int, int, int]   # patch start offset behind cell start
    order: int
    margin: int
    cell_tile: int                 # cells per lax.map tile


def make_patch_spec(pm: PPPM, grid: CellGrid, margin: int = 2,
                    cell_tile: Optional[int] = None,
                    skin: Optional[float] = None) -> PatchSpec:
    if skin is not None:
        # Atoms drift up to skin/2 between rebins (the runner's cadence
        # bound); the patch margin must cover that drift in grid units or
        # B-spline weight mass silently falls off the patch.
        need = int(math.ceil((0.5 * skin) / float(np.min(pm.h)) - 1e-9))
        margin = max(margin, need)
    S = []
    P = []
    lo = []
    p = pm.order
    for ax in range(3):
        if pm.grid[ax] % grid.nc[ax]:
            raise ValueError(
                f"pppm grid {pm.grid} not aligned to cell grid {grid.nc}; "
                "pass multiple_of=cellgrid.nc to setup_pppm"
            )
        s = pm.grid[ax] // grid.nc[ax]
        if p % 2:
            lo_off = (p - 1) // 2 + margin
            ext = s + p + 2 * margin  # [-lo_off, s + (p-1)/2 + margin]
        else:
            lo_off = p // 2 - 1 + margin
            ext = s + p - 1 + 2 * margin
        # patch may only reach the two adjacent cells per side
        if lo_off > s or (ext - lo_off - s) > s:
            raise ValueError(
                f"patch overhang exceeds one cell on axis {ax} "
                f"(extent {ext}, S {s}): refine the pppm grid or coarsen "
                "the cell grid"
            )
        S.append(s)
        P.append(ext)
        lo.append(lo_off)
    if cell_tile is None:
        # bound the (tile, cap, Py*Pz) intermediates to ~64 MB
        cap = grid.cap
        vol = cap * P[1] * P[2] * 4
        cell_tile = max(32, min(grid.ncell, int(6.4e7 / max(vol, 1))))
    return PatchSpec(S=tuple(S), P=tuple(P), lo_off=tuple(lo),
                     order=p, margin=margin, cell_tile=int(cell_tile))


def _axis_weights(pm: PPPM, ps: PatchSpec, grid: CellGrid, xplane, ax: int):
    """(NS, P_ax) dense B-spline weights of every slot on its cell patch."""
    ncell, cap = grid.ncell, grid.cap
    ns = grid.nslots
    # static per-slot cell coordinate along this axis
    cells = np.arange(ncell)
    if ax == 0:
        cc = cells // (grid.nc[1] * grid.nc[2])
    elif ax == 1:
        cc = (cells // grid.nc[2]) % grid.nc[1]
    else:
        cc = cells % grid.nc[2]
    slot_cell = np.repeat(cc, cap).astype(np.float64)       # (NS,)
    patch_lo = slot_cell * ps.S[ax] - ps.lo_off[ax]         # (NS,) static
    u = (xplane - pm.box_lo[ax]) * (1.0 / pm.h[ax])         # grid units
    px = np.arange(ps.P[ax], dtype=np.float64)
    arg = (u - jnp.asarray(patch_lo, xplane.dtype))[:, None] \
        - px[None, :] + ps.order / 2.0
    return mspline(ps.order, arg)                           # (NS, P_ax)


_OFF3 = [(a, b, c) for a in (-1, 0, 1) for b in (-1, 0, 1) for c in (-1, 0, 1)]


def _ranges(ps: PatchSpec, ax: int, o: int):
    """(patch slice, cell-subgrid slice) for cell-offset o on axis ax."""
    S, lo = ps.S[ax], ps.lo_off[ax]
    P = ps.P[ax]
    if o == -1:
        return slice(0, lo), slice(S - lo, S)
    if o == 0:
        return slice(lo, lo + S), slice(0, S)
    return slice(lo + S, P), slice(0, P - lo - S)


def patches_to_grid(patches, ps: PatchSpec, grid: CellGrid, nxyz):
    """(ncell, Px, Py, Pz) -> (nx, ny, nz) via 27 rolled static-slice adds."""
    ncx, ncy, ncz = grid.nc
    Sx, Sy, Sz = ps.S
    pat = patches.reshape(ncx, ncy, ncz, *ps.P)
    G = jnp.zeros((ncx, Sx, ncy, Sy, ncz, Sz), patches.dtype)
    for (ox, oy, oz) in _OFF3:
        psx, gsx = _ranges(ps, 0, ox)
        psy, gsy = _ranges(ps, 1, oy)
        psz, gsz = _ranges(ps, 2, oz)
        part = pat[:, :, :, psx, psy, psz]
        part = jnp.roll(part, (ox, oy, oz), axis=(0, 1, 2))
        G = G.at[:, gsx, :, gsy, :, gsz].add(
            jnp.moveaxis(part, (3, 4, 5), (1, 3, 5))
        )
    return G.reshape(ncx * Sx, ncy * Sy, ncz * Sz)


def grid_to_patches(mesh, ps: PatchSpec, grid: CellGrid):
    """(nx, ny, nz) -> (ncell, Px, Py, Pz): transpose of patches_to_grid."""
    ncx, ncy, ncz = grid.nc
    Sx, Sy, Sz = ps.S
    G = mesh.reshape(ncx, Sx, ncy, Sy, ncz, Sz)
    pat = jnp.zeros((ncx, ncy, ncz, *ps.P), mesh.dtype)
    for (ox, oy, oz) in _OFF3:
        psx, gsx = _ranges(ps, 0, ox)
        psy, gsy = _ranges(ps, 1, oy)
        psz, gsz = _ranges(ps, 2, oz)
        part = jnp.moveaxis(G[:, gsx, :, gsy, :, gsz], (1, 3, 5), (3, 4, 5))
        part = jnp.roll(part, (-ox, -oy, -oz), axis=(0, 1, 2))
        pat = pat.at[:, :, :, psx, psy, psz].add(part)
    return pat.reshape(grid.ncell, *ps.P)


def deposit_rho_cells(pm: PPPM, ps: PatchSpec, grid: CellGrid,
                      state: SlotState):
    """Charge deposition -> (nx, ny, nz) mesh, scatter-free."""
    cap = grid.cap
    ncell = grid.ncell
    wx = _axis_weights(pm, ps, grid, state.x, 0).reshape(ncell, cap, -1)
    wy = _axis_weights(pm, ps, grid, state.y, 1).reshape(ncell, cap, -1)
    wz = _axis_weights(pm, ps, grid, state.z, 2).reshape(ncell, cap, -1)
    qx = wx * state.q.reshape(ncell, cap)[:, :, None]

    tile = ps.cell_tile
    nt = -(-ncell // tile)
    pad = nt * tile - ncell

    def padc(a):
        return jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) if pad else a

    qx_t = padc(qx).reshape(nt, tile, cap, ps.P[0])
    wy_t = padc(wy).reshape(nt, tile, cap, ps.P[1])
    wz_t = padc(wz).reshape(nt, tile, cap, ps.P[2])

    def one_tile(args):
        qxb, wyb, wzb = args
        wyz = jnp.einsum("tay,taz->tayz", wyb, wzb)
        return jnp.einsum("tax,tayz->txyz", qxb, wyz)

    pat = jax.lax.map(one_tile, (qx_t, wy_t, wz_t))
    pat = pat.reshape(nt * tile, *ps.P)[:ncell]
    return patches_to_grid(pat, ps, grid, pm.grid)


def gather_force_cells(pm: PPPM, ps: PatchSpec, grid: CellGrid,
                       state: SlotState, e_meshes):
    """E-field interpolation -> per-slot (fx, fy, fz), scatter-free.

    Caller multiplies by qqrd2e * q (or B for dispersion)."""
    cap = grid.cap
    ncell = grid.ncell
    wx = _axis_weights(pm, ps, grid, state.x, 0).reshape(ncell, cap, -1)
    wy = _axis_weights(pm, ps, grid, state.y, 1).reshape(ncell, cap, -1)
    wz = _axis_weights(pm, ps, grid, state.z, 2).reshape(ncell, cap, -1)

    tile = ps.cell_tile
    nt = -(-ncell // tile)
    pad = nt * tile - ncell

    def padc(a):
        return jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]) if pad else a

    wx_t = padc(wx).reshape(nt, tile, cap, ps.P[0])
    wy_t = padc(wy).reshape(nt, tile, cap, ps.P[1])
    wz_t = padc(wz).reshape(nt, tile, cap, ps.P[2])

    out = []
    for em in e_meshes:
        ep = grid_to_patches(em, ps, grid)
        ep_t = padc(ep).reshape(nt, tile, *ps.P)

        def one_tile(args):
            wxb, wyb, wzb, eb = args
            t1 = jnp.einsum("tax,txyz->tayz", wxb, eb)
            t2 = jnp.einsum("tay,tayz->taz", wyb, t1)
            return jnp.einsum("taz,taz->ta", wzb, t2)

        f = jax.lax.map(one_tile, (wx_t, wy_t, wz_t, ep_t))
        out.append(f.reshape(nt * tile, cap)[:ncell].reshape(-1))
    return out


class CellPPPM:
    """PPPM bound to a cell grid — plugs into CellPairSimulation.

    Exposes compute_slots(state) -> (fx, fy, fz, elong, virial) with all
    per-atom stages running through the patch pipeline.
    """

    def __init__(self, pm: PPPM, grid: CellGrid, margin: int = 2,
                 per_slot_charge=None, skin: Optional[float] = None):
        self.pm = pm
        self.grid = grid
        self.ps = make_patch_spec(pm, grid, margin=margin, skin=skin)
        # dispersion mode: override 'charge' source (B per slot is dynamic
        # via typ; caller passes a per-TYPE table instead)
        self.b_per_type = per_slot_charge

    def compute_slots(self, state: SlotState, eflag: bool, vflag: bool):
        pm = self.pm
        acc = pm.acc_dtype
        V = float(pm.volume)
        if self.b_per_type is not None:
            from ..pair.driver import _select_small

            b = _select_small(self.b_per_type, state.typ, state.typ.shape,
                              state.x.dtype)
            if isinstance(b, float):
                b = jnp.full(state.typ.shape, b, state.x.dtype)
            b = jnp.where(state.aid < self.grid.n_atoms, b, 0.0)
            state = state._replace(q=b)
            qqrd2e = 1.0
        else:
            qqrd2e = float(pm.qqrd2e)

        mesh = deposit_rho_cells(pm, self.ps, self.grid, state)
        rhat = jnp.fft.fftn(mesh.astype(acc))
        G = jnp.asarray(pm.greensfn, acc)
        phi_hat = G * rhat

        if eflag or vflag:
            s2 = jnp.real(rhat * jnp.conj(rhat))
            ek = G * s2
        if eflag:
            elong = (0.5 / V) * jnp.sum(ek.astype(acc)) * qqrd2e
            if self.b_per_type is not None:
                bsum = jnp.sum(state.q.astype(acc))
                b2sum = jnp.sum((state.q * state.q).astype(acc))
                w0 = -(math.pi**1.5 * pm.g_ewald**3 / 3.0)
                elong = elong + (0.5 / V) * w0 * bsum * bsum \
                    + pm.g_ewald**6 / 12.0 * b2sum
            else:
                elong = elong + pm.elong_self
        else:
            elong = jnp.zeros((), acc)

        kx = jnp.asarray(pm.kx, acc)[:, None, None]
        ky = jnp.asarray(pm.ky, acc)[None, :, None]
        kz = jnp.asarray(pm.kz, acc)[None, None, :]
        if vflag and self.b_per_type is None:
            ksq = kx * kx + ky * ky + kz * kz
            ksq_safe = jnp.where(ksq == 0.0, 1.0, ksq)
            pref = 2.0 * (1.0 / ksq_safe + 0.25 / pm.g_ewald**2)
            c = (0.5 / V) * qqrd2e
            virial = jnp.stack([
                jnp.sum((ek * (1.0 - pref * kx * kx)).astype(acc)),
                jnp.sum((ek * (1.0 - pref * ky * ky)).astype(acc)),
                jnp.sum((ek * (1.0 - pref * kz * kz)).astype(acc)),
                jnp.sum((ek * (-pref * kx * ky)).astype(acc)),
                jnp.sum((ek * (-pref * kx * kz)).astype(acc)),
                jnp.sum((ek * (-pref * ky * kz)).astype(acc)),
            ]) * c
        elif vflag:
            c = (0.5 / V)
            third = (c * jnp.sum(ek.astype(acc))) / 3.0
            virial = jnp.stack([third, third, third,
                                jnp.zeros((), acc), jnp.zeros((), acc),
                                jnp.zeros((), acc)])
        else:
            virial = jnp.zeros((6,), acc)

        ngrid = pm.grid[0] * pm.grid[1] * pm.grid[2]
        scale = 1.0 / V
        e_meshes = []
        for kax in (kx, ky, kz):
            ehat = (-1j) * kax * phi_hat
            e_meshes.append(
                (jnp.real(jnp.fft.ifftn(ehat)) * (scale * ngrid)
                 ).astype(state.x.dtype)
            )
        fx, fy, fz = gather_force_cells(pm, self.ps, self.grid, state,
                                        e_meshes)
        qf = (qqrd2e * state.q).astype(acc)
        return (fx.astype(acc) * qf, fy.astype(acc) * qf,
                fz.astype(acc) * qf, elong, virial)
