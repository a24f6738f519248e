"""Dense cell-pair force kernel over the sorted slot layout.

The TPU production hot path (see neighbor/cell_slots.py): for every cell,
interactions against the 27 neighbor cells are evaluated as dense masked
(cap, 27*cap) tiles — zero per-pair random access.  This is the SIMD
j-loop of the reference (pair_buck_intel.cpp:236-275) re-shaped for a
8x128-lane vector unit, with INTEL_VMASK-style ``where`` masks doing the
cutoff/validity work.  Physics comes from the same ``pair_terms`` used by
the neighbor-list driver, so both paths share one validated formula set.

Special bonds: per-slot padded partner tables (atom-id space) are carried
through the rebin permutation and matched against j atom-ids inside the
tile — the SBBITS analog (SURVEY.md H2) without bit packing.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.box import Box
from ...neighbor.cell_slots import CellGrid, SlotState
from .styles import PairStyle, pair_terms
from .driver import _select_small, COEF_NAMES


class CellPairResult(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    fz: jnp.ndarray
    evdwl: jnp.ndarray
    ecoul: jnp.ndarray
    virial: jnp.ndarray


def compute_cellpair(
    style: PairStyle,
    grid: CellGrid,
    box: Box,
    state: SlotState,
    *,
    eflag: bool = False,
    vflag: bool = False,
    acc_dtype=jnp.float32,
    slot_special_idx: Optional[jnp.ndarray] = None,   # (NS, S) atom ids
    slot_special_code: Optional[jnp.ndarray] = None,  # (NS, S) int8
) -> CellPairResult:
    n = grid.n_atoms
    ncell = grid.ncell
    cap = grid.cap
    nbr = jnp.asarray(grid.nbr_array())          # static (ncell, 27)
    flt = state.x.dtype
    L = [float(v) for v in np.asarray(box.lengths)]
    ntypes = style.tables.shape[0]

    def cellview(p):
        return p.reshape(ncell, cap)

    def jview(p):
        # (ncell, 27, cap) -> (ncell, 27*cap): static row gather
        return p.reshape(ncell, cap)[nbr].reshape(ncell, 27 * cap)

    xi = [cellview(state.x), cellview(state.y), cellview(state.z)]
    xj = [jview(state.x), jview(state.y), jview(state.z)]
    aid_i = cellview(state.aid)
    aid_j = jview(state.aid)

    mask = (
        (aid_i[:, :, None] != aid_j[:, None, :])
        & (aid_i[:, :, None] < n)
        & (aid_j[:, None, :] < n)
    )

    d = []
    rsq = None
    for ax in range(3):
        dd = xi[ax][:, :, None] - xj[ax][:, None, :]   # (ncell, cap, 27cap)
        dd = dd - jnp.round(dd * (1.0 / L[ax])) * L[ax]
        d.append(dd)
        rsq = dd * dd if rsq is None else rsq + dd * dd
    rsq = jnp.where(mask, rsq, jnp.asarray(1e30, flt))

    # type-pair coefficients: select chains over baked host tables
    if ntypes == 1:
        coef = {name: float(style.tables.reshape(1, -1)[0, ci])
                for ci, name in enumerate(COEF_NAMES)}
    else:
        ti = cellview(state.typ)[:, :, None]
        tj = jview(state.typ)[:, None, :]
        tt = ti * ntypes + tj
        flat = np.asarray(style.tables).reshape(ntypes * ntypes, -1)
        coef = {}
        for ci, name in enumerate(COEF_NAMES):
            coef[name] = _select_small(flat[:, ci], tt, rsq.shape, flt)

    if style.cfg.has_coul:
        qi = cellview(state.q)[:, :, None]
        qj = jview(state.q)[:, None, :]
    else:
        qi = qj = 0.0

    if slot_special_idx is not None and slot_special_idx.shape[1] > 0:
        sp_i = slot_special_idx.reshape(ncell, cap, -1)       # (ncell,cap,S)
        sp_c = slot_special_code.reshape(ncell, cap, -1).astype(jnp.int32)
        match = sp_i[:, :, None, :] == aid_j[:, None, :, None]
        sb = jnp.sum(jnp.where(match, sp_c[:, :, None, :], 0), axis=-1)
        f_lj = _select_small(style.special_lj, sb, rsq.shape, flt)
        f_coul = _select_small(style.special_coul, sb, rsq.shape, flt)
    else:
        f_lj = f_coul = 1.0

    fscalar, evdwl, ecoul = pair_terms(
        style, rsq, coef, qi, qj, f_lj, f_coul, eflag=eflag
    )
    fscalar = jnp.where(mask, fscalar, 0.0)

    fx = jnp.sum((fscalar * d[0]).astype(acc_dtype), axis=2).reshape(-1)
    fy = jnp.sum((fscalar * d[1]).astype(acc_dtype), axis=2).reshape(-1)
    fz = jnp.sum((fscalar * d[2]).astype(acc_dtype), axis=2).reshape(-1)

    if eflag:
        half = jnp.asarray(0.5, acc_dtype)
        evdwl_t = half * jnp.sum(jnp.where(mask, evdwl, 0.0).astype(acc_dtype))
        ecoul_t = half * jnp.sum(jnp.where(mask, ecoul, 0.0).astype(acc_dtype))
    else:
        evdwl_t = ecoul_t = jnp.zeros((), acc_dtype)

    if vflag:
        w = fscalar * 0.5
        virial = jnp.stack([
            jnp.sum((w * d[0] * d[0]).astype(acc_dtype)),
            jnp.sum((w * d[1] * d[1]).astype(acc_dtype)),
            jnp.sum((w * d[2] * d[2]).astype(acc_dtype)),
            jnp.sum((w * d[0] * d[1]).astype(acc_dtype)),
            jnp.sum((w * d[0] * d[2]).astype(acc_dtype)),
            jnp.sum((w * d[1] * d[2]).astype(acc_dtype)),
        ])
    else:
        virial = jnp.zeros((6,), acc_dtype)

    return CellPairResult(fx=fx, fy=fy, fz=fz, evdwl=evdwl_t, ecoul=ecoul_t,
                          virial=virial)
