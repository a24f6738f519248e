"""Harmonic bonded interactions: bond/angle harmonic.

Host-LAMMPS contract (SURVEY.md H7/H8): examples/in.spce:14-21 defines
``bond_style harmonic`` / ``angle_style harmonic`` for flexible SPC/E water
(constrained by SHAKE in the deck; the flexible forms are needed whenever
SHAKE is off and for the bonded-energy ledger).  Standard forms:
  E_bond  = K (r - r0)^2
  E_angle = K (theta - theta0)^2
Dihedrals/impropers are 'none' in every shipped deck and are not
implemented.

Bonded terms touch ~Nb << N*K atoms; gathers here are cheap relative to the
pair pass, so this is straight jnp (no slot-layout specialization).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ...core.box import Box, minimum_image


@dataclasses.dataclass(frozen=True)
class BondedStyle:
    """Static topology + host-numpy coefficients.

    bonds:  (Nb, 3) int32 [type, i, j]
    angles: (Na, 4) int32 [type, i, j, k]  (j = central atom)
    bond_coeffs:  (Tb, 2) [K, r0]
    angle_coeffs: (Ta, 2) [K, theta0_degrees]
    """

    bonds: np.ndarray
    angles: np.ndarray
    bond_coeffs: np.ndarray
    angle_coeffs: np.ndarray

    @property
    def has_terms(self) -> bool:
        return len(self.bonds) > 0 or len(self.angles) > 0


def make_bonded(bonds=None, angles=None, bond_coeffs=None, angle_coeffs=None):
    bonds = np.zeros((0, 3), np.int32) if bonds is None else np.asarray(
        bonds, np.int32)
    angles = np.zeros((0, 4), np.int32) if angles is None else np.asarray(
        angles, np.int32)
    bond_coeffs = (np.zeros((0, 2)) if bond_coeffs is None
                   else np.asarray(bond_coeffs, np.float64))
    angle_coeffs = (np.zeros((0, 2)) if angle_coeffs is None
                    else np.asarray(angle_coeffs, np.float64))
    return BondedStyle(bonds=bonds, angles=angles, bond_coeffs=bond_coeffs,
                       angle_coeffs=angle_coeffs)


class BondedResult(NamedTuple):
    f: jnp.ndarray       # (N, 3)
    ebond: jnp.ndarray
    eangle: jnp.ndarray
    virial: jnp.ndarray  # (6,)


def _minimg(d, L):
    out = []
    for ax in range(3):
        dd = d[:, ax]
        La = float(L[ax])
        out.append(dd - jnp.round(dd * (1.0 / La)) * La)
    return jnp.stack(out, axis=-1)


def compute_bonded(style: BondedStyle, x, box: Box, *, eflag=True,
                   acc_dtype=jnp.float32, bonds_idx=None,
                   angles_idx=None) -> BondedResult:
    """bonds_idx/angles_idx: optional traced (Nb,2)/(Na,3) index overrides
    (slot-layout engines remap atom ids to slots per rebin)."""
    n = x.shape[0]
    L = np.asarray(box.lengths, np.float64)
    f = jnp.zeros((n, 3), acc_dtype)
    ebond = jnp.zeros((), acc_dtype)
    eangle = jnp.zeros((), acc_dtype)
    virial = jnp.zeros((6,), acc_dtype)

    if len(style.bonds):
        bt = style.bonds[:, 0]
        if bonds_idx is None:
            bi = jnp.asarray(style.bonds[:, 1])
            bj = jnp.asarray(style.bonds[:, 2])
        else:
            bi, bj = bonds_idx[:, 0], bonds_idx[:, 1]
        K = jnp.asarray(style.bond_coeffs[bt, 0], x.dtype)
        r0 = jnp.asarray(style.bond_coeffs[bt, 1], x.dtype)
        d = _minimg(x[bi] - x[bj], L)
        rsq = jnp.sum(d * d, axis=1)
        r = jnp.sqrt(rsq)
        dr = r - r0
        rk = K * dr
        fbond = jnp.where(r > 0, -2.0 * rk / r, 0.0)
        fv = fbond[:, None] * d
        f = f.at[bi].add(fv.astype(acc_dtype))
        f = f.at[bj].add(-fv.astype(acc_dtype))
        if eflag:
            ebond = jnp.sum((rk * dr).astype(acc_dtype))
        virial = virial + jnp.stack([
            jnp.sum((fbond * d[:, 0] * d[:, 0]).astype(acc_dtype)),
            jnp.sum((fbond * d[:, 1] * d[:, 1]).astype(acc_dtype)),
            jnp.sum((fbond * d[:, 2] * d[:, 2]).astype(acc_dtype)),
            jnp.sum((fbond * d[:, 0] * d[:, 1]).astype(acc_dtype)),
            jnp.sum((fbond * d[:, 0] * d[:, 2]).astype(acc_dtype)),
            jnp.sum((fbond * d[:, 1] * d[:, 2]).astype(acc_dtype)),
        ])

    if len(style.angles):
        at = style.angles[:, 0]
        if angles_idx is None:
            ai = jnp.asarray(style.angles[:, 1])
            aj = jnp.asarray(style.angles[:, 2])
            ak = jnp.asarray(style.angles[:, 3])
        else:
            ai, aj, ak = (angles_idx[:, 0], angles_idx[:, 1],
                          angles_idx[:, 2])
        K = jnp.asarray(style.angle_coeffs[at, 0], x.dtype)
        th0 = jnp.asarray(np.deg2rad(style.angle_coeffs[at, 1]), x.dtype)
        d1 = _minimg(x[ai] - x[aj], L)
        d2 = _minimg(x[ak] - x[aj], L)
        r1sq = jnp.sum(d1 * d1, axis=1)
        r2sq = jnp.sum(d2 * d2, axis=1)
        r1 = jnp.sqrt(r1sq)
        r2 = jnp.sqrt(r2sq)
        c = jnp.sum(d1 * d2, axis=1) / (r1 * r2)
        c = jnp.clip(c, -1.0, 1.0)
        s = jnp.sqrt(jnp.maximum(1.0 - c * c, 1e-8))
        dtheta = jnp.arccos(c) - th0
        tk = K * dtheta
        a = -2.0 * tk / s
        a11 = a * c / r1sq
        a12 = -a / (r1 * r2)
        a22 = a * c / r2sq
        f1 = a11[:, None] * d1 + a12[:, None] * d2
        f3 = a22[:, None] * d2 + a12[:, None] * d1
        f = f.at[ai].add(f1.astype(acc_dtype))
        f = f.at[ak].add(f3.astype(acc_dtype))
        f = f.at[aj].add((-(f1 + f3)).astype(acc_dtype))
        if eflag:
            eangle = jnp.sum((tk * dtheta).astype(acc_dtype))
        virial = virial + jnp.stack([
            jnp.sum((d1[:, 0] * f1[:, 0] + d2[:, 0] * f3[:, 0]).astype(acc_dtype)),
            jnp.sum((d1[:, 1] * f1[:, 1] + d2[:, 1] * f3[:, 1]).astype(acc_dtype)),
            jnp.sum((d1[:, 2] * f1[:, 2] + d2[:, 2] * f3[:, 2]).astype(acc_dtype)),
            jnp.sum((d1[:, 0] * f1[:, 1] + d2[:, 0] * f3[:, 1]).astype(acc_dtype)),
            jnp.sum((d1[:, 0] * f1[:, 2] + d2[:, 0] * f3[:, 2]).astype(acc_dtype)),
            jnp.sum((d1[:, 1] * f1[:, 2] + d2[:, 1] * f3[:, 2]).astype(acc_dtype)),
        ])

    return BondedResult(f=f, ebond=ebond, eangle=eangle, virial=virial)
