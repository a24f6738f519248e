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

import jax
import jax.numpy as jnp
import numpy as np

from ...core.box import Box, minimum_image


@dataclasses.dataclass(frozen=True)
class BondedStyle:
    """Static topology + host-numpy coefficients.

    bonds:  (Nb, 3) int32 [type, i, j]
    angles: (Na, 4) int32 [type, i, j, k]  (j = central atom)
    bond_coeffs:  (Tb, 2) [K, r0]
    angle_coeffs: (Ta, 2) [K, theta0_degrees] — or (Ta, 4)
                  [K, theta0, K_ub, r_ub] when angle_style == "charmm"
    dihedrals/impropers: (Nd, 5) int32 [type, i, j, k, l]
    dihedral_coeffs: (Td, 4) [K, n, d_degrees, weight] (charmm)
    improper_coeffs: (Ti, 2) [K, chi0_degrees] (harmonic)
    d14: (Nd, 3) [a12, a6, qq] baked per-dihedral 1-4 pair coefficients
         (see charmm.bake_charmm_14); zero-length => no 1-4 terms
    """

    bonds: np.ndarray
    angles: np.ndarray
    bond_coeffs: np.ndarray
    angle_coeffs: np.ndarray
    angle_style: str = "harmonic"
    dihedrals: np.ndarray = None
    impropers: np.ndarray = None
    dihedral_coeffs: np.ndarray = None
    improper_coeffs: np.ndarray = None
    d14: np.ndarray = None

    @property
    def has_terms(self) -> bool:
        return (len(self.bonds) > 0 or len(self.angles) > 0
                or len(self.dihedrals) > 0 or len(self.impropers) > 0)


def make_bonded(bonds=None, angles=None, bond_coeffs=None, angle_coeffs=None,
                angle_style="harmonic", dihedrals=None, impropers=None,
                dihedral_coeffs=None, improper_coeffs=None, d14=None):
    def arr(a, cols, dt=np.int32):
        return (np.zeros((0, cols), dt) if a is None
                else np.asarray(a, dt))

    bonds = arr(bonds, 3)
    angles = arr(angles, 4)
    dihedrals = arr(dihedrals, 5)
    impropers = arr(impropers, 5)
    bond_coeffs = arr(bond_coeffs, 2, np.float64)
    angle_coeffs = arr(angle_coeffs, 4 if angle_style == "charmm" else 2,
                       np.float64)
    dihedral_coeffs = arr(dihedral_coeffs, 4, np.float64)
    improper_coeffs = arr(improper_coeffs, 2, np.float64)
    d14 = arr(d14, 3, np.float64)
    return BondedStyle(bonds=bonds, angles=angles, bond_coeffs=bond_coeffs,
                       angle_coeffs=angle_coeffs, angle_style=angle_style,
                       dihedrals=dihedrals, impropers=impropers,
                       dihedral_coeffs=dihedral_coeffs,
                       improper_coeffs=improper_coeffs, d14=d14)


class BondedResult(NamedTuple):
    f: jnp.ndarray       # (N, 3)
    ebond: jnp.ndarray
    eangle: jnp.ndarray
    virial: jnp.ndarray  # (6,)
    edihed: jnp.ndarray = None
    eimp: jnp.ndarray = None
    e14_lj: jnp.ndarray = None    # dihedral 1-4 LJ  (tallied to evdwl)
    e14_coul: jnp.ndarray = None  # dihedral 1-4 Coulomb (-> ecoul)

    @property
    def emol(self):
        """Total bonded (molecular) energy: bond+angle+dihedral+improper.
        The 1-4 pair terms are PAIR energies (LAMMPS tallies them into
        E_vdwl/E_coul) and are excluded here."""
        e = self.ebond + self.eangle
        if self.edihed is not None:
            e = e + self.edihed
        if self.eimp is not None:
            e = e + self.eimp
        return e


def _minimg(d, L):
    out = []
    for ax in range(3):
        dd = d[:, ax]
        La = L[ax] if not isinstance(L, np.ndarray) else float(L[ax])
        out.append(dd - jnp.round(dd * (1.0 / La)) * La)
    return jnp.stack(out, axis=-1)


def compute_bonded(style: BondedStyle, x, box: Box, *, eflag=True,
                   acc_dtype=jnp.float32, bonds_idx=None,
                   angles_idx=None, dihedrals_idx=None,
                   impropers_idx=None, eweights=None) -> BondedResult:
    """*_idx: optional traced index overrides (slot-layout engines remap
    atom ids to slots per rebin).

    eweights: optional dict {"bonds"/"angles"/"dihedrals"/"impropers":
    (Nterm,) 0/1 arrays} multiplying ENERGY and VIRIAL tallies per term —
    the multi-device engine owns each term on exactly one shard (forces
    are handled by index redirection instead; see parallel/slab.py)."""
    from ...core.box import axis_lengths

    n = x.shape[0]
    if box.is_triclinic:
        # tilted cells: the shared greedy z->y->x reduction (short bonded
        # vectors are always below half the min perpendicular width).
        # L doubles as the min-image spec handed to the charmm kernels
        # (their _minimg3 is Box-aware).
        L = box

        def _mi(d):
            return minimum_image(d, box)
    else:
        L = axis_lengths(box)

        def _mi(d):
            return _minimg(d, L)
    f = jnp.zeros((n, 3), acc_dtype)
    ebond = jnp.zeros((), acc_dtype)
    eangle = jnp.zeros((), acc_dtype)
    virial = jnp.zeros((6,), acc_dtype)

    def _w(key, nterm):
        if eweights is None or eweights.get(key) is None:
            return None
        return jnp.asarray(eweights[key], x.dtype)

    if len(style.bonds):
        bt = style.bonds[:, 0]
        if bonds_idx is None:
            bi = jnp.asarray(style.bonds[:, 1])
            bj = jnp.asarray(style.bonds[:, 2])
        else:
            bi, bj = bonds_idx[:, 0], bonds_idx[:, 1]
        w = _w("bonds", len(bt))
        K = jnp.asarray(style.bond_coeffs[bt, 0], x.dtype)
        r0 = jnp.asarray(style.bond_coeffs[bt, 1], x.dtype)
        d = _mi(x[bi] - x[bj])
        rsq = jnp.sum(d * d, axis=1)
        r = jnp.sqrt(rsq)
        dr = r - r0
        rk = K * dr
        fbond = jnp.where(r > 0, -2.0 * rk / r, 0.0)
        fv = fbond[:, None] * d
        f = f.at[bi].add(fv.astype(acc_dtype))
        f = f.at[bj].add(-fv.astype(acc_dtype))
        if eflag:
            eb = rk * dr if w is None else rk * dr * w
            ebond = jnp.sum(eb.astype(acc_dtype))
        vb = fbond if w is None else fbond * w
        virial = virial + jnp.stack([
            jnp.sum((vb * d[:, 0] * d[:, 0]).astype(acc_dtype)),
            jnp.sum((vb * d[:, 1] * d[:, 1]).astype(acc_dtype)),
            jnp.sum((vb * d[:, 2] * d[:, 2]).astype(acc_dtype)),
            jnp.sum((vb * d[:, 0] * d[:, 1]).astype(acc_dtype)),
            jnp.sum((vb * d[:, 0] * d[:, 2]).astype(acc_dtype)),
            jnp.sum((vb * d[:, 1] * d[:, 2]).astype(acc_dtype)),
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
        w = _w("angles", len(at))
        K = jnp.asarray(style.angle_coeffs[at, 0], x.dtype)
        th0 = jnp.asarray(np.deg2rad(style.angle_coeffs[at, 1]), x.dtype)
        d1 = _mi(x[ai] - x[aj])
        d2 = _mi(x[ak] - x[aj])
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
            ea = tk * dtheta if w is None else tk * dtheta * w
            eangle = jnp.sum(ea.astype(acc_dtype))
        wv = 1.0 if w is None else w
        virial = virial + jnp.stack([
            jnp.sum((wv * (d1[:, 0] * f1[:, 0] + d2[:, 0] * f3[:, 0])).astype(acc_dtype)),
            jnp.sum((wv * (d1[:, 1] * f1[:, 1] + d2[:, 1] * f3[:, 1])).astype(acc_dtype)),
            jnp.sum((wv * (d1[:, 2] * f1[:, 2] + d2[:, 2] * f3[:, 2])).astype(acc_dtype)),
            jnp.sum((wv * (d1[:, 0] * f1[:, 1] + d2[:, 0] * f3[:, 1])).astype(acc_dtype)),
            jnp.sum((wv * (d1[:, 0] * f1[:, 2] + d2[:, 0] * f3[:, 2])).astype(acc_dtype)),
            jnp.sum((wv * (d1[:, 1] * f1[:, 2] + d2[:, 1] * f3[:, 2])).astype(acc_dtype)),
        ])

    if (len(style.angles) and style.angle_style == "charmm"
            and style.angle_coeffs.shape[1] >= 4):
        # Urey-Bradley 1-3 harmonic term of angle charmm
        at = style.angles[:, 0]
        kub = style.angle_coeffs[at, 2]
        if np.any(kub != 0.0):
            if angles_idx is None:
                ai = jnp.asarray(style.angles[:, 1])
                ak = jnp.asarray(style.angles[:, 3])
            else:
                ai, ak = angles_idx[:, 0], angles_idx[:, 2]
            w = _w("angles", len(at))
            K = jnp.asarray(kub, x.dtype)
            r0 = jnp.asarray(style.angle_coeffs[at, 3], x.dtype)
            d = _mi(x[ai] - x[ak])
            r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=1), 1e-12))
            dr = r - r0
            rk = K * dr
            fbond = -2.0 * rk / r
            fv = fbond[:, None] * d
            f = f.at[ai].add(fv.astype(acc_dtype))
            f = f.at[ak].add(-fv.astype(acc_dtype))
            if eflag:
                eub = rk * dr if w is None else rk * dr * w
                eangle = eangle + jnp.sum(eub.astype(acc_dtype))
            vb = fbond if w is None else fbond * w
            virial = virial + jnp.stack([
                jnp.sum((vb * d[:, 0] * d[:, 0]).astype(acc_dtype)),
                jnp.sum((vb * d[:, 1] * d[:, 1]).astype(acc_dtype)),
                jnp.sum((vb * d[:, 2] * d[:, 2]).astype(acc_dtype)),
                jnp.sum((vb * d[:, 0] * d[:, 1]).astype(acc_dtype)),
                jnp.sum((vb * d[:, 0] * d[:, 2]).astype(acc_dtype)),
                jnp.sum((vb * d[:, 1] * d[:, 2]).astype(acc_dtype)),
            ])

    z = jnp.zeros((), acc_dtype)
    edihed = eimp = e14_lj = e14_coul = z
    if len(style.dihedrals):
        from .charmm import dihedral_charmm_forces

        upd, edihed, e14_lj, e14_coul, dvir = dihedral_charmm_forces(
            x, L, style.dihedrals, style.dihedral_coeffs, style.d14,
            idx=dihedrals_idx, acc_dtype=acc_dtype,
            eweight=_w("dihedrals", len(style.dihedrals)))
        for (ii, fi) in upd.values():
            f = f.at[ii].add(fi.astype(acc_dtype))
        virial = virial + dvir
    if len(style.impropers):
        from .charmm import improper_harmonic_forces

        upd, eimp, ivir = improper_harmonic_forces(
            x, L, style.impropers, style.improper_coeffs,
            idx=impropers_idx, acc_dtype=acc_dtype,
            eweight=_w("impropers", len(style.impropers)))
        for (ii, fi) in upd.values():
            f = f.at[ii].add(fi.astype(acc_dtype))
        virial = virial + ivir

    return BondedResult(f=f, ebond=ebond, eangle=eangle, virial=virial,
                        edihed=edihed, eimp=eimp, e14_lj=e14_lj,
                        e14_coul=e14_coul)


def compute_bonded_peratom(style: BondedStyle, x, box: Box,
                           acc_dtype=jnp.float64,
                           include=("bond", "angle", "dihedral",
                                    "improper")):
    """Per-atom bonded energy/virial tallies (the ev_tally2/3/4 equal-
    division convention of host LAMMPS' bonded styles: each term's
    energy and virial are split evenly among its participants, so the
    sums pin EXACTLY to compute_bonded's global tallies).

    Returns (eatom (N,), vatom (N, 6), e14 (N,), v14 (N, 6)) — the 1-4
    pair terms are tallied separately (halves on the 1/4 atoms, the
    pair-style convention dihedral_charmm.cpp uses) so `compute pe/atom
    pair` decks can fold them into the pair channel.
    Analysis-cadence path: runs per dump frame, never in the hot loop."""
    from ...core.box import axis_lengths

    n = x.shape[0]
    acc = acc_dtype
    if box.is_triclinic:
        L = box

        def _mi(d):
            return minimum_image(d, box)
    else:
        L = axis_lengths(box)

        def _mi(d):
            return _minimg(d, L)
    eatom = jnp.zeros((n,), acc)
    vatom = jnp.zeros((n, 6), acc)
    e14 = jnp.zeros((n,), acc)
    v14 = jnp.zeros((n, 6), acc)

    def v6(w, d):
        return jnp.stack([w * d[:, 0] * d[:, 0], w * d[:, 1] * d[:, 1],
                          w * d[:, 2] * d[:, 2], w * d[:, 0] * d[:, 1],
                          w * d[:, 0] * d[:, 2], w * d[:, 1] * d[:, 2]],
                         -1).astype(acc)

    def share(ea, va, e_t, v_t, members):
        m = float(len(members))
        for ii in members:
            ea = ea.at[ii].add(e_t.astype(acc) / m)
            va = va.at[ii].add(v_t / m)
        return ea, va

    if "bond" in include and len(style.bonds):
        bt = style.bonds[:, 0]
        bi = jnp.asarray(style.bonds[:, 1])
        bj = jnp.asarray(style.bonds[:, 2])
        K = jnp.asarray(style.bond_coeffs[bt, 0], x.dtype)
        r0 = jnp.asarray(style.bond_coeffs[bt, 1], x.dtype)
        d = _mi(x[bi] - x[bj])
        r = jnp.sqrt(jnp.sum(d * d, axis=1))
        dr = r - r0
        rk = K * dr
        fbond = jnp.where(r > 0, -2.0 * rk / r, 0.0)
        eatom, vatom = share(eatom, vatom, rk * dr, v6(fbond, d),
                             (bi, bj))

    if "angle" in include and len(style.angles):
        at = style.angles[:, 0]
        ai = jnp.asarray(style.angles[:, 1])
        aj = jnp.asarray(style.angles[:, 2])
        ak = jnp.asarray(style.angles[:, 3])
        K = jnp.asarray(style.angle_coeffs[at, 0], x.dtype)
        th0 = jnp.asarray(np.deg2rad(style.angle_coeffs[at, 1]), x.dtype)
        d1 = _mi(x[ai] - x[aj])
        d2 = _mi(x[ak] - x[aj])
        r1sq = jnp.sum(d1 * d1, axis=1)
        r2sq = jnp.sum(d2 * d2, axis=1)
        r1, r2 = jnp.sqrt(r1sq), jnp.sqrt(r2sq)
        c = jnp.clip(jnp.sum(d1 * d2, axis=1) / (r1 * r2), -1.0, 1.0)
        s = jnp.sqrt(jnp.maximum(1.0 - c * c, 1e-8))
        dtheta = jnp.arccos(c) - th0
        tk = K * dtheta
        a = -2.0 * tk / s
        a11 = a * c / r1sq
        a12 = -a / (r1 * r2)
        a22 = a * c / r2sq
        f1 = a11[:, None] * d1 + a12[:, None] * d2
        f3 = a22[:, None] * d2 + a12[:, None] * d1
        va = jnp.stack([
            d1[:, 0] * f1[:, 0] + d2[:, 0] * f3[:, 0],
            d1[:, 1] * f1[:, 1] + d2[:, 1] * f3[:, 1],
            d1[:, 2] * f1[:, 2] + d2[:, 2] * f3[:, 2],
            d1[:, 0] * f1[:, 1] + d2[:, 0] * f3[:, 1],
            d1[:, 0] * f1[:, 2] + d2[:, 0] * f3[:, 2],
            d1[:, 1] * f1[:, 2] + d2[:, 1] * f3[:, 2],
        ], -1).astype(acc)
        eatom, vatom = share(eatom, vatom, tk * dtheta, va, (ai, aj, ak))

        if (style.angle_style == "charmm"
                and style.angle_coeffs.shape[1] >= 4
                and np.any(style.angle_coeffs[at, 2] != 0.0)):
            Ku = jnp.asarray(style.angle_coeffs[at, 2], x.dtype)
            ru = jnp.asarray(style.angle_coeffs[at, 3], x.dtype)
            d = _mi(x[ai] - x[ak])
            r = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=1), 1e-12))
            dr = r - ru
            rk = Ku * dr
            fb = -2.0 * rk / r
            eatom, vatom = share(eatom, vatom, rk * dr, v6(fb, d),
                                 (ai, ak))

    if "dihedral" in include and len(style.dihedrals):
        from .charmm import _dihedral_energy_terms, _minimg3

        dh = style.dihedrals
        dt = dh[:, 0]
        i1 = jnp.asarray(dh[:, 1]); i2 = jnp.asarray(dh[:, 2])
        i3 = jnp.asarray(dh[:, 3]); i4 = jnp.asarray(dh[:, 4])
        flt = x.dtype
        K = jnp.asarray(style.dihedral_coeffs[dt, 0], flt)
        n_i = np.asarray(style.dihedral_coeffs[dt, 1], np.int32)
        d_cos = jnp.asarray(
            np.cos(np.deg2rad(style.dihedral_coeffs[dt, 2])), flt)
        zero = jnp.zeros((len(dt),), flt)
        b1 = _minimg3(x[i1] - x[i2], L)
        b2 = _minimg3(x[i3] - x[i2], L)
        b3 = _minimg3(x[i4] - x[i3], L)

        def ed_only(b1, b2, b3):
            ed, _, _ = _dihedral_energy_terms(b1, b2, b3, K, n_i, d_cos,
                                              zero, zero, zero)
            return jnp.sum(ed.astype(acc))

        g1, g2, g3 = jax.grad(ed_only, argnums=(0, 1, 2))(b1, b2, b3)
        ed, _, _ = _dihedral_energy_terms(b1, b2, b3, K, n_i, d_cos,
                                          zero, zero, zero)
        vd = jnp.stack([
            -b1[:, 0] * g1[:, 0] - b2[:, 0] * g2[:, 0] - b3[:, 0] * g3[:, 0],
            -b1[:, 1] * g1[:, 1] - b2[:, 1] * g2[:, 1] - b3[:, 1] * g3[:, 1],
            -b1[:, 2] * g1[:, 2] - b2[:, 2] * g2[:, 2] - b3[:, 2] * g3[:, 2],
            -b1[:, 0] * g1[:, 1] - b2[:, 0] * g2[:, 1] - b3[:, 0] * g3[:, 1],
            -b1[:, 0] * g1[:, 2] - b2[:, 0] * g2[:, 2] - b3[:, 0] * g3[:, 2],
            -b1[:, 1] * g1[:, 2] - b2[:, 1] * g2[:, 2] - b3[:, 1] * g3[:, 2],
        ], -1).astype(acc)
        eatom, vatom = share(eatom, vatom, ed, vd, (i1, i2, i3, i4))

        if style.d14 is not None and len(style.d14):
            # 1-4 pair terms: pair-style tally convention (halves on the
            # 1/4 atoms, dihedral_charmm.cpp ev_tally via Pair)
            a12 = jnp.asarray(style.d14[:, 0], flt)
            a6 = jnp.asarray(style.d14[:, 1], flt)
            qq = jnp.asarray(style.d14[:, 2], flt)
            r14 = b1 - b2 - b3
            rsq = jnp.maximum(jnp.sum(r14 * r14, -1), 1e-12)
            r6inv = 1.0 / (rsq * rsq * rsq)
            elj = r6inv * (a12 * r6inv - a6)
            ec = qq / jnp.sqrt(rsq)
            # F.r = 12 a12 r^-12 - 6 a6 r^-6 + qq/r; fpair = F.r / r^2
            fpair = (r6inv * (12.0 * a12 * r6inv - 6.0 * a6) + ec) / rsq
            e14, v14 = share(e14, v14, elj + ec, v6(fpair, r14),
                             (i1, i4))

    if "improper" in include and len(style.impropers):
        from .charmm import _improper_energy, _minimg3

        im = style.impropers
        it = im[:, 0]
        i1 = jnp.asarray(im[:, 1]); i2 = jnp.asarray(im[:, 2])
        i3 = jnp.asarray(im[:, 3]); i4 = jnp.asarray(im[:, 4])
        flt = x.dtype
        K = jnp.asarray(style.improper_coeffs[it, 0], flt)
        chi0 = jnp.asarray(np.deg2rad(style.improper_coeffs[it, 1]), flt)
        b1 = _minimg3(x[i1] - x[i2], L)
        b2 = _minimg3(x[i3] - x[i2], L)
        b3 = _minimg3(x[i4] - x[i3], L)

        def ei_only(b1, b2, b3):
            return jnp.sum(_improper_energy(b1, b2, b3, K, chi0)
                           .astype(acc))

        g1, g2, g3 = jax.grad(ei_only, argnums=(0, 1, 2))(b1, b2, b3)
        e = _improper_energy(b1, b2, b3, K, chi0)
        vi = jnp.stack([
            -b1[:, 0] * g1[:, 0] - b2[:, 0] * g2[:, 0] - b3[:, 0] * g3[:, 0],
            -b1[:, 1] * g1[:, 1] - b2[:, 1] * g2[:, 1] - b3[:, 1] * g3[:, 1],
            -b1[:, 2] * g1[:, 2] - b2[:, 2] * g2[:, 2] - b3[:, 2] * g3[:, 2],
            -b1[:, 0] * g1[:, 1] - b2[:, 0] * g2[:, 1] - b3[:, 0] * g3[:, 1],
            -b1[:, 0] * g1[:, 2] - b2[:, 0] * g2[:, 2] - b3[:, 0] * g3[:, 2],
            -b1[:, 1] * g1[:, 2] - b2[:, 1] * g2[:, 2] - b3[:, 1] * g3[:, 2],
        ], -1).astype(acc)
        eatom, vatom = share(eatom, vatom, e, vi, (i1, i2, i3, i4))

    return eatom, vatom, e14, v14
