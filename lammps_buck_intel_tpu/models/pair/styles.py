"""Pair-style family: Buckingham / LJ x {none, cut, long} Coulomb x
{cut, long} dispersion.

Functional re-design of the reference's five pair styles:

  buck                 /root/reference/pair_buck_intel.cpp:260-272
  buck/coul/cut        /root/reference/pair_buck_coul_cut_intel.cpp:277-319
  buck/coul/long       /root/reference/pair_buck_coul_long_intel.cpp:294-339
  buck/long/coul/long  /root/reference/pair_buck_long_coul_long_intel.cpp:400-454
  lj/long/coul/long    /root/reference/pair_lj_long_coul_long_intel.cpp:621-676
  (+ lj/cut/coul/long, required by examples/in.spce:10)

Where the reference specializes its hot loop with template ints
(EVFLAG/EFLAG/ORDER1/ORDER6/..., e.g. the 128-leaf dispatch at
pair_lj_long_coul_long_intel.cpp:117-419), we use a static ``PairConfig``:
each (coul, disp, vdw) combination traces its own XLA program under jit.
Cutoff branches become ``jnp.where`` masks over the padded neighbor tile —
the INTEL_VMASK idiom (pair_buck_intel.cpp:257-268) is the natural TPU form.
The erfc bit-cast table lookup (pair_buck_coul_long_intel.cpp:317-339) is
deliberately NOT reproduced: on the VPU the 5-term polynomial is cheaper
than a gather.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

# Abramowitz & Stegun 7.1.26 erfc approximation, as used for the Ewald
# real-space kernel (pair_buck_coul_long_intel.cpp:296-303).
EWALD_F = 1.12837917  # 2/sqrt(pi)
EWALD_P = 0.3275911
ERFC_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)


@dataclasses.dataclass(frozen=True)
class PairConfig:
    """Static (jit-specializing) pair-style configuration."""

    name: str
    vdw: str   # "buck" | "lj" | "none"
    coul: str  # "none" | "cut" | "long"
    disp: str  # "cut" | "long"   (long => Ewald-split r^-6, ORDER6)

    @property
    def has_coul(self) -> bool:
        return self.coul != "none"


@dataclasses.dataclass
class PairStyle:
    """Coefficient tables + scalars for one pair style.

    tables: (T, T, ncoef) per-type-pair coefficients (the c_force_t /
    c_energy_t analog, pair_buck_intel.h:64-65).  Column layout per cfg.vdw:
      buck: [buck1, buck2, a, c, rhoinv, cut_ljsq, offset, cut_coulsq]
      lj:   [lj1, lj2, lj3, lj4, 0, cut_ljsq, offset, cut_coulsq]
    scalars: qqrd2e, g_ewald, g_ewald_6, special_lj[4], special_coul[4]
    (slot 0 == 1.0, mirroring pack_force_const slot0->1.0 at
    pair_buck_coul_long_intel.cpp:507-515).

    All tables/scalars are **host numpy** and are baked into the compiled
    program as literal constants — the TPU analog of the reference's
    compile-time template specialization, and a hard performance requirement
    (device-scalar broadcasts poison XLA TPU codegen; see core/box.py note).
    """

    cfg: PairConfig
    tables: np.ndarray
    special_lj: np.ndarray
    special_coul: np.ndarray
    qqrd2e: float
    g_ewald: float = 0.0
    g_ewald_6: float = 0.0
    cutsq_max: float = 0.0  # max over tables of all cutoffs (neighbor cut)
    # lj/charmm switching region (pair_lj_charmm_coul_long.cpp):
    inner_sq: float = 0.0   # cut_lj_inner^2
    denom_lj: float = 1.0   # (cut_ljsq - inner_sq)^3
    eps14: np.ndarray = None   # (T,) 1-4 LJ params for dihedral charmm
    sig14: np.ndarray = None

    def replace(self, **kw) -> "PairStyle":
        return dataclasses.replace(self, **kw)


NCOEF = 8
COEF_NAMES = ("c0", "c1", "e0", "e1", "rhoinv", "cut_ljsq", "offset",
              "cut_coulsq")
_COL = {name: i for i, name in enumerate(COEF_NAMES)}


def _mix_geometric(e, s):
    return np.sqrt(e[:, None] * e[None, :]), np.sqrt(s[:, None] * s[None, :])


def _mix_arithmetic(e, s):
    return np.sqrt(e[:, None] * e[None, :]), 0.5 * (s[:, None] + s[None, :])


def build_buck(
    ntypes: int,
    coeffs: dict[tuple[int, int], tuple],
    cut_global: float,
    coul: str = "none",
    disp: str = "cut",
    cut_coul: Optional[float] = None,
    special_lj=(1.0, 0.0, 0.0, 0.0),
    special_coul=(1.0, 0.0, 0.0, 0.0),
    qqrd2e: float = 1.0,
    shift: bool = False,
    name: Optional[str] = None,
    dtype=jnp.float32,
) -> PairStyle:
    """Buckingham family builder.

    coeffs: {(i, j) 0-based: (A, rho, C[, cut_lj[, cut_coul]])} — every
    type pair must be given (buck has no mixing rule, matching LAMMPS).
    """
    cut_coul = cut_global if cut_coul is None else cut_coul
    t = np.zeros((ntypes, ntypes, NCOEF), np.float64)
    seen = np.zeros((ntypes, ntypes), bool)
    for (i, j), c in coeffs.items():
        a, rho, cc = c[0], c[1], c[2]
        cut_lj = c[3] if len(c) > 3 else cut_global
        ccoul = c[4] if len(c) > 4 else cut_coul
        if rho <= 0:
            raise ValueError("buck rho must be > 0")
        row = np.zeros(NCOEF)
        row[_COL["c0"]] = a / rho          # buck1
        row[_COL["c1"]] = 6.0 * cc         # buck2
        row[_COL["e0"]] = a
        row[_COL["e1"]] = cc
        row[_COL["rhoinv"]] = 1.0 / rho
        row[_COL["cut_ljsq"]] = cut_lj**2
        row[_COL["cut_coulsq"]] = ccoul**2
        if shift:
            r6 = cut_lj**-6
            row[_COL["offset"]] = a * np.exp(-cut_lj / rho) - cc * r6
        for ii, jj in ((i, j), (j, i)):
            t[ii, jj] = row
            seen[ii, jj] = True
    if not seen.all():
        missing = np.argwhere(~seen)
        raise ValueError(f"buck coeffs missing for type pairs {missing[:4] + 1}")
    cfg = PairConfig(
        name=name or f"buck/coul/{coul}" if coul != "none" else "buck",
        vdw="buck", coul=coul, disp=disp,
    )
    cutsq_max = float(max(t[..., _COL["cut_ljsq"]].max(),
                          t[..., _COL["cut_coulsq"]].max() if coul != "none" else 0.0))
    return PairStyle(
        cfg=cfg,
        tables=t,
        special_lj=np.asarray(special_lj, np.float64),
        special_coul=np.asarray(special_coul, np.float64),
        qqrd2e=float(qqrd2e),
        cutsq_max=cutsq_max,
    )


def build_lj(
    ntypes: int,
    coeffs: dict[int | tuple[int, int], tuple],
    cut_global: float,
    coul: str = "none",
    disp: str = "cut",
    cut_coul: Optional[float] = None,
    mix: str = "geometric",
    special_lj=(1.0, 0.0, 0.0, 0.0),
    special_coul=(1.0, 0.0, 0.0, 0.0),
    qqrd2e: float = 1.0,
    shift: bool = False,
    name: Optional[str] = None,
    dtype=jnp.float32,
) -> PairStyle:
    """LJ 12-6 family builder.

    coeffs: {i: (eps, sigma)} per type, or {(i,j): (eps, sigma[, cut_lj])}
    overrides.  Unspecified cross terms are mixed (geometric default — the
    behavior examples/in.hexane:19 relies on).
    """
    cut_coul = cut_global if cut_coul is None else cut_coul
    eps = np.zeros(ntypes)
    sig = np.zeros(ntypes)
    diag_seen = np.zeros(ntypes, bool)
    pair_override: dict[tuple[int, int], tuple] = {}
    for key, c in coeffs.items():
        if isinstance(key, tuple):
            i, j = key
            if i == j:
                eps[i], sig[i] = c[0], c[1]
                diag_seen[i] = True
            pair_override[(min(i, j), max(i, j))] = c
        else:
            eps[key], sig[key] = c[0], c[1]
            diag_seen[key] = True
    mixer = _mix_geometric if mix == "geometric" else _mix_arithmetic
    e_ij, s_ij = mixer(eps, sig)
    cut_lj_ij = np.full((ntypes, ntypes), cut_global, np.float64)
    for (i, j), c in pair_override.items():
        e_ij[i, j] = e_ij[j, i] = c[0]
        s_ij[i, j] = s_ij[j, i] = c[1]
        if len(c) > 2:
            cut_lj_ij[i, j] = cut_lj_ij[j, i] = c[2]

    t = np.zeros((ntypes, ntypes, NCOEF), np.float64)
    s6 = s_ij**6
    t[..., _COL["c0"]] = 48.0 * e_ij * s6 * s6   # lj1
    t[..., _COL["c1"]] = 24.0 * e_ij * s6        # lj2
    t[..., _COL["e0"]] = 4.0 * e_ij * s6 * s6    # lj3
    t[..., _COL["e1"]] = 4.0 * e_ij * s6         # lj4
    t[..., _COL["cut_ljsq"]] = cut_lj_ij**2
    t[..., _COL["cut_coulsq"]] = cut_coul**2
    if shift:
        r6 = s6 / cut_lj_ij**6
        t[..., _COL["offset"]] = 4.0 * e_ij * (r6 * r6 - r6)
    cfg = PairConfig(
        name=name or "lj/cut", vdw="lj", coul=coul, disp=disp,
    )
    cutsq_max = float(max(t[..., _COL["cut_ljsq"]].max(),
                          t[..., _COL["cut_coulsq"]].max() if coul != "none" else 0.0))
    return PairStyle(
        cfg=cfg,
        tables=t,
        special_lj=np.asarray(special_lj, np.float64),
        special_coul=np.asarray(special_coul, np.float64),
        qqrd2e=float(qqrd2e),
        cutsq_max=cutsq_max,
    )


def build_lj_charmm(
    ntypes: int,
    coeffs: dict[int, tuple],
    inner: float,
    cut_lj: float,
    coul: str = "long",
    cut_coul: Optional[float] = None,
    special_lj=(1.0, 0.0, 0.0, 0.0),
    special_coul=(1.0, 0.0, 0.0, 0.0),
    qqrd2e: float = 1.0,
    name: Optional[str] = None,
) -> PairStyle:
    """lj/charmm/coul/{long,cut} builder
    (/root/reference/examples/in.rhodo:11 `pair_style lj/charmm/coul/long
    4.0 6.0`; physics per LAMMPS pair_lj_charmm_coul_long.cpp).

    coeffs: {type: (eps, sigma[, eps14, sigma14])}.  CHARMM mixes
    arithmetically; the energy switches smoothly to zero between `inner`
    and `cut_lj`.  eps14/sig14 default to eps/sigma and are consumed by
    dihedral charmm's baked 1-4 terms (bake_charmm_14), not here —
    special_bonds charmm zeroes 1-2/1-3/1-4 in the pair pass.
    """
    cut_coul = cut_lj if cut_coul is None else cut_coul
    eps = np.zeros(ntypes)
    sig = np.zeros(ntypes)
    e14 = np.zeros(ntypes)
    s14 = np.zeros(ntypes)
    for t, c in coeffs.items():
        eps[t], sig[t] = c[0], c[1]
        e14[t] = c[2] if len(c) > 2 else c[0]
        s14[t] = c[3] if len(c) > 3 else c[1]
    e_ij, s_ij = _mix_arithmetic(eps, sig)
    t = np.zeros((ntypes, ntypes, NCOEF), np.float64)
    s6 = s_ij**6
    t[..., _COL["c0"]] = 48.0 * e_ij * s6 * s6
    t[..., _COL["c1"]] = 24.0 * e_ij * s6
    t[..., _COL["e0"]] = 4.0 * e_ij * s6 * s6
    t[..., _COL["e1"]] = 4.0 * e_ij * s6
    t[..., _COL["cut_ljsq"]] = cut_lj**2
    t[..., _COL["cut_coulsq"]] = cut_coul**2
    cfg = PairConfig(
        name=name or f"lj/charmm/coul/{coul}", vdw="ljcharmm", coul=coul,
        disp="cut",
    )
    inner_sq = float(inner**2)
    return PairStyle(
        cfg=cfg,
        tables=t,
        special_lj=np.asarray(special_lj, np.float64),
        special_coul=np.asarray(special_coul, np.float64),
        qqrd2e=float(qqrd2e),
        cutsq_max=float(max(cut_lj, cut_coul) ** 2),
        inner_sq=inner_sq,
        denom_lj=float((cut_lj**2 - inner_sq) ** 3),
        eps14=e14,
        sig14=s14,
    )


def erfc_approx(grij, expm2, dtype):
    """A&S 5-term erfc(x)*exp(x^2) form: erfc = t*poly(t)*exp(-x^2)."""
    a1, a2, a3, a4, a5 = (float(a) for a in ERFC_A)
    t = 1.0 / (1.0 + float(EWALD_P) * grij)
    return t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5)))) * expm2


def pair_terms(style: PairStyle, rsq, coef, qi, qj, f_lj, f_coul, *, eflag: bool):
    """Per-pair force scalar + energies for one gathered neighbor tile.

    rsq: (..., ) squared distances (garbage at masked slots — caller masks).
    coef: dict of per-pair coefficient planes (see COEF_NAMES), each
      broadcastable against rsq — scalars for single-type systems, (N, K)
      planes otherwise (component-SoA, never a packed (..., NCOEF) array:
      minor-dim 8 would pad to the 128 lane tile).
    f_lj/f_coul: (...,) special-bond factors (1.0 for plain pairs).
    Returns (fscalar, evdwl, ecoul) with fscalar = (F_vdw + F_coul)/r * 1/r,
    i.e. F_i += fscalar * (x_i - x_j), matching the reference's
    ``fpair = force* r2inv`` convention (pair_buck_intel.cpp:286-289).
    """
    cfg = style.cfg
    dtype = rsq.dtype
    rsq = jnp.maximum(rsq, 1e-12)
    r2inv = 1.0 / rsq
    r = jnp.sqrt(rsq)
    zero = jnp.zeros_like(rsq)

    c0 = coef["c0"]
    c1 = coef["c1"]
    e0 = coef["e0"]
    e1 = coef["e1"]
    cut_ljsq = coef["cut_ljsq"]
    offset = coef["offset"]
    cut_coulsq = coef["cut_coulsq"]

    evdwl = zero
    ecoul = zero

    # ---- van der Waals ----
    if cfg.vdw == "none":
        fvdw = zero
    else:
        r6inv = r2inv * r2inv * r2inv
        if cfg.vdw == "buck":
            rexp = jnp.exp(-r * coef["rhoinv"])
            rep_f = r * rexp * c0           # repulsive force piece
            rep_e = e0 * rexp
        else:  # lj / ljcharmm
            rep_f = r6inv * r6inv * c0
            rep_e = r6inv * r6inv * e0
        if cfg.vdw == "ljcharmm":
            # CHARMM energy-switch between inner and outer LJ cutoffs
            # (pair_lj_charmm_coul_long.cpp:116-128)
            forcelj = rep_f - r6inv * c1
            philj = rep_e - e1 * r6inv
            innersq = float(style.inner_sq)
            denom = float(style.denom_lj)
            tt = cut_ljsq - rsq
            switch1 = tt * tt * (cut_ljsq + 2.0 * rsq - 3.0 * innersq) \
                / denom
            switch2 = 12.0 * rsq * tt * (rsq - innersq) / denom
            sw = rsq > innersq
            fvdw = jnp.where(sw, forcelj * switch1 + philj * switch2,
                             forcelj) * f_lj
            evdwl = jnp.where(sw, philj * switch1, philj) * f_lj
            in_lj = rsq < cut_ljsq
            fvdw = jnp.where(in_lj, fvdw, zero)
            evdwl = jnp.where(in_lj, evdwl, zero)
        elif cfg.disp == "long":
            # Ewald-split dispersion real-space damping
            # (pair_buck_long_coul_long_intel.cpp:400-421,
            #  pair_lj_long_coul_long_intel.cpp:621-638)
            g2 = float(style.g_ewald_6**2)
            g6 = float(style.g_ewald_6**6)
            g8 = float(style.g_ewald_6**8)
            grij2 = g2 * rsq
            a2 = 1.0 / jnp.maximum(grij2, 1e-30)
            x2 = a2 * jnp.exp(-grij2) * e1
            fvdw = rep_f - g8 * x2 * rsq * (((6.0 * a2 + 6.0) * a2 + 3.0) * a2 + 1.0)
            evdwl = rep_e - g6 * x2 * ((a2 + 1.0) * a2 + 0.5)
            # special-bond correction is ADDITIVE on the undamped pair term
            # (the k-space part cannot be specialed per-pair); statically
            # elided when the deck has no special bonds (f_lj is the
            # python scalar 1.0 — XLA won't fold 0.0 * x)
            if not (isinstance(f_lj, float) and f_lj == 1.0):
                tadd = f_lj - 1.0
                if cfg.vdw == "buck":
                    fvdw = fvdw + tadd * (rep_f - r6inv * c1)
                    evdwl = evdwl + tadd * (rep_e - e1 * r6inv)
                else:
                    tl = r6inv * (1.0 - f_lj)
                    fvdw = fvdw + tl * (c1 - r6inv * c0)
                    evdwl = evdwl + tl * (e1 - r6inv * e0)
        else:
            fvdw = rep_f - r6inv * c1
            evdwl = (rep_e - e1 * r6inv - offset) * f_lj
            fvdw = fvdw * f_lj
        in_lj = rsq < cut_ljsq
        fvdw = jnp.where(in_lj, fvdw, zero)
        evdwl = jnp.where(in_lj, evdwl, zero)

    # ---- Coulomb ----
    if cfg.coul == "none":
        fcoul = zero
    else:
        qq = float(style.qqrd2e) * qi * qj
        # rinv from the already-computed r and r2inv (one multiply); a
        # second jnp.sqrt here measured as a real slice of the pair phase
        rinv = r * r2inv
        if cfg.coul == "cut":
            fcoul = qq * rinv * f_coul
            ecoul = fcoul
        else:  # long: Ewald real space
            prefactor = qq * rinv
            grij = float(style.g_ewald) * r
            expm2 = jnp.exp(-grij * grij)
            erfc = erfc_approx(grij, expm2, dtype)
            fcoul = prefactor * (erfc + float(EWALD_F) * grij * expm2)
            ecoul = prefactor * erfc
            # subtractive special handling (k-space includes ALL pairs);
            # statically elided when the deck has no special bonds
            # (f_coul stays the python scalar 1.0 — XLA keeps 0.0 * x
            # for NaN semantics, so fold it here)
            if not (isinstance(f_coul, float) and f_coul == 1.0):
                adjust = (1.0 - f_coul) * prefactor
                fcoul = fcoul - adjust
                ecoul = ecoul - adjust
        in_coul = rsq < cut_coulsq
        fcoul = jnp.where(in_coul, fcoul, zero)
        ecoul = jnp.where(in_coul, ecoul, zero)

    fscalar = (fvdw + fcoul) * r2inv
    if not eflag:
        evdwl = ecoul = None
    return fscalar, evdwl, ecoul
