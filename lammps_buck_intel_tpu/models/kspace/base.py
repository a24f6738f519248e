"""K-space solver shared machinery (SURVEY.md H5).

Host-side setup math inherited-by-contract from LAMMPS' KSpace/PPPM base
classes (used throughout /root/reference/pppm_intel.cpp but implemented
upstream): accuracy -> g_ewald solve, error estimates, and unit plumbing.
All published formulas (Kolafa-Perram real-space RMS error; Petersen /
Deserno-Holm k-space estimates).
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class KSpaceResult(NamedTuple):
    f: jnp.ndarray       # (N, 3) acc dtype
    elong: jnp.ndarray   # ()
    virial: jnp.ndarray  # (6,)


def two_charge_force(qqrd2e: float) -> float:
    """Force between two unit charges one distance unit apart — converts
    relative accuracy to absolute force accuracy (LAMMPS convention)."""
    return qqrd2e


def solve_g_ewald(
    accuracy_abs: float,
    cutoff: float,
    natoms: int,
    volume: float,
    q2: float,
) -> float:
    """Choose the Ewald splitting parameter from the real-space RMS force
    error  dF = 2 q2 sqrt(1/(N rc V)) exp(-g^2 rc^2)  == accuracy.

    q2 = qsqsum * qqrd2e.  Falls back to the empirical
    (1.35 - 0.15 log(acc))/rc when the closed form has no solution.
    """
    arg = accuracy_abs * math.sqrt(
        natoms * cutoff * volume
    ) / (2.0 * q2)
    if arg >= 1.0:
        return (1.35 - 0.15 * math.log(accuracy_abs)) / cutoff
    return math.sqrt(-math.log(arg)) / cutoff


def rms_real(g: float, cutoff: float, natoms: int, volume: float,
             q2: float) -> float:
    return (2.0 * q2 * math.sqrt(1.0 / (natoms * cutoff * volume))
            * math.exp(-g * g * cutoff * cutoff))


def rms_kspace_ewald(km: int, prd: float, natoms: int, g: float,
                     q2: float) -> float:
    """Petersen's RMS force error for a truncated Ewald sum along one axis."""
    if km <= 0:
        return math.inf
    return (2.0 * q2 * g / prd
            * math.sqrt(1.0 / (math.pi * km * natoms))
            * math.exp(-(math.pi * km / (g * prd)) ** 2))


# Deserno & Holm (1998) P3M ik-differentiation error expansion coefficients,
# indexed acons[order][m] (the table LAMMPS' PPPM::compute_acons builds).
def acons_table() -> np.ndarray:
    a = np.zeros((8, 7))
    a[1][0] = 2.0 / 3.0
    a[2][0] = 1.0 / 50.0
    a[2][1] = 5.0 / 294.0
    a[3][0] = 1.0 / 588.0
    a[3][1] = 7.0 / 1440.0
    a[3][2] = 21.0 / 3872.0
    a[4][0] = 1.0 / 4320.0
    a[4][1] = 3.0 / 1936.0
    a[4][2] = 7601.0 / 2271360.0
    a[4][3] = 143.0 / 28800.0
    a[5][0] = 1.0 / 23232.0
    a[5][1] = 7601.0 / 13628160.0
    a[5][2] = 143.0 / 69120.0
    a[5][3] = 517231.0 / 106536960.0
    a[5][4] = 106640677.0 / 11737571328.0
    a[6][0] = 691.0 / 68140800.0
    a[6][1] = 13.0 / 57600.0
    a[6][2] = 47021.0 / 35512320.0
    a[6][3] = 9694607.0 / 2095994880.0
    a[6][4] = 733191589.0 / 59609088000.0
    a[6][5] = 326190917.0 / 11700633600.0
    a[7][0] = 1.0 / 345600.0
    a[7][1] = 3617.0 / 35512320.0
    a[7][2] = 745739.0 / 838397952.0
    a[7][3] = 56399353.0 / 12773376000.0
    a[7][4] = 25091609.0 / 1560084480.0
    a[7][5] = 1755948832039.0 / 36229939200000.0
    a[7][6] = 4887769399.0 / 37838389248.0
    return a


def estimate_ik_error(h: float, prd: float, natoms: int, order: int,
                      g_ewald: float, q2: float) -> float:
    """P3M ik-differentiation k-space RMS force error (Deserno-Holm)."""
    acons = acons_table()
    s = sum(acons[order][m] * (h * g_ewald) ** (2 * m) for m in range(order))
    return (q2 * (h * g_ewald) ** order
            * math.sqrt(g_ewald * prd * math.sqrt(2.0 * math.pi) * s / natoms)
            / (prd * prd))


class BoundKSpace:
    """Adapts a solver needing per-atom inputs other than charge (e.g.
    dispersion 'charges' B_i) to the runner's kspace.compute(x, q) slot."""

    def __init__(self, solver, per_atom, typed: bool = False):
        import numpy as np

        self.solver = solver
        self.per_atom = np.asarray(per_atom)
        self.typed = typed  # per_atom is type ids; use the channel path

    def compute(self, x, q, eflag=True, vflag=True):
        import jax.numpy as jnp

        if self.typed:
            return self.solver.compute_typed(x, self.per_atom,
                                             eflag=eflag, vflag=vflag)
        b = jnp.asarray(self.per_atom, x.dtype)
        return self.solver.compute(x, b, eflag=eflag, vflag=vflag)

    def compute_slot(self, x, aid, q, eflag=True, vflag=True):
        """Slot-order form for the cell-pair engine: x is (NS, 3) slot
        positions, aid (NS,) atom ids CLAMPED to N for empty slots.  The
        baked atom-order inputs gather through aid with a zero pad row,
        so empty slots carry zero dispersion charge and contribute
        nothing (q is ignored; it rides the runner signature)."""
        import jax.numpy as jnp
        import numpy as np

        if self.typed:
            A = np.asarray(self.solver.A)
            af = A[:, self.per_atom]                       # (nch, N)
            af = np.concatenate([af, np.zeros((af.shape[0], 1))], 1)
            a_slot = jnp.asarray(af, x.dtype)[:, aid]
            return self.solver.compute_channels(x, a_slot, self.solver.P,
                                                eflag=eflag, vflag=vflag)
        b = np.concatenate([self.per_atom, [0.0]])
        b_slot = jnp.asarray(b, x.dtype)[aid]
        return self.solver.compute(x, b_slot, eflag=eflag, vflag=vflag)


class CombinedKSpace:
    """Sums several kspace solvers (e.g. coulomb PPPM + dispersion PPPM,
    the pppm/disp dual-pipeline analog — pppm_disp_intel.cpp:183-313)."""

    def __init__(self, solvers):
        self.solvers = solvers

    def compute(self, x, q, eflag=True, vflag=True):
        out = None
        for s in self.solvers:
            r = s.compute(x, q, eflag=eflag, vflag=vflag)
            if out is None:
                out = r
            else:
                out = KSpaceResult(
                    f=out.f + r.f, elong=out.elong + r.elong,
                    virial=out.virial + r.virial,
                )
        return out

    def compute_slot(self, x, aid, q, eflag=True, vflag=True):
        """Slot-order dispatch: charge solvers take slot q directly
        (empty slots have q = 0); atom-order-baked solvers gather
        through aid (BoundKSpace.compute_slot)."""
        out = None
        for s in self.solvers:
            if hasattr(s, "compute_slot"):
                r = s.compute_slot(x, aid, q, eflag=eflag, vflag=vflag)
            else:
                r = s.compute(x, q, eflag=eflag, vflag=vflag)
            if out is None:
                out = r
            else:
                out = KSpaceResult(
                    f=out.f + r.f, elong=out.elong + r.elong,
                    virial=out.virial + r.virial,
                )
        return out
