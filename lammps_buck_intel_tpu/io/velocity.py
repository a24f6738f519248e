"""``velocity create`` — initial velocity seeding.

Host-LAMMPS command used by every deck (e.g. examples/in.buck:19,
in.spce:33 ``dist uniform``).  We match semantics (distribution, zeroed
aggregate linear momentum, exact rescale to the target temperature) but not
LAMMPS' RNG stream bit-for-bit; parity testing therefore compares statistics
and conserved quantities, not per-atom velocities.
"""
from __future__ import annotations

import numpy as np


def temperature(v: np.ndarray, mass_per_atom: np.ndarray, units,
                extra_dof: int = 3) -> float:
    """Instantaneous temperature: T = sum(m v^2) * mvv2e / (dof * boltz)."""
    n = v.shape[0]
    dof = max(3 * n - extra_dof, 1)
    ke2 = float(np.sum(mass_per_atom[:, None] * v * v)) * units.mvv2e
    return ke2 / (dof * units.boltz)


def create(
    n_atoms: int,
    t_target: float,
    seed: int,
    mass_per_atom: np.ndarray,
    units,
    dist: str = "gaussian",
    zero_momentum: bool = True,
) -> np.ndarray:
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    if dist == "gaussian":
        v = rng.standard_normal((n_atoms, 3))
    elif dist == "uniform":
        v = rng.uniform(-1.0, 1.0, size=(n_atoms, 3))
    else:
        raise ValueError(f"unknown velocity distribution {dist!r}")
    v /= np.sqrt(mass_per_atom)[:, None]

    if zero_momentum and n_atoms > 1:
        p = np.sum(mass_per_atom[:, None] * v, axis=0)
        v -= (p / mass_per_atom.sum())[None, :]

    t_now = temperature(v, mass_per_atom, units)
    if t_now > 0:
        v *= np.sqrt(t_target / t_now)
    return v
