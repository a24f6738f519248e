"""Trajectory dumps (SURVEY.md §5.5 — the decks' ``dump`` commands).

LAMMPS-native ``lammpstrj`` text format (readable by OVITO/VMD/mdtraj) and
minimalist xyz.  The reference decks dump images (in.spce:39); trajectory
dumps are the analysis-grade superset.
"""
from __future__ import annotations

import jax
import numpy as np


def _atoms_of(sim):
    if hasattr(sim, "get_atoms"):
        a = sim.get_atoms()
        return a["x"], a["typ"], a["v"]
    st = jax.device_get(sim.state)
    return np.asarray(st.x), sim.typ, np.asarray(st.v)


def write_lammpstrj(path: str, sim, append: bool = True) -> None:
    x, typ, v = _atoms_of(sim)
    lo = np.asarray(sim.box.lo, np.float64)
    hi = np.asarray(sim.box.hi, np.float64)
    n = len(x)
    mode = "a" if append else "w"
    with open(path, mode) as f:
        f.write("ITEM: TIMESTEP\n")
        f.write(f"{sim.step_count}\n")
        f.write("ITEM: NUMBER OF ATOMS\n")
        f.write(f"{n}\n")
        f.write("ITEM: BOX BOUNDS pp pp pp\n")
        for ax in range(3):
            f.write(f"{lo[ax]:.16e} {hi[ax]:.16e}\n")
        f.write("ITEM: ATOMS id type x y z vx vy vz\n")
        for i in range(n):
            f.write(
                f"{i + 1} {int(typ[i]) + 1} "
                f"{x[i, 0]:.8g} {x[i, 1]:.8g} {x[i, 2]:.8g} "
                f"{v[i, 0]:.8g} {v[i, 1]:.8g} {v[i, 2]:.8g}\n"
            )


def write_xyz(path: str, sim, append: bool = True,
              symbols=None) -> None:
    x, typ, _ = _atoms_of(sim)
    n = len(x)
    mode = "a" if append else "w"
    with open(path, mode) as f:
        f.write(f"{n}\n")
        f.write(f"step {sim.step_count}\n")
        for i in range(n):
            sym = symbols[typ[i]] if symbols else f"T{int(typ[i]) + 1}"
            f.write(f"{sym} {x[i, 0]:.8g} {x[i, 1]:.8g} {x[i, 2]:.8g}\n")


def read_lammpstrj(path: str):
    """Parse frames back (round-trip testing / analysis)."""
    frames = []
    with open(path) as f:
        lines = f.readlines()
    i = 0
    while i < len(lines):
        assert lines[i].startswith("ITEM: TIMESTEP")
        step = int(lines[i + 1])
        n = int(lines[i + 3])
        lo = np.zeros(3)
        hi = np.zeros(3)
        for ax in range(3):
            a, b = lines[i + 5 + ax].split()
            lo[ax], hi[ax] = float(a), float(b)
        cols = lines[i + 8].split()[2:]
        data = np.array(
            [[float(t) for t in lines[i + 9 + k].split()] for k in range(n)]
        )
        frames.append(dict(step=step, lo=lo, hi=hi, cols=cols, data=data))
        i += 9 + n
    return frames
