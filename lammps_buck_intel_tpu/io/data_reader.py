"""LAMMPS data-file reader/writer (atom styles: atomic, charge, full).

Host-LAMMPS ``read_data``/``write_data`` contract (SURVEY.md H8), exercised
by examples/data.aC (charge), examples/data.spce (full, with image flags and
Bonds/Angles sections), examples/equilibrated_data.hexane (full, unsorted ids,
Velocities section — a write_data product, i.e. the reference's checkpoint
format, SURVEY.md §5.4).
"""
from __future__ import annotations

import dataclasses

import numpy as np

_SECTION_NAMES = {
    "Masses",
    "Atoms",
    "Velocities",
    "Bonds",
    "Angles",
    "Dihedrals",
    "Impropers",
    "Pair Coeffs",
    "PairIJ Coeffs",
    "Bond Coeffs",
    "Angle Coeffs",
    "Dihedral Coeffs",
    "Improper Coeffs",
}

_HEADER_COUNTS = {
    "atoms": "n_atoms",
    "bonds": "n_bonds",
    "angles": "n_angles",
    "dihedrals": "n_dihedrals",
    "impropers": "n_impropers",
    "atom types": "n_atom_types",
    "bond types": "n_bond_types",
    "angle types": "n_angle_types",
    "dihedral types": "n_dihedral_types",
    "improper types": "n_improper_types",
}


@dataclasses.dataclass
class DataFile:
    """Parsed LAMMPS data file.  Atom rows are sorted by atom id; all ids and
    types are converted to 0-based."""

    n_atoms: int = 0
    n_atom_types: int = 0
    box_lo: np.ndarray = None
    box_hi: np.ndarray = None
    tilt: np.ndarray = None       # (3,) [xy, xz, yz] or None (orthogonal)
    x: np.ndarray = None          # (N,3) f64
    v: np.ndarray = None          # (N,3) f64 (zeros if no Velocities section)
    type: np.ndarray = None       # (N,) int32, 0-based
    q: np.ndarray = None          # (N,) f64
    molecule: np.ndarray = None   # (N,) int32, 0-based
    image: np.ndarray = None      # (N,3) int32
    mass: np.ndarray = None       # (ntypes,) f64
    bonds: np.ndarray = None      # (Nb,3) int32 [type,i,j] 0-based
    angles: np.ndarray = None     # (Na,4) int32 [type,i,j,k]
    dihedrals: np.ndarray = None  # (Nd,5)
    impropers: np.ndarray = None  # (Ni,5)
    bond_coeffs: dict = dataclasses.field(default_factory=dict)
    angle_coeffs: dict = dataclasses.field(default_factory=dict)
    dihedral_coeffs: dict = dataclasses.field(default_factory=dict)
    improper_coeffs: dict = dataclasses.field(default_factory=dict)
    pair_coeffs: dict = dataclasses.field(default_factory=dict)


def _strip(line: str) -> str:
    if "#" in line:
        line = line[: line.index("#")]
    return line.strip()


def _section_name(line: str) -> str | None:
    for name in _SECTION_NAMES:
        if line == name or line.startswith(name + " "):
            return name
    return None


def _scan_atom_style(raw_lines) -> str | None:
    """Resolve the atom style from the 'Atoms # style' tag or column count
    without parsing the sections."""
    for i, line in enumerate(raw_lines):
        stripped = _strip(line)
        if stripped and _section_name(stripped) == "Atoms":
            if "#" in line:
                tag = line.split("#")[1].strip()
                if tag in ("atomic", "charge", "full"):
                    return tag
            for j in range(i + 1, min(i + 10, len(raw_lines))):
                row = _strip(raw_lines[j])
                if row:
                    try:
                        return _guess_atom_style([row.split()])
                    except KeyError:
                        return None
    return None


def read_data(path: str, atom_style: str = "auto",
              native: bool = True) -> DataFile:
    """Parse a LAMMPS data file.  Large sections go through the native
    C++ parser (native/fastdata.cpp) when available; pure Python otherwise
    — both paths are equality-tested."""
    with open(path) as f:
        raw_lines = f.readlines()

    d = DataFile()
    counts = {v: 0 for v in _HEADER_COUNTS.values()}
    lo = np.zeros(3)
    hi = np.ones(3)

    # --- header: everything up to the first section keyword ---
    i = 1  # first line is a comment by format definition
    while i < len(raw_lines):
        line = _strip(raw_lines[i])
        if line and _section_name(line):
            break
        if line:
            toks = line.split()
            matched = False
            for key, attr in _HEADER_COUNTS.items():
                kt = key.split()
                if toks[len(toks) - len(kt):] == kt:
                    counts[attr] = int(toks[0])
                    matched = True
                    break
            if not matched:
                if toks[-2:] == ["xlo", "xhi"]:
                    lo[0], hi[0] = float(toks[0]), float(toks[1])
                elif toks[-2:] == ["ylo", "yhi"]:
                    lo[1], hi[1] = float(toks[0]), float(toks[1])
                elif toks[-2:] == ["zlo", "zhi"]:
                    lo[2], hi[2] = float(toks[0]), float(toks[1])
                elif toks[-3:] == ["xy", "xz", "yz"]:
                    d.tilt = np.array([float(toks[0]), float(toks[1]),
                                       float(toks[2])])
        i += 1

    for attr, val in counts.items():
        setattr(d, attr, val)
    d.box_lo, d.box_hi = lo, hi
    if d.n_atoms <= 0:
        raise ValueError(f"{path}: no 'N atoms' header line; not a LAMMPS data file?")

    n = d.n_atoms
    d.x = np.zeros((n, 3))
    d.v = np.zeros((n, 3))
    d.type = np.zeros(n, np.int32)
    d.q = np.zeros(n)
    d.molecule = np.zeros(n, np.int32)
    d.image = np.zeros((n, 3), np.int32)
    d.mass = np.ones(max(d.n_atom_types, 1))
    d.bonds = np.zeros((d.n_bonds, 3), np.int32)
    d.angles = np.zeros((d.n_angles, 4), np.int32)
    d.dihedrals = np.zeros((d.n_dihedrals, 5), np.int32)
    d.impropers = np.zeros((d.n_impropers, 5), np.int32)

    native_done = False
    if native:
        style = atom_style if atom_style != "auto" else \
            _scan_atom_style(raw_lines)
        if style in ("atomic", "charge", "full"):
            from . import fastdata

            native_done = fastdata.parse_sections(path, style, d)

    # --- sections (python path; with native_done only coeff sections) ---
    while i < len(raw_lines):
        header = _strip(raw_lines[i])
        name = _section_name(header)
        i += 1
        if name is None:
            continue
        # style hint in the section comment, e.g. "Atoms # full"
        comment = raw_lines[i - 1].split("#")[1].strip() if "#" in raw_lines[i - 1] else ""
        rows = []
        while i < len(raw_lines):
            line = _strip(raw_lines[i])
            if line and _section_name(line):
                break
            if line:
                rows.append(line.split())
            i += 1
        if native_done and name in ("Masses", "Atoms", "Velocities",
                                    "Bonds", "Angles", "Dihedrals",
                                    "Impropers"):
            continue
        if name == "Masses":
            for r in rows:
                d.mass[int(r[0]) - 1] = float(r[1])
        elif name == "Atoms":
            style = atom_style
            if style == "auto":
                style = comment if comment in ("atomic", "charge", "full") else None
            if style is None:
                style = _guess_atom_style(rows)
            _parse_atoms(d, rows, style)
        elif name == "Velocities":
            for r in rows:
                d.v[int(r[0]) - 1] = [float(r[1]), float(r[2]), float(r[3])]
        elif name in ("Bonds", "Angles", "Dihedrals", "Impropers"):
            arr = getattr(d, name.lower())
            for r in rows:
                idx = int(r[0]) - 1
                arr[idx, 0] = int(r[1]) - 1  # bonded type
                arr[idx, 1:] = [int(t) - 1 for t in r[2:2 + arr.shape[1] - 1]]
        elif name == "Bond Coeffs":
            for r in rows:
                d.bond_coeffs[int(r[0]) - 1] = [float(t) for t in r[1:]]
        elif name == "Angle Coeffs":
            for r in rows:
                d.angle_coeffs[int(r[0]) - 1] = [float(t) for t in r[1:]]
        elif name == "Dihedral Coeffs":
            for r in rows:
                d.dihedral_coeffs[int(r[0]) - 1] = [float(t) for t in r[1:]]
        elif name == "Improper Coeffs":
            for r in rows:
                d.improper_coeffs[int(r[0]) - 1] = [float(t) for t in r[1:]]
        elif name == "Pair Coeffs":
            for r in rows:
                d.pair_coeffs[int(r[0]) - 1] = [float(t) for t in r[1:]]
    return d


def _guess_atom_style(rows) -> str:
    """Column-count heuristic: atomic=5(+3), charge=6(+3), full=7(+3).

    Ambiguity (charge 6 cols vs atomic 5+3img... lengths differ: atomic=5 or 8,
    charge=6 or 9, full=7 or 10) is resolved by length; 8/9 collide with
    nothing; a bare 6-col row is charge; data files with molecules must carry
    the "# full" tag or pass atom_style explicitly.
    """
    ncol = len(rows[0])
    return {5: "atomic", 6: "charge", 7: "full", 8: "atomic", 9: "charge",
            10: "full"}[ncol]


def _parse_atoms(d: DataFile, rows, style: str):
    for r in rows:
        aid = int(r[0]) - 1
        if style == "atomic":
            d.type[aid] = int(r[1]) - 1
            vals = r[2:]
        elif style == "charge":
            d.type[aid] = int(r[1]) - 1
            d.q[aid] = float(r[2])
            vals = r[3:]
        elif style == "full":
            d.molecule[aid] = int(r[1]) - 1
            d.type[aid] = int(r[2]) - 1
            d.q[aid] = float(r[3])
            vals = r[4:]
        else:
            raise ValueError(f"unknown atom style {style!r}")
        d.x[aid] = [float(vals[0]), float(vals[1]), float(vals[2])]
        if len(vals) >= 6:
            d.image[aid] = [int(vals[3]), int(vals[4]), int(vals[5])]


def write_data(path: str, d_or_system, topology=None, atom_style: str = "full",
               comment: str = "written by lammps_buck_intel_tpu"):
    """LAMMPS write_data analog (checkpoint interop, SURVEY.md §5.4)."""
    import jax

    s = d_or_system
    x = np.asarray(jax.device_get(s.x), np.float64)
    v = np.asarray(jax.device_get(s.v), np.float64)
    q = np.asarray(jax.device_get(s.q), np.float64)
    typ = np.asarray(jax.device_get(s.type), np.int32)
    img = np.asarray(jax.device_get(s.image), np.int32)
    mol = np.asarray(jax.device_get(s.molecule), np.int32)
    mass = np.asarray(jax.device_get(s.mass), np.float64)
    lo = np.asarray(jax.device_get(s.box.lo), np.float64)
    hi = np.asarray(jax.device_get(s.box.hi), np.float64)
    n = x.shape[0]
    def _topo(name, cols):
        a = getattr(topology, name, None) if topology is not None else None
        return (np.asarray(a, np.int32) if a is not None and len(a)
                else np.zeros((0, cols), np.int32))

    bonds = _topo("bonds", 3)
    angles = _topo("angles", 4)
    dihedrals = _topo("dihedrals", 5)
    impropers = _topo("impropers", 5)

    with open(path, "w") as f:
        f.write(f"{comment}\n\n")
        f.write(f"{n} atoms\n")
        if len(bonds):
            f.write(f"{len(bonds)} bonds\n")
        if len(angles):
            f.write(f"{len(angles)} angles\n")
        if len(dihedrals):
            f.write(f"{len(dihedrals)} dihedrals\n")
        if len(impropers):
            f.write(f"{len(impropers)} impropers\n")
        f.write(f"{len(mass)} atom types\n")
        if len(bonds):
            f.write(f"{bonds[:, 0].max() + 1} bond types\n")
        if len(angles):
            f.write(f"{angles[:, 0].max() + 1} angle types\n")
        if len(dihedrals):
            f.write(f"{dihedrals[:, 0].max() + 1} dihedral types\n")
        if len(impropers):
            f.write(f"{impropers[:, 0].max() + 1} improper types\n")
        f.write(f"\n{lo[0]:.16e} {hi[0]:.16e} xlo xhi\n")
        f.write(f"{lo[1]:.16e} {hi[1]:.16e} ylo yhi\n")
        f.write(f"{lo[2]:.16e} {hi[2]:.16e} zlo zhi\n")
        tilt = getattr(s.box, "tilt", None)
        if tilt is not None and np.any(np.asarray(tilt) != 0.0):
            t = np.asarray(tilt, np.float64)
            f.write(f"{t[0]:.16e} {t[1]:.16e} {t[2]:.16e} xy xz yz\n")
        f.write("\nMasses\n\n")
        for t, m in enumerate(mass):
            f.write(f"{t + 1} {m:.10g}\n")
        f.write(f"\nAtoms # {atom_style}\n\n")
        f.flush()
        from . import fastdata

        if fastdata.write_data_body(path, atom_style, x, v, q, typ, mol,
                                    img):
            import os as _os

            f.seek(0, _os.SEEK_END)   # native appended; rejoin at the end
        else:
            for a in range(n):
                if atom_style == "atomic":
                    cols = f"{a + 1} {typ[a] + 1}"
                elif atom_style == "charge":
                    cols = f"{a + 1} {typ[a] + 1} {q[a]:.16e}"
                else:
                    cols = f"{a + 1} {mol[a] + 1} {typ[a] + 1} {q[a]:.16e}"
                f.write(
                    f"{cols} {x[a, 0]:.16e} {x[a, 1]:.16e} {x[a, 2]:.16e} "
                    f"{img[a, 0]} {img[a, 1]} {img[a, 2]}\n"
                )
            f.write("\nVelocities\n\n")
            for a in range(n):
                f.write(f"{a + 1} {v[a, 0]:.16e} {v[a, 1]:.16e} "
                        f"{v[a, 2]:.16e}\n")
        if len(bonds):
            f.write("\nBonds\n\n")
            for b, (bt, bi, bj) in enumerate(bonds):
                f.write(f"{b + 1} {bt + 1} {bi + 1} {bj + 1}\n")
        if len(angles):
            f.write("\nAngles\n\n")
            for b, (at, ai, aj, ak) in enumerate(angles):
                f.write(f"{b + 1} {at + 1} {ai + 1} {aj + 1} {ak + 1}\n")
        for name, arr in (("Dihedrals", dihedrals), ("Impropers", impropers)):
            if len(arr):
                f.write(f"\n{name}\n\n")
                for b, (t, ai, aj, ak, al) in enumerate(arr):
                    f.write(f"{b + 1} {t + 1} {ai + 1} {aj + 1} "
                            f"{ak + 1} {al + 1}\n")
