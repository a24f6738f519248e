"""Lattice / create_atoms / replicate — deck geometry generation.

Covers the host-LAMMPS commands the buck decks use (SURVEY.md H8):
``lattice fcc <rho>``, ``region block``, ``create_atoms`` (examples/in.buck:14-17)
and ``replicate nx ny nz`` (examples/in.buck_coul_cut:4).
All host-side numpy — geometry generation never runs on device.
"""
from __future__ import annotations

import numpy as np

# Basis sites in lattice-cell fractional coordinates.
_BASES = {
    "sc": np.array([[0.0, 0.0, 0.0]]),
    "bcc": np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5]]),
    "fcc": np.array(
        [[0.0, 0.0, 0.0], [0.5, 0.5, 0.0], [0.5, 0.0, 0.5], [0.0, 0.5, 0.5]]
    ),
}


def lattice_constant(style: str, reduced_density: float) -> float:
    """LAMMPS ``lattice <style> <rho>`` in lj units: a = (nbasis/rho)^(1/3)."""
    nbasis = len(_BASES[style])
    return (nbasis / reduced_density) ** (1.0 / 3.0)


def create_atoms(
    style: str,
    reduced_density: float,
    nx: int,
    ny: int,
    nz: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fill a block region of nx*ny*nz lattice cells with atoms.

    Reproduces ``lattice fcc rho; region box block 0 nx 0 ny 0 nz;
    create_atoms 1 box`` (examples/in.buck:14-17): returns (positions,
    box_lo, box_hi) in simulation units with atoms ordered x-fastest the way
    LAMMPS' lattice filling does (order only matters for velocity seeding
    parity, which we do not reproduce bit-for-bit).
    """
    a = lattice_constant(style, reduced_density)
    basis = _BASES[style]
    ii, jj, kk = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    cells = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3)  # (ncell, 3)
    pos = (cells[:, None, :] + basis[None, :, :]).reshape(-1, 3) * a
    lo = np.zeros(3)
    hi = np.array([nx, ny, nz], dtype=float) * a
    return pos.astype(np.float64), lo, hi


def replicate(
    x: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    nrep: tuple[int, int, int],
    per_atom: dict[str, np.ndarray] | None = None,
    bonds: np.ndarray | None = None,
    angles: np.ndarray | None = None,
    dihedrals: np.ndarray | None = None,
    impropers: np.ndarray | None = None,
    molecule: np.ndarray | None = None,
    tilt: np.ndarray | None = None,
):
    """LAMMPS ``replicate nx ny nz``: tile the box, remapping topology.

    per_atom: dict of (N,...) arrays tiled along atoms (type, q, v, image...).
    Bonded index lists are offset per replica; molecule ids are offset so
    replicas stay distinct molecules.
    tilt: optional (xy, xz, yz) triclinic factors.  Replicas shift by the
    box VECTORS A=(Lx,0,0), B=(xy,Ly,0), C=(xz,yz,Lz) and the returned
    tilts scale the LAMMPS way (replicate.cpp): xy*ny, xz*nz, yz*nz.
    Returns (x, lo, hi, per_atom, bonds, angles, dihedrals, impropers,
    molecule) — plus the new tilt as a 10th element when tilt was given.
    """
    nx, ny, nz = nrep
    n = x.shape[0]
    L = hi - lo
    xy, xz, yz = (0.0, 0.0, 0.0) if tilt is None else np.asarray(
        tilt, np.float64)
    # Row-stacked box vectors: shift(ix,iy,iz) = ix*A + iy*B + iz*C.
    hmat = np.array([[L[0], 0.0, 0.0],
                     [xy, L[1], 0.0],
                     [xz, yz, L[2]]])
    # Unwrap by image flags BEFORE tiling: a molecule straddling an
    # original periodic boundary is only bonded through that boundary —
    # in the enlarged box the wrapped copies would sit a full original
    # box-length apart (35 A "bonds" in replicated SPC/E).  The engines
    # re-wrap (and recompute images) at init.
    per_atom = dict(per_atom) if per_atom else {}
    img = per_atom.get("image")
    if img is not None:
        x = x + np.asarray(img, np.float64) @ hmat
        per_atom["image"] = np.zeros_like(np.asarray(img))
    shifts = []
    for iz in range(nz):
        for iy in range(ny):
            for ix in range(nx):
                shifts.append([ix, iy, iz])
    shifts = np.asarray(shifts, dtype=np.float64) @ hmat
    nrep_total = len(shifts)

    x_new = (x[None, :, :] + shifts[:, None, :]).reshape(-1, 3)
    hi_new = lo + L * np.array([nx, ny, nz])
    per_atom_new = {}
    if per_atom:
        for k, v in per_atom.items():
            per_atom_new[k] = np.concatenate([v] * nrep_total, axis=0)

    def _rep_topo(t):
        if t is None or len(t) == 0:
            return t
        t = np.asarray(t)
        out = []
        for r in range(nrep_total):
            tt = t.copy()
            tt[:, 1:] += r * n
            out.append(tt)
        return np.concatenate(out, axis=0)

    if molecule is not None and len(molecule):
        nmol = int(molecule.max()) + 1
        molecule = np.concatenate(
            [molecule + r * nmol for r in range(nrep_total)]
        )

    out = (
        x_new,
        lo,
        hi_new,
        per_atom_new,
        _rep_topo(bonds),
        _rep_topo(angles),
        _rep_topo(dihedrals),
        _rep_topo(impropers),
        molecule,
    )
    if tilt is None:
        return out
    tilt_new = np.array([xy * ny, xz * nz, yz * nz])
    return out + (tilt_new,)
