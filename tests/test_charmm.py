"""CHARMM force-field family: angle charmm (Urey-Bradley), dihedral
charmm (+1-4 pair terms), improper harmonic, lj/charmm/coul/long pair.

Oracle strategy (SURVEY.md §4): forces are checked against f64
finite differences of the energy; the dihedral angle itself against an
independent numpy acos/sign construction; the lj/charmm switch against a
literal transcription of the pair_lj_charmm_coul_long.cpp formulas.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_buck_intel_tpu.core import make_box
from lammps_buck_intel_tpu.models.bonded import (
    make_bonded, compute_bonded, bake_charmm_14,
)
from lammps_buck_intel_tpu.models.pair import build_lj_charmm


L = np.array([20.0, 20.0, 20.0])
BOX = make_box(np.zeros(3), L)


def _fd_forces(efn, x, eps=1e-6):
    f = np.zeros_like(x)
    for i in range(x.shape[0]):
        for a in range(3):
            xp = x.copy(); xp[i, a] += eps
            xm = x.copy(); xm[i, a] -= eps
            f[i, a] = -(efn(xp) - efn(xm)) / (2 * eps)
    return f


def _dihedral_angle_np(x, quad):
    i, j, k, l = quad
    b1 = x[i] - x[j]
    b2 = x[k] - x[j]
    b3 = x[l] - x[k]
    n1 = np.cross(b1, b2)
    n2 = np.cross(b2, b3)
    cosv = np.dot(n1, n2)
    sinv = np.dot(np.cross(n1, n2), b2) / np.linalg.norm(b2)
    return np.arctan2(sinv, cosv)


def test_dihedral_charmm_energy_and_forces():
    rng = np.random.default_rng(7)
    x = np.array([[0.0, 0, 0], [1.5, 0, 0], [2.2, 1.3, 0],
                  [3.5, 1.5, 1.1]]) + rng.normal(0, 0.05, (4, 3)) + 5.0
    for n_mult, d_deg in ((1, 0.0), (2, 180.0), (3, 0.0)):
        K = 1.7
        style = make_bonded(
            dihedrals=[[0, 0, 1, 2, 3]],
            dihedral_coeffs=[[K, n_mult, d_deg, 0.0]],
        )

        def efn(xx):
            r = compute_bonded(style, jnp.asarray(xx), BOX,
                               acc_dtype=jnp.float64)
            return float(r.edihed)

        phi = _dihedral_angle_np(x, (0, 1, 2, 3))
        e_ref = K * (1.0 + np.cos(n_mult * phi - np.deg2rad(d_deg)))
        assert abs(efn(x) - e_ref) < 1e-9, (n_mult, d_deg)
        r = compute_bonded(style, jnp.asarray(x), BOX,
                           acc_dtype=jnp.float64)
        f_fd = _fd_forces(efn, x)
        assert np.max(np.abs(np.asarray(r.f) - f_fd)) < 1e-5


def test_dihedral_14_terms():
    x = np.array([[0.0, 0, 0], [1.5, 0, 0], [2.2, 1.3, 0],
                  [3.5, 1.5, 1.1]]) + 5.0
    w = 0.5
    eps14 = np.array([0.2])
    sig14 = np.array([1.1])
    typ = np.zeros(4, np.int32)
    q = np.array([0.3, -0.1, -0.1, -0.1])
    dihedrals = np.array([[0, 0, 1, 2, 3]], np.int32)
    dc = np.array([[1.0, 2, 180.0, w]])
    d14 = bake_charmm_14(dihedrals, dc, typ, q, eps14, sig14, qqrd2e=332.0)
    style = make_bonded(dihedrals=dihedrals, dihedral_coeffs=dc, d14=d14)
    r = compute_bonded(style, jnp.asarray(x), BOX, acc_dtype=jnp.float64)
    r14 = np.linalg.norm(x[0] - x[3])
    s6 = (sig14[0] / r14) ** 6
    e_lj = w * 4.0 * eps14[0] * (s6 * s6 - s6)
    e_c = w * 332.0 * q[0] * q[3] / r14
    assert abs(float(r.e14_lj) - e_lj) < 1e-9
    assert abs(float(r.e14_coul) - e_c) < 1e-9

    def efn(xx):
        rr = compute_bonded(style, jnp.asarray(xx), BOX,
                            acc_dtype=jnp.float64)
        return float(rr.edihed + rr.e14_lj + rr.e14_coul)

    f_fd = _fd_forces(efn, x)
    assert np.max(np.abs(np.asarray(r.f) - f_fd)) < 2e-5


def test_improper_harmonic():
    rng = np.random.default_rng(3)
    x = np.array([[0.0, 0, 0], [1.4, 0, 0], [2.0, 1.2, 0.3],
                  [3.1, 1.0, 1.4]]) + rng.normal(0, 0.08, (4, 3)) + 5.0
    K, chi0 = 2.3, 10.0
    style = make_bonded(impropers=[[0, 0, 1, 2, 3]],
                        improper_coeffs=[[K, chi0]])

    def efn(xx):
        r = compute_bonded(style, jnp.asarray(xx), BOX,
                           acc_dtype=jnp.float64)
        return float(r.eimp)

    # independent chi: angle between the two plane normals
    n1 = np.cross(x[0] - x[1], x[2] - x[1])
    n2 = np.cross(x[2] - x[1], x[3] - x[2])
    chi = np.arccos(np.dot(n1, n2) / np.linalg.norm(n1) / np.linalg.norm(n2))
    e_ref = K * (chi - np.deg2rad(chi0)) ** 2
    assert abs(efn(x) - e_ref) < 1e-7
    r = compute_bonded(style, jnp.asarray(x), BOX, acc_dtype=jnp.float64)
    f_fd = _fd_forces(efn, x)
    assert np.max(np.abs(np.asarray(r.f) - f_fd)) < 1e-5


def test_angle_charmm_urey_bradley():
    x = np.array([[0.0, 0, 0], [1.2, 0.5, 0], [2.2, 0, 0.4]]) + 5.0
    K, th0, kub, rub = 3.0, 104.5, 1.2, 1.9
    style = make_bonded(angles=[[0, 0, 1, 2]],
                        angle_coeffs=[[K, th0, kub, rub]],
                        angle_style="charmm")

    def efn(xx):
        r = compute_bonded(style, jnp.asarray(xx), BOX,
                           acc_dtype=jnp.float64)
        return float(r.eangle)

    d1 = x[0] - x[1]
    d2 = x[2] - x[1]
    th = np.arccos(np.dot(d1, d2) / np.linalg.norm(d1) / np.linalg.norm(d2))
    r13 = np.linalg.norm(x[0] - x[2])
    e_ref = K * (th - np.deg2rad(th0)) ** 2 + kub * (r13 - rub) ** 2
    assert abs(efn(x) - e_ref) < 1e-7
    r = compute_bonded(style, jnp.asarray(x), BOX, acc_dtype=jnp.float64)
    f_fd = _fd_forces(efn, x)
    assert np.max(np.abs(np.asarray(r.f) - f_fd)) < 1e-5


def test_lj_charmm_switch_matches_reference_formula():
    """Literal transcription of pair_lj_charmm_coul_long.cpp:116-128."""
    from lammps_buck_intel_tpu.models.pair.styles import pair_terms

    eps, sig = 0.3, 1.2
    inner, outer = 3.0, 4.0
    style = build_lj_charmm(1, {0: (eps, sig)}, inner=inner, cut_lj=outer,
                            coul="none")
    rs = np.linspace(1.05, 4.2, 200)
    rsq = jnp.asarray(rs * rs)
    coef = {n: float(np.asarray(style.tables).reshape(1, -1)[0, i])
            for i, n in enumerate(
                ("c0", "c1", "e0", "e1", "rhoinv", "cut_ljsq", "offset",
                 "cut_coulsq"))}
    fs, ev, ec = pair_terms(style, rsq, coef, 0.0, 0.0, 1.0, 1.0,
                            eflag=True)
    # reference formulas
    lj1, lj2 = 48 * eps * sig**12, 24 * eps * sig**6
    lj3, lj4 = 4 * eps * sig**12, 4 * eps * sig**6
    cut_ljsq, innersq = outer**2, inner**2
    denom = (cut_ljsq - innersq) ** 3
    r2 = rs * rs
    r6inv = r2 ** -3
    forcelj = r6inv * (lj1 * r6inv - lj2)
    philj = r6inv * (lj3 * r6inv - lj4)
    sw = r2 > innersq
    t = cut_ljsq - r2
    s1 = t * t * (cut_ljsq + 2 * r2 - 3 * innersq) / denom
    s2 = 12 * r2 * t * (r2 - innersq) / denom
    f_ref = np.where(sw, forcelj * s1 + philj * s2, forcelj)
    e_ref = np.where(sw, philj * s1, philj)
    mask = r2 < cut_ljsq
    f_ref = np.where(mask, f_ref / r2, 0.0)
    e_ref = np.where(mask, e_ref, 0.0)
    assert np.max(np.abs(np.asarray(fs) - f_ref)) < 1e-10
    assert np.max(np.abs(np.asarray(ev) - e_ref)) < 1e-10
    # continuity at the outer cutoff: energy and force go to zero
    phi_at_cut = float(np.interp(outer - 1e-4, rs,
                                 np.asarray(ev)))
    assert abs(phi_at_cut) < 1e-6


def _butane_box():
    """8 butane-like chains (4 sites, bonds/angles/dihedrals) in a box —
    a miniature of the in.rhodo deck's force-field stack."""
    rng = np.random.default_rng(11)
    chains = []
    base = np.array([[0.0, 0, 0], [1.53, 0, 0], [2.3, 1.3, 0],
                     [3.8, 1.35, 0.2]])
    for cx in range(2):
        for cy in range(2):
            for cz in range(2):
                off = np.array([cx, cy, cz]) * 9.0 + 2.0
                chains.append(base + off + rng.normal(0, 0.03, (4, 3)))
    x = np.concatenate(chains)
    nb = []
    na = []
    nd = []
    mol = []
    for m in range(8):
        o = 4 * m
        nb += [[0, o, o + 1], [0, o + 1, o + 2], [0, o + 2, o + 3]]
        na += [[0, o, o + 1, o + 2], [0, o + 1, o + 2, o + 3]]
        nd += [[0, o, o + 1, o + 2, o + 3]]
        mol += [m] * 4
    q = np.tile([0.1, -0.1, -0.1, 0.1], 8)
    typ = np.zeros(32, np.int32)
    return (x, np.asarray(nb, np.int32), np.asarray(na, np.int32),
            np.asarray(nd, np.int32), q, typ, np.asarray(mol, np.int32))


def test_charmm_deck_end_to_end_nve():
    """Full stack through the deck runner: lj/charmm/coul/long +
    harmonic bonds + charmm angles (UB) + charmm dihedrals (weighted 1-4)
    + special_bonds charmm, NVE energy conservation."""
    from lammps_buck_intel_tpu.run import build_simulation
    import tempfile, os

    x, nb, na, nd, q, typ, mol = _butane_box()
    box_lo = np.zeros(3)
    box_hi = np.array([18.0, 18.0, 18.0])
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "data.butane")
        n = len(x)
        with open(path, "w") as f:
            f.write("butane-like charmm test box\n\n")
            f.write(f"{n} atoms\n{len(nb)} bonds\n{len(na)} angles\n"
                    f"{len(nd)} dihedrals\n1 atom types\n1 bond types\n"
                    f"1 angle types\n1 dihedral types\n\n")
            f.write(f"0.0 {box_hi[0]} xlo xhi\n0.0 {box_hi[1]} ylo yhi\n"
                    f"0.0 {box_hi[2]} zlo zhi\n\nMasses\n\n1 14.0\n\n")
            f.write("Atoms # full\n\n")
            for a in range(n):
                f.write(f"{a+1} {mol[a]+1} 1 {q[a]} "
                        f"{x[a,0]} {x[a,1]} {x[a,2]}\n")
            f.write("\nBonds\n\n")
            for b, (t, i, j) in enumerate(nb):
                f.write(f"{b+1} {t+1} {i+1} {j+1}\n")
            f.write("\nAngles\n\n")
            for b, (t, i, j, k) in enumerate(na):
                f.write(f"{b+1} {t+1} {i+1} {j+1} {k+1}\n")
            f.write("\nDihedrals\n\n")
            for b, (t, i, j, k, l) in enumerate(nd):
                f.write(f"{b+1} {t+1} {i+1} {j+1} {k+1} {l+1}\n")
        cfg = {
            "units": "real",
            "precision": "double",
            "engine": "nlist",
            "read_data": path,
            "pair_style": {
                "name": "lj/charmm/coul/long",
                "inner": 5.0, "cut": 6.0, "cut_coul": 6.0,
                "coeffs": {"1 1": [0.08, 3.6, 0.04, 3.4]},
            },
            "kspace_style": {"name": "ewald", "accuracy": 1e-4},
            "special_bonds": "charmm",
            "bond_style": {"name": "harmonic", "coeffs": [[300.0, 1.53]]},
            "angle_style": {"name": "charmm",
                            "coeffs": [[40.0, 112.0, 5.0, 2.5]]},
            "dihedral_style": {"name": "charmm",
                               "coeffs": [[1.2, 3, 0.0, 0.5]]},
            "velocity": {"temp": 50.0, "seed": 4321},
            "neighbor": {"skin": 2.0, "every": 2, "check": False},
            "fixes": [{"name": "nve"}],
            "timestep": 0.5,
            "run": 0,
        }
        sim = build_simulation(cfg)
        rows = sim.run(40, thermo_every=10, log=False)
    e0 = rows[0]["etotal"]
    for r in rows:
        assert np.isfinite(r["etotal"])
        assert abs(r["etotal"] - e0) < 0.02 * max(abs(e0), 1.0), rows
    # dihedral + 1-4 energies actually present
    assert abs(rows[0]["emol"]) > 1e-3


def test_rhodo_class_deck():
    """The in.rhodo-class capability deck: lj/charmm/coul/long + PPPM on
    the cell-pair engine, charmm angles/dihedrals/impropers from the data
    file, special_bonds charmm, fix shake m 1.0 (mass list), NVT."""
    import yaml
    from lammps_buck_intel_tpu.run import run_deck
    from lammps_buck_intel_tpu.integrate import CellPairSimulation

    with open("examples/decks/rhodo_class.yaml") as f:
        cfg = yaml.safe_load(f)
    cfg["run"] = 20
    cfg["thermo"] = 10
    sim, rows = run_deck(cfg, log=False)
    assert isinstance(sim, CellPairSimulation)
    # topology actually loaded (the native-parser fallback regression)
    b = sim.bonded
    assert len(b.dihedrals) == 432 and len(b.impropers) == 216
    assert np.ptp(b.dihedrals[:, 0]) == 1      # two dihedral types
    assert b.d14[:, 2].max() > 0               # baked 1-4 terms present
    for r in rows:
        assert np.isfinite(r["etotal"]) and r["temp"] < 2000.0
