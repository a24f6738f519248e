"""Slab engine with molecular terms: bonded forces, special bonds,
SHAKE/RATTLE and NVT vs the single-device cell-pair engine.

This is the in.spce-class capability (SURVEY.md H3/H7): the full
deck-visible fix set riding the slab ghost exchange on the 8-virtual-
device CPU mesh.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lammps_buck_intel_tpu.core import (
    make_box, make_system, get_units, get_precision, build_topology,
)
from lammps_buck_intel_tpu.io import velocity
from lammps_buck_intel_tpu.models.pair import build_lj
from lammps_buck_intel_tpu.models.kspace import setup_pppm, CellPPPM, \
    SlabCellPPPM
from lammps_buck_intel_tpu.models.bonded import make_bonded
from lammps_buck_intel_tpu.integrate import CellPairSimulation, \
    NeighborPolicy, NVTConfig
from lammps_buck_intel_tpu.integrate.shake import make_shake
from lammps_buck_intel_tpu.parallel import SlabCellPairSimulation, slab_mesh

SPECIAL = (1.0, 0.0, 0.0, 0.5)
BOND_COEFFS = [[500.0, 1.0]]
ANGLE_COEFFS = [[50.0, 109.47]]


def _water_box(nmx=6, nmy=5, nmz=5, spacing=8.0):
    # box 48 x 40 x 40, cutneigh 10.8 -> nc = (4, 3, 3): ncx divides both
    # 2 and 4 devices, so the slab and single-chip engines share the cell
    # grid (and hence the PPPM mesh)
    """nm* water molecules on a grid (real units); box >= 3 cells/axis."""
    u = get_units("real")
    rng = np.random.RandomState(12345)
    xs, bonds, angles = [], [], []
    mol = []
    i = 0
    for ax in range(nmx):
        for ay in range(nmy):
            for az in range(nmz):
                c = (np.array([ax, ay, az]) + 0.5) * spacing
                c = c + rng.uniform(-0.8, 0.8, 3)
                # O at c; two H at the SPC/E geometry (1.0 A, 109.47 deg)
                xs.append(c)
                xs.append(c + [0.96, 0.0, 0.26])
                xs.append(c + [-0.55, 0.0, 0.83])
                bonds.append([0, i, i + 1])
                bonds.append([0, i, i + 2])
                angles.append([0, i + 1, i, i + 2])
                mol.extend([len(mol) // 3] * 3)
                i += 3
    n = i
    x = np.asarray(xs)
    lo = np.zeros(3)
    hi = np.array([nmx, nmy, nmz], np.float64) * spacing
    typ = np.tile([0, 1, 1], n // 3).astype(np.int32)
    q = np.tile([-0.8472, 0.4236, 0.4236], n // 3)
    mass = np.array([15.9994, 1.008])
    mass_per_atom = mass[typ]
    v0 = velocity.create(n, 300.0, 87287, mass_per_atom, u)
    box = make_box(lo, hi, dtype=jnp.float64)
    system = make_system(x, box, type=typ, v=v0, q=q, mass=mass,
                         molecule=np.asarray(mol, np.int32),
                         dtype=jnp.float64)
    topo = build_topology(n, bonds=bonds, angles=angles)
    return u, box, system, q, np.asarray(bonds, np.int32), \
        np.asarray(angles, np.int32), topo, mass_per_atom


def _style(u):
    return build_lj(
        2, {(0, 0): (0.15535, 3.166), (0, 1): (0.0, 1.0),
            (1, 1): (0.0, 1.0)},
        cut_global=6.8, coul="long", cut_coul=8.8,
        special_lj=SPECIAL, special_coul=SPECIAL,
        qqrd2e=u.qqrd2e, name="lj/cut/coul/long", dtype=jnp.float64,
    )


def _common(u, shake=None, flexible=True):
    prec = get_precision("double")
    bonded = None
    if flexible:
        bonded = make_bonded(bonds=None, angles=None,
                             bond_coeffs=BOND_COEFFS,
                             angle_coeffs=ANGLE_COEFFS)
    return prec, bonded


def _pppm_grid(nc, n_dev):
    # mesh multiple of the cell grid with >= 5-point patches; ny tiles D
    gx = nc[0] * 6
    gy = int(np.lcm(nc[1] * 6, n_dev))
    gz = nc[2] * 6
    return (gx, gy, gz)


def _build_pair(u, box, q, style, prec, grid, kgrid):
    pm = setup_pppm(box, q, cutoff=8.8, accuracy_rel=1e-4,
                    qqrd2e=u.qqrd2e, order=5, grid=kgrid,
                    acc_dtype=prec.acc)
    return pm


@pytest.mark.parametrize("n_dev", [
    2,
    pytest.param(4, marks=pytest.mark.skipif(
        not os.environ.get("RUN_SLOW"),
        reason="wider-mesh variant of the same wiring: RUN_SLOW=1")),
])
def test_slab_flexible_water_matches_single(n_dev):
    """Bonded (bonds+angles) + specials + PPPM + NVE across slabs."""
    u, box, system, q, bonds, angles, topo, mpa = _water_box()
    style = _style(u)
    prec = get_precision("double")
    bonded = make_bonded(bonds=bonds, angles=angles,
                         bond_coeffs=BOND_COEFFS,
                         angle_coeffs=ANGLE_COEFFS)
    nbr = NeighborPolicy(skin=2.0, every=5, check=False)

    simA = CellPairSimulation(
        system, style, topology=topo, units=u, precision=prec, dt=0.2,
        neighbor=nbr, bonded=bonded)
    kgrid = _pppm_grid(simA.grid.nc, n_dev)
    pmA = _build_pair(u, box, q, style, prec, simA.grid, kgrid)
    simA.pair = simA.pair.replace(g_ewald=pmA.g_ewald)
    simA.kspace = CellPPPM(pmA, simA.grid)
    simA.state = simA._init_force_fn()(simA.state)

    def ks(sim):
        pm = _build_pair(u, box, q, style, prec, sim.grid, kgrid)
        sim.pair = sim.pair.replace(g_ewald=pm.g_ewald)
        return SlabCellPPPM(pm, sim.grid, n_dev)

    simB = SlabCellPairSimulation(
        system, style, mesh=slab_mesh(n_dev), units=u, precision=prec,
        dt=0.2, neighbor=nbr, topology=topo, bonded=bonded,
        kspace_setup=ks)
    assert simB.grid.nc == simA.grid.nc

    rowsA = simA.run(20, thermo_every=10, log=False)
    rowsB = simB.run(20, thermo_every=10, log=False)
    for ra, rb in zip(rowsA, rowsB):
        for key in ("temp", "evdwl", "ecoul", "elong", "emol", "etotal"):
            assert abs(ra[key] - rb[key]) <= 1e-8 * (abs(ra[key]) + 1e-10), (
                key, ra[key], rb[key])
        assert abs(ra["press"] - rb["press"]) < 1e-7 * abs(ra["press"])

    xa = simA.get_atoms()["x"]
    xb = simB.get_atoms()["x"]
    np.testing.assert_allclose(xb, xa, rtol=0, atol=1e-9)


def test_slab_shake_water_matches_single():
    """SHAKE-rigid water + NVT + PPPM: the literal in.spce fix set."""
    n_dev = 4
    u, box, system, q, bonds, angles, topo, mpa = _water_box()
    style = _style(u)
    prec = get_precision("double")
    sc = make_shake(bonds, np.asarray(BOND_COEFFS), angles,
                    np.asarray(ANGLE_COEFFS), mpa,
                    bond_types=(0,), angle_types=(0,), iters=20)
    therm = NVTConfig(t_start=300.0, t_stop=300.0, t_damp=100.0)
    nbr = NeighborPolicy(skin=2.0, every=5, check=False)

    simA = CellPairSimulation(
        system, style, topology=topo, units=u, precision=prec, dt=2.0,
        neighbor=nbr, shake=sc, thermostat=therm)
    kgrid = _pppm_grid(simA.grid.nc, n_dev)
    pmA = _build_pair(u, box, q, style, prec, simA.grid, kgrid)
    simA.pair = simA.pair.replace(g_ewald=pmA.g_ewald)
    simA.kspace = CellPPPM(pmA, simA.grid)
    simA.state = simA._init_force_fn()(simA.state)

    def ks(sim):
        pm = _build_pair(u, box, q, style, prec, sim.grid, kgrid)
        sim.pair = sim.pair.replace(g_ewald=pm.g_ewald)
        return SlabCellPPPM(pm, sim.grid, n_dev)

    simB = SlabCellPairSimulation(
        system, style, mesh=slab_mesh(n_dev), units=u, precision=prec,
        dt=2.0, neighbor=nbr, topology=topo, shake=sc, thermostat=therm,
        kspace_setup=ks)

    rowsA = simA.run(20, thermo_every=10, log=False)
    rowsB = simB.run(20, thermo_every=10, log=False)
    for ra, rb in zip(rowsA, rowsB):
        for key in ("temp", "evdwl", "ecoul", "elong", "etotal"):
            assert abs(ra[key] - rb[key]) <= 1e-7 * (abs(ra[key]) + 1e-10), (
                key, ra[key], rb[key])

    # constraint manifold holds on the sharded engine
    from lammps_buck_intel_tpu.integrate.shake import max_violation
    atoms = simB.get_atoms()
    viol = float(max_violation(
        sc, jnp.asarray(atoms["x"]), np.asarray(box.lengths, np.float64)))
    # 20 Jacobi iterations converge to ~the deck tolerance (in.spce: 1e-4)
    assert viol < 2e-4

    # every atom survived migration
    st = jax.device_get(simB.state)
    aid = np.asarray(st.aid)
    present = np.sort(aid[aid < simB.n_atoms])
    np.testing.assert_array_equal(present, np.arange(simB.n_atoms))


def test_engine_slab_deck(tmp_path):
    """`engine: slab` + `devices: N` through the deck runner: the user
    path to the multi-chip engine (VERDICT r2 item 2) on an spce-class
    deck (SHAKE + NVT + PPPM + special bonds)."""
    from lammps_buck_intel_tpu.io.data_reader import write_data
    from lammps_buck_intel_tpu.run import run_deck

    u, box, system, q, bonds, angles, topo, mpa = _water_box()
    path = str(tmp_path / "data.water")
    write_data(path, system, topology=topo)
    cfg = {
        "units": "real",
        "precision": "double",
        "read_data": path,
        "velocity": {"temp": 300.0, "seed": 87287},
        "pair_style": {
            "name": "lj/cut/coul/long", "cut": 6.8, "cut_coul": 8.8,
            "coeffs": {"1 1": [0.15535, 3.166], "1 2": [0.0, 1.0],
                       "2 2": [0.0, 1.0]},
        },
        "kspace_style": {"name": "pppm", "accuracy": 1.0e-4},
        "special_bonds": [0.0, 0.0, 0.5],
        "bond_style": {"name": "harmonic", "coeffs": [list(BOND_COEFFS[0])]},
        "angle_style": {"name": "harmonic",
                        "coeffs": [list(ANGLE_COEFFS[0])]},
        "neighbor": {"skin": 2.0, "every": 5, "check": False},
        "fixes": [
            {"name": "shake", "b": [1], "a": [1], "iters": 20},
            {"name": "nvt", "t_start": 300.0, "t_stop": 300.0,
             "t_damp": 100.0},
        ],
        "timestep": 2.0,
        "thermo": 10,
        "run": 10,
    }
    import copy

    cfgA = copy.deepcopy(cfg)
    cfgA["engine"] = "cellpair"
    simA, rowsA = run_deck(cfgA, log=False)

    cfgB = copy.deepcopy(cfg)
    cfgB["engine"] = "slab"
    cfgB["devices"] = 4
    simB, rowsB = run_deck(cfgB, log=False)
    from lammps_buck_intel_tpu.parallel import SlabCellPairSimulation

    assert isinstance(simB, SlabCellPairSimulation)
    assert simB.D == 4

    # the two engines may size their PPPM meshes differently (ny must
    # tile the device axis) -> parity at the solver-accuracy level
    for ra, rb in zip(rowsA, rowsB):
        assert abs(ra["temp"] - rb["temp"]) < 2.0, (ra["temp"], rb["temp"])
        assert abs(ra["etotal"] - rb["etotal"]) < \
            1e-3 * abs(ra["etotal"]) + 1.0
        assert abs(ra["elong"] - rb["elong"]) < 1e-2 * abs(ra["elong"])
    assert rowsB[-1]["step"] == 10


def test_slab_rigid_matches_single():
    """fix rigid/small on the slab mesh: replicated body state driven by
    psum'd per-body force/torque partials vs the single-device cell-pair
    rigid engine.  Bodies straddling slab boundaries need no ghost
    machinery — the partial sums ARE the decomposition."""
    from lammps_buck_intel_tpu.core import double
    from lammps_buck_intel_tpu.integrate import make_rigid_bodies
    from lammps_buck_intel_tpu.models.pair import build_buck

    n_dev = 8
    u = get_units("lj")
    base = np.array([[0.0, 0, 0], [1.0, 0, 0], [0, 1.2, 0]])
    rng = np.random.default_rng(23)
    xs, mols = [], []
    m = 0
    for i in range(8):
        for j in range(3):
            for k in range(3):
                org = np.array([2.0 + 4.0 * i, 2.0 + 4.0 * j,
                                2.0 + 4.0 * k])
                xs.append(base + org + rng.uniform(-0.05, 0.05, 3))
                mols += [m] * 3
                m += 1
    x = np.concatenate(xs)
    mol = np.asarray(mols, np.int32)
    typ = np.tile(np.array([0, 1, 1], np.int32), m)
    q = np.tile(np.array([-0.8, 0.4, 0.4]), m)
    mass = np.array([16.0, 1.0])
    box = make_box([0] * 3, [32.0, 12.0, 12.0], dtype=jnp.float64)
    v0 = rng.normal(scale=0.05, size=(3 * m, 3))
    rb = make_rigid_bodies(x, mol, mass[typ], box.lengths)
    style = build_buck(
        2, {(0, 0): (2000.0, 0.3, 1.0), (0, 1): (1500.0, 0.3, 0.5),
            (1, 1): (1000.0, 0.3, 0.2)},
        cut_global=3.0, coul="cut", dtype=jnp.float64, qqrd2e=1.0,
    )
    system = make_system(x, box, type=typ, v=v0, q=q, molecule=mol,
                         mass=mass, dtype=jnp.float64)
    kw = dict(units=u, precision=double(), dt=0.002,
              thermostat=NVTConfig(t_start=0.3, t_stop=0.3, t_damp=0.2),
              neighbor=NeighborPolicy(skin=0.5, every=5, delay=0,
                                      check=False))
    simA = CellPairSimulation(system, style, rigid=rb, **kw)
    simB = SlabCellPairSimulation(system, style, rigid=rb,
                                  mesh=slab_mesh(n_dev), **kw)
    assert simB.D == n_dev

    rowsA = simA.run(20, thermo_every=10, log=False)
    rowsB = simB.run(20, thermo_every=10, log=False)
    for ra, rb_ in zip(rowsA, rowsB):
        for key in ("temp", "evdwl", "ecoul", "etotal", "press"):
            assert abs(ra[key] - rb_[key]) <= 1e-8 * (abs(ra[key]) + 1.0), (
                key, ra[key], rb_[key])

    xa = simA.get_atoms()["x"]
    xb = simB.get_atoms()["x"]
    # both derive positions from body state; images may differ by a box
    # period for boundary molecules -> compare modulo L
    L = np.asarray(box.lengths)
    dd = xb - xa
    dd -= np.round(dd / L) * L
    np.testing.assert_allclose(dd, 0.0, atol=1e-8)


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="full-depth slab disp parity (test_slab_disp gates the wiring): RUN_SLOW=1")
def test_slab_hexane_disp_matches_single():
    """The literal in.hexane deck (fix rigid/small + dispersion PPPM) on
    the 8-device slab mesh vs the single-device cell-pair engine.  The
    gathered kspace adapter reuses the SAME single-device solver, so
    parity is reduction-order tight even after steps."""
    import os
    import yaml
    from lammps_buck_intel_tpu.run import build_simulation

    decks = os.path.join(os.path.dirname(__file__), "..", "examples",
                         "decks")

    def cfg():
        with open(os.path.join(decks, "hexane.yaml")) as f:
            c = yaml.safe_load(f)
        for k in ("dump", "write_data", "write_restart", "run", "thermo"):
            c.pop(k, None)
        c["precision"] = "double"
        return c

    simA = build_simulation(cfg())
    assert isinstance(simA, CellPairSimulation) and simA.rigid is not None

    c2 = cfg()
    c2["engine"] = "slab"
    c2["devices"] = 8
    # pin the gathered adapter: it reuses the SAME single-device solver,
    # so parity is reduction-order tight (the default pencil pipeline
    # runs a cell-aligned mesh — gated in test_slab_disp.py instead)
    c2["kspace_style"]["gathered"] = True
    simB = build_simulation(c2)
    assert isinstance(simB, SlabCellPairSimulation)
    assert simB.D == 8 and simB.rigid is not None

    fields = ("temp", "evdwl", "elong", "etotal", "press")
    ra, rb = simA.thermo(), simB.thermo()
    for f in fields:
        scale = max(abs(ra[f]), 1.0)
        assert abs(ra[f] - rb[f]) <= 1e-9 * scale, (f, ra[f], rb[f])

    simA.run(4, log=False)
    simB.run(4, log=False)
    ra, rb = simA.thermo(), simB.thermo()
    for f in fields:
        scale = max(abs(ra[f]), 1.0)
        assert abs(ra[f] - rb[f]) <= 1e-7 * scale, (f, ra[f], rb[f])
