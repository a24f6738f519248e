"""Slab-sharded production engine vs the single-device cell-pair engine.

Runs on the 8-virtual-CPU-device mesh (conftest) — the multi-chip test
strategy of SURVEY.md §4 item 4, now covering the PRODUCTION path:
dense cell-pair tiles with ppermute ghost planes, migration rebin, and
the all_to_all pencil-FFT PPPM.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lammps_buck_intel_tpu.core import make_box, make_system, get_units, \
    get_precision
from lammps_buck_intel_tpu.io import lattice, velocity
from lammps_buck_intel_tpu.models.pair import build_buck
from lammps_buck_intel_tpu.models.kspace import setup_pppm, CellPPPM, \
    SlabCellPPPM
from lammps_buck_intel_tpu.integrate import CellPairSimulation, \
    NeighborPolicy
from lammps_buck_intel_tpu.parallel import SlabCellPairSimulation, slab_mesh


def _melt_system(nx=16, ny=6, nz=6, charged=False, dtype=jnp.float64):
    u = get_units("lj")
    xs, lo, hi = lattice.create_atoms("fcc", 0.8442, nx, ny, nz)
    n = len(xs)
    v0 = velocity.create(n, 1.44, 87287, np.ones(n), u)
    box = make_box(lo, hi, dtype=dtype)
    q = np.zeros(n)
    if charged:
        q[0::2] = 0.5
        q[1::2] = -0.5
    system = make_system(xs, box, v=v0, q=q, dtype=dtype)
    return u, box, system, q


def _build_single(system, u, style, kspace_grid=None, q=None, skin=0.3,
                  every=5):
    prec = get_precision("double")
    sim = CellPairSimulation(
        system, style, units=u, precision=prec,
        neighbor=NeighborPolicy(skin=skin, every=every, check=False),
    )
    if kspace_grid is not None:
        pm = setup_pppm(system.box, q, cutoff=2.5, accuracy_rel=1e-4,
                        qqrd2e=1.0, order=5, grid=kspace_grid,
                        acc_dtype=prec.acc)
        sim.pair = sim.pair.replace(g_ewald=pm.g_ewald)
        sim.kspace = CellPPPM(pm, sim.grid)
        sim.state = sim._init_force_fn()(sim.state)
    return sim


def _build_slab(system, u, style, n_dev, kspace_grid=None, q=None,
                skin=0.3, every=5):
    prec = get_precision("double")
    mesh = slab_mesh(n_dev)
    ks = None
    if kspace_grid is not None:
        def ks(sim):
            pm = setup_pppm(system.box, q, cutoff=2.5, accuracy_rel=1e-4,
                            qqrd2e=1.0, order=5, grid=kspace_grid,
                            acc_dtype=prec.acc)
            sim.pair = sim.pair.replace(g_ewald=pm.g_ewald)
            return SlabCellPPPM(pm, sim.grid, n_dev)
    return SlabCellPairSimulation(
        system, style, mesh=mesh, units=u, precision=prec,
        neighbor=NeighborPolicy(skin=skin, every=every, check=False),
        kspace_setup=ks,
    )


def _style(charged=False):
    kw = {}
    if charged:
        kw = dict(coul="long", qqrd2e=1.0)
    return build_buck(1, {(0, 0): (1.0, 0.2, -0.8)}, cut_global=2.5, **kw)


@pytest.mark.parametrize("n_dev", [2, 4])
def test_slab_pair_matches_single_device(n_dev):
    """Pure pair: sharded thermo + trajectory == single device (f64)."""
    u, box, system, _ = _melt_system()
    style = _style()
    simA = _build_single(system, u, style)
    simB = _build_slab(system, u, style, n_dev)
    assert simB.grid.nc[0] % n_dev == 0

    rowsA = simA.run(20, thermo_every=10, log=False)
    rowsB = simB.run(20, thermo_every=10, log=False)
    for ra, rb in zip(rowsA, rowsB):
        assert abs(ra["evdwl"] - rb["evdwl"]) < 1e-8 * abs(ra["evdwl"])
        assert abs(ra["temp"] - rb["temp"]) < 1e-8 * abs(ra["temp"])
        assert abs(ra["press"] - rb["press"]) < 1e-7 * abs(ra["press"])

    xa = simA.get_atoms()["x"]
    xb = simB.get_atoms()["x"]
    np.testing.assert_allclose(xb, xa, rtol=0, atol=1e-9)


def test_slab_migration_preserves_atoms():
    """Atoms crossing slab boundaries over many rebins are never lost."""
    u, box, system, _ = _melt_system()
    style = _style()
    sim = _build_slab(system, u, style, 4, every=3)
    sim.run(30, log=False)
    atoms = sim.get_atoms()
    row = sim.thermo()
    assert not row["overflow"]
    # every atom id present exactly once with finite coordinates
    assert np.isfinite(atoms["x"]).all()
    n = sim.n_atoms
    st = jax.device_get(sim.state)
    aid = np.asarray(st.aid)
    present = np.sort(aid[aid < n])
    np.testing.assert_array_equal(present, np.arange(n))


def test_slab_pppm_matches_single_device():
    """buck/coul/long + PPPM through the pencil-FFT slab pipeline."""
    n_dev = 3  # ncx = 9 divides by 3; pppm ny must divide by 3 too
    u, box, system, q = _melt_system(charged=True)
    style = _style(charged=True)
    kgrid = (54, 18, 18)   # multiple of nc=(9,3,3), ny % 3 == 0, S >= 6
    simA = _build_single(system, u, style, kspace_grid=kgrid, q=q)
    assert simA.grid.nc == (9, 3, 3)
    simB = _build_slab(system, u, style, n_dev, kspace_grid=kgrid, q=q)
    assert simB.grid.nc == (9, 3, 3)

    rowsA = simA.run(10, thermo_every=5, log=False)
    rowsB = simB.run(10, thermo_every=5, log=False)
    for ra, rb in zip(rowsA, rowsB):
        assert abs(ra["elong"] - rb["elong"]) < 1e-8 * abs(ra["elong"])
        assert abs(ra["ecoul"] - rb["ecoul"]) < 1e-7 * (abs(ra["ecoul"])
                                                        + 1e-30)
        assert abs(ra["etotal"] - rb["etotal"]) < 1e-8 * abs(ra["etotal"])
        # off-diagonals are ~1e-5 of the diagonal here; the two pipelines
        # (half- vs full-spectrum sums) agree to roundoff of the SCALE
        vscale = np.abs(ra["virial"]).max()
        np.testing.assert_allclose(rb["virial"] / vscale,
                                   ra["virial"] / vscale,
                                   rtol=0, atol=1e-7)

    xa = simA.get_atoms()["x"]
    xb = simB.get_atoms()["x"]
    np.testing.assert_allclose(xb, xa, rtol=0, atol=1e-8)


def test_slab_nvt_matches_single_device():
    """Nose-Hoover NVT on the slab engine: the replicated chain driven by
    psum'd kinetic energy reproduces the single-device thermostat."""
    from lammps_buck_intel_tpu.integrate import NVTConfig

    u, box, system, _ = _melt_system()
    style = _style()
    prec = get_precision("double")
    therm = NVTConfig(t_start=1.1, t_stop=1.1, t_damp=0.5)
    simA = CellPairSimulation(
        system, style, units=u, precision=prec, thermostat=therm,
        neighbor=NeighborPolicy(skin=0.3, every=5, check=False),
    )
    simB = SlabCellPairSimulation(
        system, style, mesh=slab_mesh(4), units=u, precision=prec,
        thermostat=therm,
        neighbor=NeighborPolicy(skin=0.3, every=5, check=False),
    )
    rowsA = simA.run(30, thermo_every=10, log=False)
    rowsB = simB.run(30, thermo_every=10, log=False)
    for ra, rb in zip(rowsA, rowsB):
        assert abs(ra["temp"] - rb["temp"]) < 1e-8 * abs(ra["temp"]), (
            ra["temp"], rb["temp"])
        assert abs(ra["etotal"] - rb["etotal"]) < 1e-7 * abs(ra["etotal"])
    # thermostat state advanced identically (replicated chain)
    thA = np.asarray(jax.device_get(simA.state.therm))
    thB = np.asarray(jax.device_get(simB.state.therm))
    np.testing.assert_allclose(thB, thA, atol=1e-10)


def _tilted_melt(dtype=jnp.float64):
    """fcc melt sheared into a tilted cell (lamda-preserving map)."""
    u = get_units("lj")
    xs, lo, hi = lattice.create_atoms("fcc", 0.8442, 16, 6, 6)
    n = len(xs)
    L = np.asarray(hi) - np.asarray(lo)
    tilt = (1.3, -0.9, 0.8)
    H = np.array([[L[0], 0, 0], [tilt[0], L[1], 0],
                  [tilt[1], tilt[2], L[2]]])
    lam = (np.asarray(xs) - lo) / L
    x = lo + lam @ H
    v0 = velocity.create(n, 1.44, 87287, np.ones(n), u)
    box = make_box(lo, hi, tilt=tilt, dtype=dtype)
    q = np.zeros(n)
    q[0::2] = 0.5
    q[1::2] = -0.5
    system = make_system(x, box, v=v0, q=q, dtype=dtype)
    return u, box, system, q


@pytest.mark.parametrize("n_dev", [2, 8])
def test_slab_triclinic_matches_single_device(n_dev):
    """TILTED cell on the slab engine (VERDICT r4 missing #2): lamda-
    plane decomposition + greedy triclinic pair min image reproduce the
    single-device triclinic engine over migration rebins (f64)."""
    u, box, system, _ = _tilted_melt()
    style = _style()
    simA = _build_single(system, u, style)
    simB = _build_slab(system, u, style, n_dev)
    assert simB.box.is_triclinic
    assert simB.grid.nc[0] % n_dev == 0

    rowsA = simA.run(20, thermo_every=10, log=False)
    rowsB = simB.run(20, thermo_every=10, log=False)
    for ra, rb in zip(rowsA, rowsB):
        assert abs(ra["evdwl"] - rb["evdwl"]) < 1e-8 * abs(ra["evdwl"])
        assert abs(ra["temp"] - rb["temp"]) < 1e-8 * abs(ra["temp"])
        assert abs(ra["press"] - rb["press"]) < 1e-7 * abs(ra["press"])
    xa = simA.get_atoms()["x"]
    xb = simB.get_atoms()["x"]
    np.testing.assert_allclose(xb, xa, rtol=0, atol=1e-9)


def test_slab_triclinic_gathered_kspace():
    """Tilted + charged: buck/coul/long with the gathered (replicated)
    triclinic PPPM on the slab mesh == single-device generic solver."""
    from lammps_buck_intel_tpu.models.kspace.pppm_slab import \
        GatheredKSpace

    u, box, system, q = _tilted_melt()
    style = _style(charged=True)
    prec = get_precision("double")
    simA = _build_single(system, u, style)
    pm = setup_pppm(box, q, cutoff=2.5, accuracy_rel=1e-4, qqrd2e=1.0,
                    order=5, acc_dtype=prec.acc,
                    multiple_of=simA.grid.coarse().nc)
    style = style.replace(g_ewald=pm.g_ewald)
    assert pm.recip is not None
    simA.pair = simA.pair.replace(g_ewald=pm.g_ewald)
    simA.kspace = CellPPPM(pm, simA.grid)
    simA.state = simA._init_force_fn()(simA.state)

    def ks(sim):
        return GatheredKSpace(pm, sim.n_atoms, sim.D, sim.grid.nslots)

    mesh = slab_mesh(4)
    simB = SlabCellPairSimulation(
        system, style, mesh=mesh, units=u, precision=prec,
        neighbor=NeighborPolicy(skin=0.3, every=5, check=False),
        kspace_setup=ks,
    )
    rowsA = simA.run(10, thermo_every=5, log=False)
    rowsB = simB.run(10, thermo_every=5, log=False)
    for ra, rb in zip(rowsA, rowsB):
        for key in ("evdwl", "ecoul", "elong", "temp"):
            a, b = float(ra[key]), float(rb[key])
            assert abs(a - b) <= 1e-7 * max(abs(a), abs(b), 1.0), \
                (key, a, b)


def test_slab_ad_pencil_matches_single_device():
    """ad differentiation through the PENCIL pipeline (one inverse FFT +
    derivative-spline gather + self-force series, sharded) == the
    single-device ad CellPPPM (VERDICT r4 weak #2: ad no longer forces
    the gathered fallback)."""
    u, box, system, q = _melt_system(charged=True)
    style = _style(charged=True)
    prec = get_precision("double")
    simA = _build_single(system, u, style)
    nc = simA.grid.coarse().nc
    assert nc == (9, 3, 3)
    n_dev = 3   # ncx = 9 tiles 3 devices, so both engines share the grid
    grid_k = (45, 15, 15)   # multiples of nc; ny % n_dev == 0
    pm = setup_pppm(box, q, cutoff=2.5, accuracy_rel=1e-4, qqrd2e=1.0,
                    order=5, grid=grid_k, acc_dtype=prec.acc, diff="ad")
    simA.pair = simA.pair.replace(g_ewald=pm.g_ewald)
    simA.kspace = CellPPPM(pm, simA.grid)
    simA.state = simA._init_force_fn()(simA.state)

    def ks(sim):
        sim.pair = sim.pair.replace(g_ewald=pm.g_ewald)
        return SlabCellPPPM(pm, sim.grid, n_dev)

    mesh = slab_mesh(n_dev)
    simB = SlabCellPairSimulation(
        system, style, mesh=mesh, units=u, precision=prec,
        neighbor=NeighborPolicy(skin=0.3, every=5, check=False),
        kspace_setup=ks,
    )
    assert simB.kspace.pm.diff == "ad"
    rowsA = simA.run(10, thermo_every=5, log=False)
    rowsB = simB.run(10, thermo_every=5, log=False)
    for ra, rb in zip(rowsA, rowsB):
        for key in ("evdwl", "ecoul", "elong", "temp"):
            a, b = float(ra[key]), float(rb[key])
            assert abs(a - b) <= 1e-7 * max(abs(a), abs(b), 1.0), \
                (key, a, b)


def test_sharded_ewald_matches_single_device():
    """ShardedEwald (psum'd partial structure factors) == the single-
    device Ewald solver — `gathered: true` is now an opt-out for every
    deck solver family, not a requirement (VERDICT r4 weak #2)."""
    from lammps_buck_intel_tpu.models.kspace import setup_ewald
    from lammps_buck_intel_tpu.models.kspace.pppm_slab import ShardedEwald

    u, box, system, q = _melt_system(charged=True)
    style = _style(charged=True)
    prec = get_precision("double")
    ew = setup_ewald(box, q, cutoff=2.5, accuracy_rel=1e-4, qqrd2e=1.0,
                     acc_dtype=prec.acc)
    style = style.replace(g_ewald=ew.g_ewald)
    simA = CellPairSimulation(
        system, style, units=u, precision=prec, kspace=ew,
        neighbor=NeighborPolicy(skin=0.3, every=5, check=False),
    )

    def ks(sim):
        return ShardedEwald(ew, sim.D)

    simB = SlabCellPairSimulation(
        system, style, mesh=slab_mesh(4), units=u, precision=prec,
        neighbor=NeighborPolicy(skin=0.3, every=5, check=False),
        kspace_setup=ks,
    )
    rowsA = simA.run(10, thermo_every=5, log=False)
    rowsB = simB.run(10, thermo_every=5, log=False)
    for ra, rb in zip(rowsA, rowsB):
        for key in ("evdwl", "ecoul", "elong", "temp"):
            a, b = float(ra[key]), float(rb[key])
            assert abs(a - b) <= 1e-7 * max(abs(a), abs(b), 1.0), \
                (key, a, b)


def test_slab_triclinic_molecular_shake(tmp_path):
    """TILTED molecular deck (SHAKE + bonded + special) on the slab
    mesh: the Box-aware constraint min image composes with the ghost
    exchange; f64 parity vs the single-device engine."""
    import sys as _sys

    _sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from test_npt import _water_cfg
    from lammps_buck_intel_tpu.run import build_simulation
    from lammps_buck_intel_tpu.integrate.shake import max_violation

    cfg = _water_cfg(tmp_path, tilt=[0.8, -0.6, 0.5])
    cfg["fixes"] = [f for f in cfg["fixes"] if f["name"] != "npt"]
    cfg["precision"] = "double"
    cfg["replicate"] = [2, 2, 2]
    cfg["devices"] = 2
    sim = build_simulation(cfg)
    assert isinstance(sim, SlabCellPairSimulation)
    assert sim.box.is_triclinic and sim.shake is not None
    rows = sim.run(30, thermo_every=15, log=False)
    atoms = sim.get_atoms()
    viol = float(max_violation(sim.shake, jnp.asarray(atoms["x"]),
                               sim.box))
    assert viol < 1e-6, viol
    cfg2 = dict(cfg)
    cfg2.pop("devices")
    sim2 = build_simulation(cfg2)
    rows2 = sim2.run(30, thermo_every=15, log=False)
    for r, r2 in zip(rows, rows2):
        assert abs(r["etotal"] - r2["etotal"]) \
            <= 1e-8 * abs(r2["etotal"]), (r["etotal"], r2["etotal"])
