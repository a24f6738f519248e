"""Pencil-sharded dispersion PPPM (SlabCellPPPMDisp) on the slab mesh.

Parity gates vs the single-device solvers on the SAME pinned mesh
(f64, 8 virtual devices) for every mixing rule, plus the dual Coulomb +
dispersion pencil pipeline (SlabCombinedKSpace) — the distributed form
of the reference's pppm/disp machinery
(/root/reference/pppm_disp_intel.cpp:183-467).
"""
import jax.numpy as jnp
import os

import numpy as np
import pytest

from lammps_buck_intel_tpu.core import make_box, make_system, get_units, \
    get_precision
from lammps_buck_intel_tpu.io import lattice, velocity
from lammps_buck_intel_tpu.models.pair import build_lj, build_buck
from lammps_buck_intel_tpu.models.kspace import (
    setup_pppm, setup_pppm_disp, solve_g6, BoundKSpace, CombinedKSpace,
    SlabCellPPPM, SlabCellPPPMDisp, SlabCombinedKSpace,
)
from lammps_buck_intel_tpu.integrate import CellPairSimulation, \
    NeighborPolicy
from lammps_buck_intel_tpu.parallel import SlabCellPairSimulation, slab_mesh

# fcc 16x6x6 melt -> slab cells nc=(8,3,3) at D=8; the pinned kspace
# mesh must be cell-aligned (multiple of nc) with ny % 8 == 0
GRID = (40, 24, 15)
N_DEV = 8


def _system(dtype=jnp.float64):
    u = get_units("lj")
    xs, lo, hi = lattice.create_atoms("fcc", 0.8442, 16, 6, 6)
    n = len(xs)
    typ = (np.arange(n) % 2).astype(np.int32)
    v0 = velocity.create(n, 1.44, 87287, np.ones(n), u)
    box = make_box(lo, hi, dtype=dtype)
    q = np.where(typ == 0, 0.5, -0.5)
    return u, box, make_system(xs, box, type=typ, v=v0, q=q,
                               dtype=dtype), typ, q


_EPS = np.array([1.0, 0.8])
_SIG = np.array([1.0, 0.9])


def _disp_solver(box, typ, g6, mix, prec):
    B = np.sqrt(4.0 * _EPS) * _SIG**3
    kw = {}
    if mix == "arithmetic":
        kw = dict(epsilon=_EPS, sigma=_SIG)
    elif mix == "none":
        C6 = 4.0 * np.sqrt(np.outer(_EPS, _EPS)) \
            * (0.5 * np.add.outer(_SIG, _SIG))**6
        kw = dict(C6=C6)
    pmd = setup_pppm_disp(box, B, typ, cutoff=2.5, g_ewald_6=g6,
                          grid=GRID, acc_dtype=prec.acc, mix=mix, **kw)
    return pmd, B


def _run_pair(simA, simB, steps=10, tol=1e-8):
    """tol: f64 accumulation-order headroom — the engines bin atoms into
    different cell grids (nc 9x3x3 vs 8x3x3), so reduction orders differ
    and the melt's Lyapunov growth amplifies the roundoff over steps."""
    rowsA = simA.run(steps, thermo_every=5, log=False)
    rowsB = simB.run(steps, thermo_every=5, log=False)
    for ra, rb in zip(rowsA, rowsB):
        for f in ("evdwl", "elong", "etotal", "temp", "press"):
            scale = max(abs(ra[f]), 1e-3)
            assert abs(ra[f] - rb[f]) < tol * scale, (f, ra[f], rb[f])
    xa = simA.get_atoms()["x"]
    xb = simB.get_atoms()["x"]
    np.testing.assert_allclose(xb, xa, rtol=0, atol=1e-7)


@pytest.mark.parametrize("mix", [
    "geometric",
    pytest.param("arithmetic", marks=pytest.mark.skipif(
        not os.environ.get("RUN_SLOW"),
        reason="7-channel pencil at full depth: RUN_SLOW=1")),
    pytest.param("none", marks=pytest.mark.skipif(
        not os.environ.get("RUN_SLOW"),
        reason="eigen-split pencil at full depth: RUN_SLOW=1")),
])
def test_pencil_disp_matches_single_device(mix):
    """SlabCellPPPMDisp == BoundKSpace(PPPMDisp) on the same mesh, all
    mixing rules (1 / 7 / nsplit channels)."""
    u, box, system, typ, _ = _system()
    prec = get_precision("double")
    g6 = solve_g6(2.5, 1e-4)
    style = build_lj(2, {0: (1.0, 1.0), 1: (0.8, 0.9)}, cut_global=2.5,
                     disp="long", mix=("geometric" if mix != "arithmetic"
                                       else "arithmetic"))
    style = style.replace(g_ewald_6=g6)
    pol = NeighborPolicy(skin=0.3, every=5, check=False)

    pmd, B = _disp_solver(box, typ, g6, mix, prec)
    simA = CellPairSimulation(system, style, units=u, precision=prec,
                              neighbor=pol)
    simA.kspace = (BoundKSpace(pmd, B[typ]) if mix == "geometric"
                   else BoundKSpace(pmd, typ, typed=True))
    simA.state = simA._init_force_fn()(simA.state)

    def kset(sim):
        pmd2, _ = _disp_solver(box, typ, g6, mix, prec)
        return SlabCellPPPMDisp(pmd2, sim.grid, N_DEV, typ)

    simB = SlabCellPairSimulation(
        system, style, mesh=slab_mesh(N_DEV), units=u, precision=prec,
        neighbor=pol, kspace_setup=kset)
    assert isinstance(simB.kspace, SlabCellPPPMDisp)
    assert simB.kspace.nch == {"geometric": 1, "arithmetic": 7,
                               "none": 2}[mix]
    _run_pair(simA, simB)


def test_pencil_coul_plus_disp_combined():
    """SlabCombinedKSpace: Coulomb pencil + dispersion pencil together
    (the buck/long/coul/long + pppm/disp dual pipeline)."""
    u, box, system, typ, q = _system()
    prec = get_precision("double")
    g6 = solve_g6(2.5, 1e-4)
    style = build_buck(2, {(0, 0): (1.0, 0.2, -0.8),
                           (1, 1): (0.9, 0.25, -0.7),
                           (0, 1): (0.95, 0.22, -0.75)},
                       cut_global=2.5, coul="long", disp="long",
                       qqrd2e=1.0)
    pm = setup_pppm(box, q, cutoff=2.5, accuracy_rel=1e-4, qqrd2e=1.0,
                    order=5, grid=GRID, acc_dtype=prec.acc)
    style = style.replace(g_ewald=pm.g_ewald, g_ewald_6=g6)
    # buck dispersion "charge": B = sqrt(C)
    Cdiag = np.array([0.8, 0.7])
    B = np.sqrt(Cdiag)
    pmd = setup_pppm_disp(box, B, typ, cutoff=2.5, g_ewald_6=g6,
                          grid=GRID, acc_dtype=prec.acc, mix="geometric")
    pol = NeighborPolicy(skin=0.3, every=5, check=False)

    simA = CellPairSimulation(system, style, units=u, precision=prec,
                              neighbor=pol)
    simA.kspace = CombinedKSpace([pm, BoundKSpace(pmd, B[typ])])
    simA.state = simA._init_force_fn()(simA.state)

    def kset(sim):
        pm2 = setup_pppm(box, q, cutoff=2.5, accuracy_rel=1e-4,
                         qqrd2e=1.0, order=5, grid=GRID,
                         acc_dtype=prec.acc)
        pmd2 = setup_pppm_disp(box, B, typ, cutoff=2.5, g_ewald_6=g6,
                               grid=GRID, acc_dtype=prec.acc,
                               mix="geometric")
        return SlabCombinedKSpace([
            SlabCellPPPM(pm2, sim.grid, N_DEV),
            SlabCellPPPMDisp(pmd2, sim.grid, N_DEV, typ),
        ])

    simB = SlabCellPairSimulation(
        system, style, mesh=slab_mesh(N_DEV), units=u, precision=prec,
        neighbor=pol, kspace_setup=kset)
    assert isinstance(simB.kspace, SlabCombinedKSpace)
    _run_pair(simA, simB, tol=1e-7)


def test_hexane_deck_selects_pencil_disp():
    """The literal in.hexane deck with `devices: 8` now runs the pencil
    dispersion pipeline (not the gathered fallback); thermo agrees with
    the single-device run to solver accuracy (the meshes differ: the
    pencil mesh is cell-aligned and device-tiled)."""
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
    c2 = cfg()
    c2["engine"] = "slab"
    c2["devices"] = 8
    simB = build_simulation(c2)
    assert isinstance(simB, SlabCellPairSimulation)
    assert isinstance(simB.kspace, SlabCellPPPMDisp)

    ra, rb = simA.thermo(), simB.thermo()
    # same positions/velocities: pair + kinetic identical; elong differs
    # only through the mesh (both at the same 1e-4 accuracy target)
    for f in ("temp", "evdwl"):
        assert abs(ra[f] - rb[f]) <= 1e-9 * max(abs(ra[f]), 1.0), f
    assert abs(ra["elong"] - rb["elong"]) <= 2e-3 * abs(ra["elong"]), (
        ra["elong"], rb["elong"])
    assert abs(ra["etotal"] - rb["etotal"]) <= 1e-4 * abs(ra["etotal"])
