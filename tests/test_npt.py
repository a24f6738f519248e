"""NPT barostat (traced-box engine).

Validation strategy (VERDICT round-1 item 9): an NPT run on a cubic LJ box
whose target pressure equals the measured NVT pressure must reproduce the
NVT limit (volume fluctuates around the initial volume, temperature stays
thermostatted); a z-only barostat must dilate only z.  Also checks the
traced-box machinery itself: traced Ewald forces against the baked-box
solver, and pair forces through a traced box against the host-box path.
"""
import numpy as np
import jax
import jax.numpy as jnp

from lammps_buck_intel_tpu.core import (
    make_box, make_system, get_units, get_precision,
)
from lammps_buck_intel_tpu.core.box import Box
from lammps_buck_intel_tpu.io import lattice, velocity
from lammps_buck_intel_tpu.models.pair import build_lj, compute_pair
from lammps_buck_intel_tpu.models.kspace import setup_ewald
from lammps_buck_intel_tpu.neighbor import make_spec, build
from lammps_buck_intel_tpu.integrate import (
    NPTConfig, NPTSimulation, NVTConfig, NeighborPolicy,
)


def _lj_melt(nx=5, temp=1.0):
    u = get_units("lj")
    xs, lo, hi = lattice.create_atoms("fcc", 0.8442, nx, nx, nx)
    n = len(xs)
    rng = np.random.default_rng(9)
    v0 = velocity.create(n, temp, 2934, np.ones(n), u)
    box = make_box(lo, hi)
    system = make_system(xs, box, v=v0, dtype=jnp.float64)
    style = build_lj(1, {0: (1.0, 1.0)}, cut_global=2.5, dtype=jnp.float64)
    return u, box, system, style, n


def test_traced_pair_forces_match_baked():
    u, box, system, style, n = _lj_melt(4)
    spec = make_spec(n, box.lengths, 2.8)
    x = jnp.asarray(system.x, jnp.float64)
    nl = build(x, box, spec)
    typ = np.zeros(n, np.int32)
    q = np.zeros(n)
    pr0 = compute_pair(style, x, typ, q, box, nl, eflag=True, vflag=True,
                       acc_dtype=jnp.float64)
    # traced box: same lengths threaded as jnp arrays
    tbox = Box(lo=jnp.asarray(box.lo), hi=jnp.asarray(box.hi),
               periodic=box.periodic)
    pr1 = jax.jit(lambda xx, b: compute_pair(
        style, xx, typ, q, b, nl, eflag=True, vflag=True,
        acc_dtype=jnp.float64))(x, tbox)
    np.testing.assert_allclose(np.asarray(pr1.f), np.asarray(pr0.f),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(float(pr1.evdwl), float(pr0.evdwl),
                               rtol=1e-12)


def test_traced_ewald_matches_baked():
    u = get_units("lj")
    rng = np.random.default_rng(4)
    n = 64
    L = np.array([7.0, 8.0, 9.0])
    x = rng.uniform(0, 1, (n, 3)) * L
    q = rng.normal(0, 1, n)
    q -= q.mean()
    box = make_box(np.zeros(3), L)
    ew = setup_ewald(box, q, cutoff=3.0, accuracy_rel=1e-5, qqrd2e=1.0,
                     acc_dtype=jnp.float64)
    xj = jnp.asarray(x, jnp.float64)
    qj = jnp.asarray(q, jnp.float64)
    r0 = ew.compute(xj, qj)
    r1 = jax.jit(lambda xx, LL: ew.compute_traced(xx, qj, LL))(
        xj, jnp.asarray(L, jnp.float64))
    np.testing.assert_allclose(np.asarray(r1.f), np.asarray(r0.f),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(float(r1.elong), float(r0.elong), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(r1.virial),
                               np.asarray(r0.virial), rtol=1e-8, atol=1e-10)


def _make_npt(couple, flags, temp=1.0, barostat_on=True, p_target=0.0):
    u, box, system, style, n = _lj_melt(5, temp=temp)
    prec = get_precision("double")
    thermostat = NVTConfig(t_start=temp, t_stop=temp, t_damp=0.5, tchain=3)
    npt_cfg = NPTConfig(
        p_start=(p_target,) * 3, p_stop=(p_target,) * 3, p_damp=5.0,
        flags=flags if barostat_on else (False, False, False),
        couple=couple, mtk=True)
    sim = NPTSimulation(system, style, npt_cfg, thermostat, units=u,
                        precision=prec, dt=0.004,
                        neighbor=NeighborPolicy(skin=0.3, every=5,
                                                check=False))
    return sim


def test_npt_iso_reproduces_nvt_limit():
    """Equilibrate NVT (barostat off), measure <P>, then barostat at that
    target: the volume must hold (NVT limit) and the box stay cubic."""
    sim = _make_npt("xyz", (True, True, True), barostat_on=False)
    sim.run(1200, log=False)                     # melt + NVT equilibrate
    rows = sim.run(600, thermo_every=100, log=False)
    p_eq = float(np.mean([r["press"] for r in rows]))
    V0 = rows[-1]["vol"]
    # switch the barostat on at the measured pressure
    sim.npt = NPTConfig(p_start=(p_eq,) * 3, p_stop=(p_eq,) * 3,
                        p_damp=5.0, flags=(True, True, True),
                        couple="xyz", mtk=True)
    rows = sim.run(600, thermo_every=100, log=False)
    for r in rows:
        assert np.isfinite(r["temp"]) and np.isfinite(r["vol"])
    Vs = [r["vol"] for r in rows[1:]]
    assert abs(np.mean(Vs) - V0) / V0 < 0.06, (p_eq, V0, Vs)
    Ts = [r["temp"] for r in rows[2:]]
    assert abs(np.mean(Ts) - 1.0) < 0.15, Ts
    L = rows[-1]["boxL"]
    assert abs(L[0] - L[1]) < 1e-10 and abs(L[1] - L[2]) < 1e-10


def test_npt_z_only_dilates_only_z():
    sim = _make_npt("none", (False, False, True), barostat_on=False)
    sim.run(900, log=False)
    rows = sim.run(300, thermo_every=100, log=False)
    p_eq = float(np.mean([r["press"] for r in rows]))
    L0 = rows[-1]["boxL"]
    sim.npt = NPTConfig(p_start=(p_eq,) * 3, p_stop=(p_eq,) * 3,
                        p_damp=5.0, flags=(False, False, True),
                        couple="none", mtk=False)
    rows = sim.run(200, thermo_every=50, log=False)
    L = rows[-1]["boxL"]
    assert L[0] == L0[0] and L[1] == L0[1]
    moved = any(abs(r["boxL"][2] - L0[2]) > 1e-9 for r in rows[1:])
    assert moved
    for r in rows:
        assert np.isfinite(r["vol"])
        assert abs(r["boxL"][2] - L0[2]) / L0[2] < 0.2


def test_npt_deck_runner():
    """`fix npt` through the deck runner (z-only, mtk no — the in.rhodo
    form) on a small LJ lattice deck."""
    from lammps_buck_intel_tpu.run import build_simulation

    cfg = {
        "units": "lj",
        "precision": "double",
        "lattice": {"style": "fcc", "density": 0.8442,
                    "nx": 4, "ny": 4, "nz": 4},
        "mass": [1.0],
        "pair_style": {"name": "lj/cut", "cut": 2.5,
                       "coeffs": {"1 1": [1.0, 1.0]}},
        "velocity": {"temp": 1.0, "seed": 777},
        "neighbor": {"skin": 0.3, "every": 5, "check": False},
        "fixes": [{"name": "npt", "t_start": 1.0, "t_damp": 0.5,
                   "z": [2.0, 2.0, 5.0], "mtk": False, "tchain": 1}],
        "timestep": 0.004,
        "run": 0,
    }
    sim = build_simulation(cfg)
    from lammps_buck_intel_tpu.integrate import NPTSimulation

    assert isinstance(sim, NPTSimulation)
    rows = sim.run(100, thermo_every=50, log=False)
    assert all(np.isfinite(r["temp"]) for r in rows)
    L0 = rows[0]["boxL"]
    L1 = rows[-1]["boxL"]
    assert L1[0] == L0[0] and L1[1] == L0[1]
    atoms = sim.get_atoms()
    assert np.isfinite(atoms["x"]).all()
