"""Nose-Hoover NVT thermostat tests."""
import numpy as np
import jax
import jax.numpy as jnp

from lammps_buck_intel_tpu.core import (
    make_box, make_system, get_units, double,
)
from lammps_buck_intel_tpu.io import lattice, velocity
from lammps_buck_intel_tpu.models.pair import build_buck
from lammps_buck_intel_tpu.integrate import Simulation, NeighborPolicy
from lammps_buck_intel_tpu.integrate.nvt import (
    NVTConfig, NHChain, chain_energy,
)


def _sim(t_start, t_stop, t_damp, seed=87287, n_cells=4):
    u = get_units("lj")
    xs, lo, hi = lattice.create_atoms("fcc", 0.8442, *([n_cells] * 3))
    n = len(xs)
    v = velocity.create(n, 1.44, seed, np.ones(n), u)
    box = make_box(lo, hi, dtype=jnp.float64)
    system = make_system(xs, box, v=v, mass=np.ones(1), dtype=jnp.float64)
    style = build_buck(1, {(0, 0): (1.0, 0.2, -0.8)}, cut_global=2.5,
                       shift=True, dtype=jnp.float64)
    sim = Simulation(
        system, style, units=u, precision=double(),
        neighbor=NeighborPolicy(skin=0.3, every=10, delay=0, check=False),
        thermostat=NVTConfig(t_start=t_start, t_stop=t_stop, t_damp=t_damp),
    )
    return sim, u


def test_nvt_reaches_target_temperature():
    # melt equilibrates near T=0.8 under NVE from T=1.44; NVT at 1.1 must
    # instead pull the system to 1.1
    sim, u = _sim(1.1, 1.1, 0.5)
    rows = sim.run(800, thermo_every=200, log=False)
    temps = [r["temp"] for r in rows[2:]]
    assert abs(np.mean(temps) - 1.1) < 0.08, temps


def test_nvt_conserved_quantity():
    """H' = E_total + thermostat energy must be conserved."""
    sim, u = _sim(1.0, 1.0, 0.5)
    cfg = sim.thermostat
    hs = []
    for _ in range(6):
        rows = sim.run(40, thermo_every=40, log=False)
        r = rows[-1]
        th = np.asarray(jax.device_get(sim.state.therm))
        chain = NHChain(eta=jnp.asarray(th[0]), eta_dot=jnp.asarray(th[1]))
        e_chain = float(chain_energy(cfg, chain, 1.0))
        hs.append(r["etotal"] + e_chain)
    drift = (max(hs) - min(hs)) / abs(hs[0])
    assert drift < 5e-4, hs


def test_nvt_temperature_ramp():
    sim, u = _sim(0.7, 1.3, 0.3)
    rows = sim.run(1000, thermo_every=250, log=False)
    temps = [r["temp"] for r in rows]
    # end hotter than start, end near 1.3
    assert temps[-1] > temps[1]
    assert abs(temps[-1] - 1.3) < 0.15, temps
    # the target is a traced argument: a ramp with fine thermo cadence must
    # NOT compile one program per thermo segment (one entry per block size)
    assert len(sim._chunk_fns) <= 3, list(sim._chunk_fns)
