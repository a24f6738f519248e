"""Run the in.buck deck (examples/in.buck of the reference): 3d Buckingham
melt — fcc 0.8442, 20^3 cells x4 = 32,000 atoms, buck 2.5, NVE, lj units,
neigh_modify delay 0 every 20 check no, 100 steps.

Usage: python examples/run_buck.py [--cells 20] [--steps 100] [--f64] [--cpu]
"""
import argparse
import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=20)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--thermo", type=int, default=50)
    ap.add_argument("--engine", choices=["cellpair", "nlist"], default="cellpair")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    from lammps_buck_intel_tpu.core import (
        make_box, make_system, get_units, single, double,
    )
    from lammps_buck_intel_tpu.io import lattice, velocity
    from lammps_buck_intel_tpu.models.pair import build_buck
    from lammps_buck_intel_tpu.integrate import (
        Simulation, CellPairSimulation, NeighborPolicy,
    )

    u = get_units("lj")
    prec = double() if args.f64 else single()
    c = args.cells
    xs, lo, hi = lattice.create_atoms("fcc", 0.8442, c, c, c)
    n = len(xs)
    print(f"# {n} atoms on {jax.devices()[0].platform}:{jax.devices()[0]}")
    v = velocity.create(n, 1.44, 87287, np.ones(n), u)
    box = make_box(lo, hi, dtype=prec.flt)
    system = make_system(xs, box, v=v, mass=np.ones(1), dtype=prec.flt)
    style = build_buck(1, {(0, 0): (1.0, 0.2, -0.8)}, cut_global=2.5,
                       dtype=prec.flt)
    cls = CellPairSimulation if args.engine == "cellpair" else Simulation
    sim = cls(
        system, style, units=u, precision=prec,
        neighbor=NeighborPolicy(skin=0.3, every=20, delay=0, check=False),
    )
    # warmup compile
    sim.run(1, log=False)
    t0 = time.perf_counter()
    sim.run(args.steps, thermo_every=args.thermo)
    dt = time.perf_counter() - t0
    rate = n * args.steps / dt
    print(f"# {args.steps} steps in {dt:.3f}s -> {rate:,.0f} atom-steps/s")
    print(f"# timings: {sim.timings}")


if __name__ == "__main__":
    main()
