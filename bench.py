"""Benchmark: in.buck deck (32,000-atom Buckingham melt) atom-steps/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference publishes no numbers (BASELINE.md).  The
vs_baseline denominator is 1.0e8 atom-steps/s — an order-of-magnitude
estimate for this deck on a dual-socket AVX-512 Xeon node running the
reference's vectorized buck/intel pair style (LAMMPS-class engines reach
~5e6 atom-steps/s/core on simple pair styles).  The driver-defined north
star is >=5x that (BASELINE.json).
"""
import json
import sys
import time

import numpy as np

XEON_NODE_ESTIMATE = 1.0e8  # atom-steps/s, see module docstring


def enable_compile_cache():
    """Persistent XLA compile cache — compiles through the axon tunnel are
    slow (tens of seconds to minutes) and highly variable; the cache makes
    re-runs start in seconds."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    enable_compile_cache()
    from lammps_buck_intel_tpu.core import (
        make_box, make_system, get_units, single,
    )
    from lammps_buck_intel_tpu.io import lattice, velocity
    from lammps_buck_intel_tpu.models.pair import build_buck
    from lammps_buck_intel_tpu.integrate import (
        CellPairSimulation, NeighborPolicy,
    )

    u = get_units("lj")
    prec = single()
    xs, lo, hi = lattice.create_atoms("fcc", 0.8442, 20, 20, 20)
    n = len(xs)
    v = velocity.create(n, 1.44, 87287, np.ones(n), u)
    box = make_box(lo, hi, dtype=prec.flt)
    system = make_system(xs, box, v=v, mass=np.ones(1), dtype=prec.flt)
    style = build_buck(1, {(0, 0): (1.0, 0.2, -0.8)}, cut_global=2.5,
                       dtype=prec.flt)
    sim = CellPairSimulation(
        system, style, units=u, precision=prec,
        neighbor=NeighborPolicy(skin=0.3, every=20, delay=0, check=False),
    )
    # warmup: compile every block size the steady-state loop will use
    sim.run(100, log=False)
    steps = 400
    t0 = time.perf_counter()
    sim.run(steps, log=False)
    dt = time.perf_counter() - t0
    rate = n * steps / dt
    print(json.dumps({
        "metric": "atom_steps_per_sec_in_buck_32k",
        "value": rate,
        "unit": "atom-steps/s",
        "vs_baseline": rate / XEON_NODE_ESTIMATE,
    }))


if __name__ == "__main__":
    main()
