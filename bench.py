"""Benchmark: the BASELINE.json north-star workload — atom-steps/sec on a
259,200-atom buck/coul/long + PPPM system (examples/decks/silica_pppm.yaml,
the reference's data.aC silica scaled to in.spce's size class), running on
the production cell-pair engine with the scatter-free cell-patch PPPM.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference publishes no numbers (BASELINE.md).  The
vs_baseline denominator is 1.0e6 atom-steps/s — an order-of-magnitude
estimate for this workload (Buckingham + PPPM at ~260k atoms) on a
dual-socket AVX-512 Xeon node running the reference's vectorized styles
(LAMMPS rhodo/spce-class PPPM workloads reach ~2-5k atom-steps/s/core).
The driver-defined north star is >=5x that (BASELINE.json).
"""
import json
import os
import time


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import yaml

    from lammps_buck_intel_tpu.run import build_simulation

    deck = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "examples", "decks", "silica_pppm.yaml")
    with open(deck) as f:
        cfg = yaml.safe_load(f)
    sim = build_simulation(cfg)
    n = sim.n_atoms
    # warmup: compile the steady-state chunk sizes
    sim.run(20, log=False)
    steps = 100
    t0 = time.perf_counter()
    sim.run(steps, log=False)
    dt = time.perf_counter() - t0
    rate = n * steps / dt
    print(json.dumps({
        "metric": "atom_steps_per_sec_silica_buck_coul_long_pppm_259k",
        "value": rate,
        "unit": "atom-steps/s",
        "vs_baseline": rate / 1.0e6,
    }))


if __name__ == "__main__":
    main()
