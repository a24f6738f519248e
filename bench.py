"""Benchmark: the BASELINE.json north-star workload — atom-steps/sec on a
259,200-atom buck/coul/long + PPPM system (examples/decks/silica_pppm.yaml,
the reference's data.aC silica scaled to in.spce's size class), running on
the production cell-pair engine with the scatter-free cell-patch PPPM.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference publishes no numbers (BASELINE.md).  The
vs_baseline denominator is 1.06e6 atom-steps/s — MEASURED, not guessed:
native/baseline_md.cpp (a C++ implementation of the reference's own
algorithm: half lists + Newton, A&S-erfc buck/coul/long, order-5 ik
PPPM) runs this exact workload at 37,836 atom-steps/s on one core of
this container's Xeon (energies cross-checked against the JAX engine to
<=1.5e-4), extrapolated x28 cores to one socket.  Full provenance and
the AVX-512 vectorization caveat: BASELINE.md "Measured CPU baseline".
Reproduce with `python bench_baseline.py`.
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
        "vs_baseline": rate / 1.06e6,
    }))


if __name__ == "__main__":
    main()
