"""Wall-clock a deck's production run loop on the live backend.

Usage:  python tools/deck_time.py <deck.yaml> [--steps N] [--warm W]

Builds the deck with run.py's builder, runs W warm-up steps (compile +
first rebins), then times `run(N, thermo_every=0)` — the zero-host-sync
production loop — ending with the loop's own sticky-flag fetch as the
synchronization point (block_until_ready does not block under the axon
tunnel; a value fetch does — PERF.md Methodology).  Prints one JSON line.
"""
import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("deck")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--warm", type=int, default=20)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import yaml

    from lammps_buck_intel_tpu.run import build_simulation

    path = args.deck if os.path.exists(args.deck) else os.path.join(
        ROOT, "examples", "decks", args.deck)
    with open(path) as f:
        cfg = yaml.safe_load(f)
    cfg.pop("run", None)
    cfg.pop("dump", None)
    sim = build_simulation(cfg)
    n_atoms = sim.n_atoms if hasattr(sim, "n_atoms") else len(sim.state.x)

    # warm with an identical-shape segment: the engines derive the rebin
    # cadence from a vmax sample at run() entry, and a cadence change
    # compiles a new block fn — warming with a different `--warm` count
    # once hid a 60+ s recompile inside the timed segment (measured as a
    # bogus 1.5 s/step on SPC/E)
    sim.run(args.steps, thermo_every=0)
    row = sim.thermo()          # fetch = sync point
    t0 = time.perf_counter()
    sim.run(args.steps, thermo_every=0)   # ends with a sticky-flag fetch
    row = sim.thermo()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "deck": os.path.basename(path), "backend": jax.devices()[0].platform,
        "n_atoms": int(n_atoms), "steps": args.steps,
        "ms_per_step": round(dt / args.steps * 1000.0, 2),
        "atom_steps_per_s": round(n_atoms * args.steps / dt, 1),
        "temp": round(float(row["temp"]), 2),
        "etotal": round(float(row["etotal"]), 3),
    }))


if __name__ == "__main__":
    main()
