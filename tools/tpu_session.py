"""One-shot TPU work batch: run everything that needs real hardware.

Usage (when the tunneled TPU is reachable):

    timeout 5400 python tools/tpu_session.py [stage ...]

Stages (default: all, in this order):
  bench    — bench.py north-star number (prints the JSON line)
  phases   — per-phase breakdown on the north-star deck (profiler)
  goldens  — record long-horizon thermo traces (tools/record_goldens.py)

Each stage is independent and failures don't stop the batch — the point is
to harvest as much hardware signal as one tunnel session allows.
"""
import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def stage_bench():
    import subprocess

    out = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                         capture_output=True, text=True, timeout=3600)
    print(out.stdout.strip())
    if out.returncode:
        print(out.stderr[-2000:])


def stage_phases():
    import jax
    import yaml

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from lammps_buck_intel_tpu.run import build_simulation
    from lammps_buck_intel_tpu.utils.profiler import profile_phases

    with open(os.path.join(ROOT, "examples", "decks",
                           "silica_pppm.yaml")) as f:
        cfg = yaml.safe_load(f)
    sim = build_simulation(cfg)
    sim.run(20, log=False)
    print("phases (ms):", json.dumps(profile_phases(sim)))


def stage_goldens():
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "record_goldens.py")],
        capture_output=True, text=True, timeout=5400)
    print(out.stdout)
    if out.returncode:
        print(out.stderr[-3000:])


STAGES = {"bench": stage_bench, "phases": stage_phases,
          "goldens": stage_goldens}


if __name__ == "__main__":
    names = sys.argv[1:] or ["bench", "phases", "goldens"]
    for nm in names:
        print(f"=== {nm} === {time.strftime('%H:%M:%S')}")
        try:
            STAGES[nm]()
        except Exception:
            traceback.print_exc()
    print("=== done ===", time.strftime("%H:%M:%S"))
