"""Measure the CPU baseline for BASELINE.md: run the native C++
implementation of the reference's algorithm (native/baseline_md.cpp —
binned half lists + Newton, buck/coul/long with A&S erfc, order-5 ik
PPPM, NVE) on the north-star silica workload, on THIS machine's CPU.

Prints one JSON line with the measured single-core atom-steps/s plus the
step-0 energy cross-check against the JAX engine (same physics).

Usage: python bench_baseline.py [--steps 10] [--atoms-scale 1]
"""
import argparse
import json
import os
import struct
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))


def build_system():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import yaml

    from lammps_buck_intel_tpu.io import read_data, lattice, velocity
    from lammps_buck_intel_tpu.core import get_units, make_box
    from lammps_buck_intel_tpu.models.kspace import setup_pppm

    with open(os.path.join(ROOT, "examples/decks/silica_pppm.yaml")) as f:
        cfg = yaml.safe_load(f)
    d = read_data(cfg["read_data"])
    x, lo, hi, pa, *_ = lattice.replicate(
        d.x, d.box_lo, d.box_hi, tuple(cfg["replicate"]),
        per_atom={"type": d.type, "q": d.q, "image": d.image},
    )
    typ, q = pa["type"], pa["q"]
    u = get_units("metal")
    n = len(x)
    mass = d.mass
    v = velocity.create(n, cfg["velocity"]["temp"], cfg["velocity"]["seed"],
                        mass[typ], u)
    box = make_box(lo, hi)
    ps = cfg["pair_style"]
    ntypes = len(mass)
    A = np.zeros((ntypes, ntypes))
    rho = np.ones((ntypes, ntypes))
    C = np.zeros((ntypes, ntypes))
    for k, val in ps["coeffs"].items():
        i, j = (int(t) - 1 for t in k.split())
        for (m, arr) in ((0, A), (1, rho), (2, C)):
            arr[i, j] = arr[j, i] = val[m]
    pm = setup_pppm(box, q, cutoff=ps["cut"],
                    accuracy_rel=cfg["kspace_style"]["accuracy"],
                    qqrd2e=u.qqrd2e)
    return dict(n=n, ntypes=ntypes, box=np.asarray(hi) - np.asarray(lo),
                x=np.asarray(x) - np.asarray(lo), v=v, q=q, typ=typ,
                A=A, rho=rho, C=C, cut=float(ps["cut"]),
                cut_coul=float(ps.get("cut_coul", ps["cut"])),
                g_ewald=pm.g_ewald, qqrd2e=u.qqrd2e,
                dt=float(cfg["timestep"]), mass=mass, grid=pm.grid)


def write_bin(path, s):
    with open(path, "wb") as f:
        f.write(struct.pack("ii", s["n"], s["ntypes"]))
        f.write(np.asarray(s["box"], np.float64).tobytes())
        f.write(np.asarray(s["x"], np.float64).tobytes())
        f.write(np.asarray(s["v"], np.float64).tobytes())
        f.write(np.asarray(s["q"], np.float64).tobytes())
        f.write(np.asarray(s["typ"], np.int32).tobytes())
        for k in ("A", "rho", "C"):
            f.write(np.asarray(s[k], np.float64).tobytes())
        f.write(struct.pack("ddddd", s["cut"], s["cut_coul"],
                            s["g_ewald"], s["qqrd2e"], s["dt"]))
        f.write(np.asarray(s["mass"], np.float64).tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    exe = os.path.join(ROOT, "native", "baseline_md")
    if not os.path.exists(exe):
        subprocess.check_call(
            ["g++", "-O3", "-march=native", "-std=c++17", "-o", exe,
             os.path.join(ROOT, "native", "baseline_md.cpp"), "-lm"])
    s = build_system()
    binp = os.path.join(ROOT, "native", "_baseline_sys.bin")
    write_bin(binp, s)

    # pow2-padded FFT grid >= the accuracy-driven grid per axis
    def pow2(v):
        g = 1
        while g < v:
            g *= 2
        return g

    grid = [pow2(v) for v in s["grid"]]
    out = subprocess.run(
        [exe, binp, str(args.steps)] + [str(g) for g in grid],
        capture_output=True, text=True)
    sys.stderr.write(out.stderr)
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    rec["hardware"] = open("/proc/cpuinfo").read().split(
        "model name\t: ")[1].split("\n")[0]
    rec["cores_used"] = 1
    rec["accuracy_grid"] = list(s["grid"])
    rec["fft_grid"] = grid
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
