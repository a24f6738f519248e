"""Roofline / %-of-peak accounting for the north-star phases (VERDICT r4
weak #8: bound the measured phase times against the CHIP, not just the
CPU baseline).

For each hot phase this computes the per-step data volume and FLOP count
from the PRODUCTION engine's actual shapes (grid, cap, stencil, patch
extents), measures the phase wall time with the honest chained-timing
harness, and prints ms vs the HBM-bandwidth floor and the MXU/VPU
ceiling.  Peaks are the public TPU v5e datasheet numbers:

  HBM   819 GB/s
  MXU   197 TFLOP/s bf16 (f32 matmul runs ~1/4 of that on this class)

The VPU has no published peak; the pair phase is therefore bounded by
its measured data-movement floor (tools/pair_alu_ab.py: physics replaced
by one FMA) plus the HBM floor computed here.

Usage:  python tools/roofline.py   (on the TPU; ~2 min)
"""
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HBM_GBS = 819.0          # v5e datasheet
MXU_BF16_TFLOPS = 197.0  # v5e datasheet
MXU_F32_TFLOPS = MXU_BF16_TFLOPS / 4.0  # f32 pass class


def main():
    import jax
    import jax.numpy as jnp
    import yaml

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from lammps_buck_intel_tpu.run import build_simulation
    from lammps_buck_intel_tpu.utils.profiler import profile_phases

    with open(os.path.join(ROOT, "examples/decks/silica_pppm.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["run"] = 0
    sim = build_simulation(cfg)
    n = sim.n_atoms
    grid = sim.grid
    cap = grid.cap
    ncell = grid.ncell
    K = 9 * grid.reach_z + 5       # Newton half-stencil offsets
    t = profile_phases(sim, nscan=10, reps=3)

    out = {"n_atoms": n, "nc": list(grid.nc), "cap": cap,
           "reach_z": grid.reach_z, "phases_ms": {k: round(v, 2)
                                                  for k, v in t.items()}}

    # ---- pair phase ----
    # Traffic per step (f32 = 4 B): the fused kernel materializes, per
    # i-cell, the K pre-shifted j-cell planes of (x, y, z, q, typ->coef
    # select feeds) and reduces forces.  Count the dominant streams:
    # j-planes K*cap per cell x 4 planes read, i-planes cap x ~6, force
    # writes cap x 3.  (XLA fuses the physics into the j-plane sweep, so
    # each j element is read O(1) times from HBM/VMEM.)
    bytes_pair = ncell * (K * cap * 4 + cap * 6 + cap * 3) * 4
    # FLOPs: ~60/pair-slot (min image 9, rsq 5, buck exp ~20, erfc poly
    # ~15, force/energy FMAs ~11) over ALL padded slots
    flops_pair = ncell * cap * K * cap * 60.0
    hbm_floor_pair = bytes_pair / (HBM_GBS * 1e9) * 1e3
    out["pair"] = dict(
        gb_per_step=round(bytes_pair / 1e9, 3),
        gflop_per_step=round(flops_pair / 1e9, 1),
        hbm_floor_ms=round(hbm_floor_pair, 2),
        measured_ms=t.get("pair"),
        x_over_hbm_floor=round(t.get("pair", 0) / hbm_floor_pair, 1),
    )

    # ---- kspace phase (cell-patch zblock PPPM) ----
    ks = sim.kspace
    pm = ks.pm
    ps = ks.ps
    kgrid = ks.grid
    P = ps.P
    ngrid = int(np.prod(pm.grid))
    nzh = pm.grid[2] // 2 + 1
    # deposit + gather patch contractions: per cell, the (cap, Px) x
    # (Px, Py*Pz)-class matmul chains, 1x deposit + 3x (ik) gather
    mm_flops = kgrid.ncell * cap * (P[0] * P[1] * P[2]) * 2.0 * 4
    # FFTs: rfftn + 3 irfftn of the (nx, ny, nz) mesh
    fft_flops = 4 * 5.0 * ngrid * np.log2(max(ngrid, 2))
    # mesh traffic: deposit write + spectral read/write + 3 E-meshes
    # read through patches
    bytes_k = (ngrid * 4 * 2            # deposit accumulate
               + ngrid * 4 * 2 * 2      # fft in/out (half spectrum c64)
               + 3 * ngrid * 4 * 2      # 3 inverse ffts
               + 3 * kgrid.ncell * P[0] * P[1] * P[2] * 4)  # patch reads
    out["kspace"] = dict(
        grid=list(pm.grid), patch=list(P),
        gb_per_step=round(bytes_k / 1e9, 3),
        mxu_gflop_per_step=round(mm_flops / 1e9, 1),
        fft_gflop_per_step=round(fft_flops / 1e9, 1),
        hbm_floor_ms=round(bytes_k / (HBM_GBS * 1e9) * 1e3, 2),
        mxu_floor_ms=round(mm_flops / (MXU_F32_TFLOPS * 1e12) * 1e3, 2),
        measured_ms=t.get("kspace"),
    )

    # ---- rebin (amortized) ----
    bytes_rebin = 17 * grid.nslots * 4 * 2   # all slot planes r+w
    out["rebin"] = dict(
        gb_per_rebuild=round(bytes_rebin / 1e9, 3),
        hbm_floor_ms=round(bytes_rebin / (HBM_GBS * 1e9) * 1e3, 2),
        measured_ms=t.get("rebin"),
    )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
