"""Pair-phase ALU A/B: is the silica pair kernel transcendental-bound?

Times three variants of the Newton half-stencil pair pass on the north-star
state (259k silica, buck/coul/long), all identical in data movement:

  exact  — the production pair_terms (exp, erfc poly, sqrt, div)
  poly   — a cost-realistic stand-in for a fitted force polynomial:
           two degree-12 Horner chains in rsq (per-type coefficient
           selects reused from the COEF planes), no transcendentals.
           NOT physical — this measures the CEILING of the fitted-
           polynomial optimization before investing in the fitting.
  floor  — fscalar = 1e-3*rsq: the data-movement floor (tiles, gathers,
           masks, reductions); no ALU optimization can beat this.

Usage:  python tools/pair_alu_ab.py            (TPU via the axon tunnel)
Writes one JSON line with ms per pair pass for each variant.
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np
import yaml

from lammps_buck_intel_tpu.run import build_simulation
from lammps_buck_intel_tpu.utils.profiler import _honest_ms
from lammps_buck_intel_tpu.models.pair import cellpair as cp


def pair_only_fn(sim):
    def pair_only(st):
        spp = sim._slot_specials(st)
        rr = cp.compute_cellpair(
            sim.pair, sim.grid, sim.box, st, eflag=False, vflag=False,
            acc_dtype=sim.precision.acc,
            slot_special_idx=spp[0], slot_special_code=spp[1],
        )
        flt = st.x.dtype
        return st._replace(x=st.x + 0.0 * rr.fx.astype(flt),
                           y=st.y + 0.0 * rr.fy.astype(flt),
                           z=st.z + 0.0 * rr.fz.astype(flt))
    return pair_only


def poly_terms(style, rsq, coef, qi, qj, f_lj, f_coul, *, eflag):
    t = rsq * 0.01
    names = ("c1", "e0", "e1", "rhoinv", "cut_ljsq", "offset",
             "cut_coulsq", "c0", "c1", "e0", "e1", "rhoinv")
    acc = coef["c0"]
    for k in names:                      # degree-12 Horner, per-type coefs
        acc = acc * t + coef[k]
    qq = float(style.qqrd2e) * qi * qj
    acc2 = t
    for k in range(12):                  # degree-12 Horner, scalar coefs
        acc2 = acc2 * t + (0.017 * (k + 1))
    zero = jnp.zeros_like(rsq)
    fscalar = (jnp.where(rsq < coef["cut_ljsq"], acc, zero)
               + jnp.where(rsq < coef["cut_coulsq"], qq * acc2, zero))
    if not eflag:
        return fscalar, None, None
    return fscalar, fscalar, fscalar


def floor_terms(style, rsq, coef, qi, qj, f_lj, f_coul, *, eflag):
    fscalar = 1e-3 * rsq + 1e-6 * qi * qj
    if not eflag:
        return fscalar, None, None
    return fscalar, fscalar, fscalar


def main():
    deck = os.environ.get("BENCH_DECK") or os.path.join(
        ROOT, "examples", "decks", "silica_pppm.yaml")
    with open(deck) as f:
        cfg = yaml.safe_load(f)
    for k in ("dump", "write_restart", "write_data", "run", "thermo"):
        cfg.pop(k, None)
    sim = build_simulation(cfg)
    fn = pair_only_fn(sim)

    out = {"deck": os.path.basename(deck), "platform": jax.devices()[0].platform}
    real_terms = cp.pair_terms
    try:
        for name, terms in (("exact", real_terms), ("poly", poly_terms),
                            ("floor", floor_terms)):
            cp.pair_terms = terms
            out[name + "_ms"] = round(_honest_ms(fn, sim.state, 10, 3), 3)
            print(f"# {name}: {out[name + '_ms']} ms", file=sys.stderr)
    finally:
        cp.pair_terms = real_terms
    print(json.dumps(out))


if __name__ == "__main__":
    main()
