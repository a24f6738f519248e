"""Decompose clustered-SHAKE cost on the live backend at deck scale.

Times, per call (honest chained timing):
  gather   — the 9 plane gathers (x_old/x_new/v at rows)
  iters    — the SOR fori_loop on pre-gathered locals (no gather/scatter)
  scatter3 — the 3 component-plane scatter-adds
  scatter1 — a fused single (N, 3) scatter-add (candidate optimization)
  shake    — full shake_positions_clustered
  rattle   — full rattle_velocities_clustered
  step     — the engine's full production step block, and the same with
             SHAKE disabled (the difference is SHAKE's true in-step cost)

Usage:  python tools/shake_ab.py [deck.yaml]   (default spce.yaml)
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp
import numpy as np
import yaml

from lammps_buck_intel_tpu.run import build_simulation
from lammps_buck_intel_tpu.utils.profiler import _honest_ms
from lammps_buck_intel_tpu.integrate import shake as shk


def main():
    deck = sys.argv[1] if len(sys.argv) > 1 else "spce.yaml"
    path = deck if os.path.exists(deck) else os.path.join(
        ROOT, "examples", "decks", deck)
    with open(path) as f:
        cfg = yaml.safe_load(f)
    for k in ("dump", "write_restart", "write_data", "run", "thermo"):
        cfg.pop(k, None)
    sim = build_simulation(cfg)
    sim.run(5, thermo_every=0)
    st = sim.state
    sc, cl = sim.shake, sim._shake_cl
    rows = jnp.asarray(sim._inv_map(st))[
        jnp.asarray(cl.rows_np(sim.n_atoms))] if hasattr(
        sim, "_inv_map") else jnp.asarray(cl.rows_np(sim.n_atoms))
    L = np.asarray(sim.box.lengths, np.float64)
    M, A = cl.atoms.shape
    out = {"deck": os.path.basename(path), "M": int(M), "A": int(A),
           "C": int(cl.pi.shape[1]),
           "platform": jax.devices()[0].platform}

    xs = (st.x, st.y, st.z)
    vs = (st.vx, st.vy, st.vz)
    flt = st.x.dtype

    # --- gather only
    def g_fn(planes):
        rT = rows.T
        locs = [p[rT] for p in planes] + [p[rT] for p in planes] + \
               [p[rT] for p in planes]
        s = sum(jnp.sum(l) for l in locs).astype(flt)
        return tuple(p + 0.0 * s for p in planes)
    out["gather9_ms"] = round(_honest_ms(g_fn, xs, 10, 3), 2)

    # --- iterations only (pre-gathered)
    Dn, WTn, d2n, cmn, imn, amn, Kn = shk._lanes_last(cl)
    D = jnp.asarray(Dn, flt)
    WT = jnp.asarray(WTn, flt)
    d2T = jnp.asarray(d2n, flt)
    cmaskT = jnp.asarray(cmn, flt)
    invmsT = jnp.asarray(imn, flt)
    omega = float(sc.omega)

    def it_fn(planes):
        rT = rows.T
        xn0 = jnp.stack([p[rT] for p in planes])
        ro = [jnp.einsum("cam,am->cm", D, xn0[c]) for c in range(3)]

        def body(k, carry):
            xn, lam_tot = carry
            rn = [jnp.einsum("cam,am->cm", D, xn[c]) for c in range(3)]
            diff = (rn[0] * rn[0] + rn[1] * rn[1] + rn[2] * rn[2]) - d2T
            den = 2.0 * (rn[0] * ro[0] + rn[1] * ro[1]
                         + rn[2] * ro[2]) * invmsT
            lam = diff / jnp.where(jnp.abs(den) > 1e-12, den, 1e-12)
            lam = lam * cmaskT
            upd = jnp.stack([
                jnp.einsum("cam,cm->am", WT, (omega * lam) * r)
                for r in ro])
            return xn + upd, lam_tot + lam
        xn, lam = jax.lax.fori_loop(
            0, sc.iters, body, (xn0, jnp.zeros(d2T.shape, flt)))
        s = jnp.sum(xn) + jnp.sum(lam)
        return tuple(p + 0.0 * s.astype(flt) for p in planes)
    out["iters_ms"] = round(_honest_ms(it_fn, xs, 10, 3), 2)

    # --- scatter: 3 plane scatters vs 1 fused (N,3)
    flat = rows.reshape(-1)
    dx = jnp.ones((3, A, M), flt)

    def s3_fn(planes):
        outp = [p.at[flat].add(dx[c].T.reshape(-1), mode="drop")
                for c, p in enumerate(planes)]
        return tuple(outp)
    out["scatter3_ms"] = round(_honest_ms(s3_fn, xs, 10, 3), 2)

    def s1_fn(planes):
        stacked = jnp.stack(planes, -1)                     # (N, 3)
        upd = dx.transpose(2, 1, 0).reshape(-1, 3)          # (M*A, 3)
        res = stacked.at[flat].add(upd, mode="drop")
        return (res[:, 0], res[:, 1], res[:, 2])
    out["scatter1_ms"] = round(_honest_ms(s1_fn, xs, 10, 3), 2)

    # --- full calls
    def shake_fn(planes):
        xf, vf = shk.shake_positions_clustered(
            sc, cl, planes, planes, vs, 1.0, L, rows)
        return xf
    out["shake_ms"] = round(_honest_ms(shake_fn, xs, 10, 3), 2)

    def rattle_fn(planes):
        vf = shk.rattle_velocities_clustered(sc, cl, planes, vs, L, rows)
        return tuple(p + 0.0 * jnp.sum(vf[0]).astype(flt)
                     for p in planes)
    out["rattle_ms"] = round(_honest_ms(rattle_fn, xs, 10, 3), 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
