"""Sub-phase timing of the cell-patch PPPM pipeline on hardware.

Phases: weights (B-spline evaluation), deposit (columns transfer +
fold), ffts (rfftn + spectral multiply + batched irfftn), gather
(columns field interpolation).  Honest chained timing (profiler rules).
"""
import os, sys, yaml
os.environ.setdefault("JAX_PLATFORMS", "axon")
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from lammps_buck_intel_tpu.run import build_simulation
from lammps_buck_intel_tpu.utils.profiler import _honest_ms
from lammps_buck_intel_tpu.models.kspace import pppm_cells as pc

cfg = yaml.safe_load(open(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples", "decks", "silica_pppm.yaml")))
sim = build_simulation(cfg)
ks = sim.kspace
pm, ps, cs_, grid = ks.pm, ks.ps, ks.cspec, ks.grid
print("pppm grid", pm.grid, "P", ps.P, "S", ps.S, "cells", grid)
st = sim.state

def chain(s, val):
    return s._replace(x=s.x + 0.0 * jnp.sum(val).astype(s.x.dtype))

def weights_only(s):
    w = pc._axis_weights(pm, ps, grid, s.x, 0)
    w2 = pc._axis_weights(pm, ps, grid, s.y, 1)
    wz = pc._wz_rows(pm, ps, grid, s.z)
    return chain(s, jnp.sum(w) + jnp.sum(w2) + jnp.sum(wz))

def deposit_only(s):
    mesh = pc.deposit_rho_columns(pm, ps, cs_, grid, s, ks.ax_mats)
    return chain(s, jnp.sum(mesh))

def fft_only(s):
    mesh = s.q.reshape(pm.grid[0] // ps.S[0] * grid.nc[1] * 0 + 1, -1)  # unused
    # build a mesh-shaped tensor from state cheaply (reuse q tiled)
    m = jnp.zeros(pm.grid, jnp.float32).at[0, 0, 0].set(jnp.sum(s.q))
    rhat = jnp.fft.rfftn(m)
    G = jnp.asarray(pm.greensfn[..., : pm.grid[2] // 2 + 1], jnp.float32)
    phi = G * rhat
    nzh = pm.grid[2] // 2 + 1
    kx = jnp.asarray(pm.kx, jnp.float32)[:, None, None]
    ky = jnp.asarray(pm.ky, jnp.float32)[None, :, None]
    kz = jnp.asarray(pm.kz[:nzh], jnp.float32)[None, None, :]
    ehat = jnp.stack([(-1j) * k * phi for k in (kx, ky, kz)])
    e = jnp.fft.irfftn(ehat, s=pm.grid, axes=(1, 2, 3))
    return chain(s, jnp.sum(e))

def gather_only(s):
    m = jnp.zeros((3,) + pm.grid, jnp.float32) + s.q[0]
    f = pc.gather_columns(pm, ps, cs_, grid, s, list(m), ks.ax_mats)
    return chain(s, sum(jnp.sum(v) for v in f))

def full_kspace(s):
    fx, fy, fz, e, v = ks.compute_slots(s, False, False)
    return chain(s, jnp.sum(fx) + jnp.sum(fy) + jnp.sum(fz))

for name, fn in [("weights", weights_only), ("deposit", deposit_only),
                 ("ffts", fft_only), ("gather", gather_only),
                 ("full", full_kspace)]:
    print(name, round(_honest_ms(fn, st), 2), flush=True)
