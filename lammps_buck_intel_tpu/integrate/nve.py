"""Velocity-Verlet NVE — the FixNVEIntel analog.

Reference: /root/reference/fix_nve_intel.cpp — initial_integrate (:60-99)
``v += dtfm*f; x += dtv*v`` and final_integrate (:103-127) ``v += dtfm*f``,
with a per-DOF ``_dtfm`` array generalising multi-type / group-masked atoms
(:129-194).  Here the per-DOF array is just ``dtf * ftm2v / mass[type]``
broadcast, and group masking is a multiplicative (N,1) mask (zeroed entries
freeze atoms, exactly the reference's zeroed-dtfm trick).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class NVEParams(NamedTuple):
    """dtv/dtf are python floats and mass_inv host numpy: NVEParams is
    CLOSED OVER by jitted step functions, and closed-over *device* arrays
    poison XLA codegen on this runtime (see core/box.py) — host values are
    baked as literals instead."""

    dtv: float          # dt
    dtf: float          # 0.5 * dt * ftm2v
    mass_inv: object    # (N, 1) numpy, 1/mass per atom, zeroed outside group


def make_nve(dt: float, ftm2v: float, mass_per_atom, group_mask=None,
             dtype=jnp.float32) -> NVEParams:
    import numpy as np
    import jax

    m = np.asarray(jax.device_get(mass_per_atom), np.dtype(dtype))
    minv = 1.0 / m
    if group_mask is not None:
        minv = minv * np.asarray(jax.device_get(group_mask), np.dtype(dtype))
    return NVEParams(
        dtv=float(dt),
        dtf=float(0.5 * dt * ftm2v),
        mass_inv=minv[:, None],
    )


def initial_integrate(p: NVEParams, x, v, f):
    v = v + (p.dtf * p.mass_inv) * f.astype(v.dtype)
    x = x + p.dtv * v
    return x, v


def final_integrate(p: NVEParams, v, f):
    return v + (p.dtf * p.mass_inv) * f.astype(v.dtype)
