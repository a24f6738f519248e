"""Precision policy — the TPU analog of the reference's precision templating.

The reference compiles every kernel three ways, ``template<flt_t, acc_t>`` in
single (float,float), mixed (float,double) and double (double,double) modes,
selected at runtime from ``fix->precision()``
(/root/reference/pair_buck_intel.cpp:48-62, pppm_intel.cpp:170-179).

On TPU the analog is a dtype policy threaded through array construction:
``flt`` is the per-pair compute dtype, ``acc`` the accumulation dtype for
forces/energies/virials.  f64 is only available when x64 is enabled (CPU
testing); on-device production mode is SINGLE (f32/f32).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    name: str
    flt: jnp.dtype  # pair/grid compute dtype
    acc: jnp.dtype  # force / energy / virial accumulation dtype
    # compensated=True: positions/velocities integrate with Neumaier
    # two-float accumulation (integrate/nve.py two_sum_acc) — the
    # on-hardware analog of f64 accumulation where no f64 exists (TPU).
    # Honored by BOTH the neighbor-list and the production cell-slot
    # engine (residual planes ride the rebin permutation,
    # neighbor/cell_slots.py SlotState.comp); triclinic cellpair falls
    # back to nlist (the lamda wrap would destroy the two-float split).
    compensated: bool = False

    def __post_init__(self):
        if self.acc == jnp.float64 or self.flt == jnp.float64:
            if not jax.config.read("jax_enable_x64"):
                raise ValueError(
                    f"precision mode {self.name!r} needs jax_enable_x64=True"
                )


def single() -> Precision:
    return Precision("single", jnp.dtype(jnp.float32), jnp.dtype(jnp.float32))


def mixed() -> Precision:
    """The reference's mixed mode (f32 compute, f64 accumulate —
    pair_buck_intel.cpp:50-52).  With x64 available (CPU tests) that is
    literal; on f32-only hardware (TPU) the accumulated state instead
    carries two-float compensation planes, which removes the secular
    integration drift the f64 accumulators exist for."""
    if jax.config.read("jax_enable_x64"):
        return Precision("mixed", jnp.dtype(jnp.float32),
                         jnp.dtype(jnp.float64))
    return Precision("mixed", jnp.dtype(jnp.float32), jnp.dtype(jnp.float32),
                     compensated=True)


def double() -> Precision:
    return Precision("double", jnp.dtype(jnp.float64), jnp.dtype(jnp.float64))


def single_comp() -> Precision:
    """f32 everywhere + compensated integration — the forced-two-float
    variant of ``mixed`` (what ``mixed`` resolves to on TPU), selectable
    directly so CPU tests can exercise it under x64."""
    return Precision("single_comp", jnp.dtype(jnp.float32),
                     jnp.dtype(jnp.float32), compensated=True)


def get_precision(name: str) -> Precision:
    try:
        return {"single": single, "mixed": mixed, "double": double,
                "single_comp": single_comp}[name]()
    except KeyError:
        raise ValueError(f"unknown precision mode {name!r}") from None
