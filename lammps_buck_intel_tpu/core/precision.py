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

    def __post_init__(self):
        if self.acc == jnp.float64 or self.flt == jnp.float64:
            if not jax.config.read("jax_enable_x64"):
                raise ValueError(
                    f"precision mode {self.name!r} needs jax_enable_x64=True"
                )


def single() -> Precision:
    return Precision("single", jnp.dtype(jnp.float32), jnp.dtype(jnp.float32))


def mixed() -> Precision:
    """f32 pair math, f64 accumulation (CPU/x64 only)."""
    return Precision("mixed", jnp.dtype(jnp.float32), jnp.dtype(jnp.float64))


def double() -> Precision:
    return Precision("double", jnp.dtype(jnp.float64), jnp.dtype(jnp.float64))


def get_precision(name: str) -> Precision:
    try:
        return {"single": single, "mixed": mixed, "double": double}[name]()
    except KeyError:
        raise ValueError(f"unknown precision mode {name!r}") from None
