"""Pallas backend probing / selection.

``resolve_backend("auto")`` returns ``"pallas"`` only when the default
backend is a TPU whose Mosaic pipeline actually compiles (probed once
with a trivial kernel, cached) — anything else gets the XLA composite.
``DDDMR_PALLAS=0`` force-disables Pallas regardless.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

VALID = ("auto", "xla", "pallas", "pallas_interpret")


@functools.cache
def pallas_supported() -> bool:
    if os.environ.get("DDDMR_PALLAS", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    try:
        from jax.experimental import pallas as pl

        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 2.0

        x = jnp.ones((8, 128), jnp.float32)
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
        jax.block_until_ready(out)
        return True
    except Exception:
        return False


def resolve_backend(backend: str) -> str:
    """auto → pallas|xla; pass-through otherwise."""
    if backend not in VALID:
        raise ValueError(f"backend must be one of {VALID}, got {backend!r}")
    if backend == "auto":
        return "pallas" if pallas_supported() else "xla"
    return backend
