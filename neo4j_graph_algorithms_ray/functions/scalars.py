"""Scalar user functions — algo.isFinite / isInfinite / Infinity / NaN
parity (algo/.../IsFiniteFunc.java:27-45), as vectorized pyarrow
kernels for use inside map_batches."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.compute as pc


def is_finite(arr):
    """True for finite numbers; null/NaN/±inf → False (the reference
    treats null as not finite)."""
    v = pc.is_finite(arr)
    return pc.fill_null(v, False)


def is_infinite(arr):
    v = pc.is_inf(arr)
    return pc.fill_null(v, False)


def infinity() -> float:
    return math.inf


def nan() -> float:
    return math.nan
