"""Shared helpers for the Pallas kernels."""

from __future__ import annotations


def cdiv(a: int, b: int) -> int:
    return (a + b - 1) // b
