"""Shared helpers for the Pallas kernels."""

from __future__ import annotations


def cdiv(a: int, b: int) -> int:
    return (a + b - 1) // b


def pick_row_block(n: int, c: int, itemsize: int,
                   budget: int = 1024 * 1024) -> int:
    """Largest power-of-two row count dividing ``n`` whose [rows, c] block
    stays under ``budget`` bytes.  The default leaves VMEM headroom for
    double buffering plus f32 intermediates (~2x a bf16 block)."""
    bn = 8
    while bn * 2 <= n and n % (bn * 2) == 0 and bn * 2 * c * itemsize <= budget:
        bn *= 2
    return bn
