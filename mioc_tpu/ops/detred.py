"""Batch-invariant (vmap-stable) reductions: balanced fold trees.

On TPU, XLA lowers a lane-axis ``jnp.sum`` / a matvec differently depending
on whether the op is batched: measured on v5e (benchmarks/pde_batch_bitexact
probe, round 4), ``jax.vmap`` of a (545,545) matvec and of a (501,)-sum both
change the f32 result bits per lane, while ELEMENTWISE ops are trivially
per-lane stable.  These helpers therefore build every reduction as a fixed
balanced fold tree of elementwise adds (pad to a power of two with exact
``+0.0`` terms, halve repeatedly) — ``jax.vmap(detsum)(x)[k]`` is
bit-identical to ``detsum(x[k])`` by construction, at ~2× the elementwise op
count of the native reduction (irrelevant off the MXU; the VPU covers a
545² fold in ~0.15 µs).

This is what makes the speculative trial wave's batched PDE sweeps
bit-match the sequential device loop (trm_device.py): the dense-mode sweeps
(:mod:`..objectives.pde`), the TV functional (:mod:`.tv`) and the TRM
decision reductions all reduce through these trees.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["detsum", "detsum_all", "detdot", "detmatvec"]


def detsum(x, axis: int = -1):
    """Sum along ``axis`` as a balanced fold tree of elementwise adds.

    Bit-stable under ``jax.vmap`` (see module docstring); the tree shape
    depends only on the (static) axis length, so the same length always
    accumulates in the same order.
    """
    x = jnp.moveaxis(jnp.asarray(x), axis, -1)
    n = x.shape[-1]
    if n == 0:
        return jnp.zeros(x.shape[:-1], x.dtype)
    m = 1 << (n - 1).bit_length()  # next power of two
    if m != n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, m - n)]
        x = jnp.pad(x, pad)
    while x.shape[-1] > 1:
        h = x.shape[-1] // 2
        x = x[..., :h] + x[..., h:]
    return x[..., 0]


def detsum_all(x):
    """Full reduction with a fixed tree: flatten, then :func:`detsum`."""
    x = jnp.asarray(x)
    return detsum(x.reshape(-1), axis=-1)


def detdot(a, b):
    """Batch-stable inner product of two 1-D vectors."""
    return detsum(a * b, axis=-1)


def detmatvec(A, x):
    """Batch-stable dense matvec ``A @ x``: row-wise products + fold tree.

    ``A (N, M)``, ``x (M,)`` → ``(N,)``.  Everything is elementwise, so
    ``jax.vmap`` over ``x`` reproduces each lane's single-call bits — unlike
    the MXU matmul, whose accumulation order changes with the batch shape.
    """
    return detsum(A * x[..., None, :], axis=-1)
