"""Pallas TPU kernel: fused ARD/SE Gram construction (+ diagonal nugget).

The Gram build is the framework's second-hottest op after Cholesky
(SURVEY.md §2: every NLML evaluation starts with `kernel(x, x)`); this
kernel fuses in one VMEM pass what XLA emits as matmul + broadcast +
elementwise chain:

    K[i, j] = sv * exp(-0.5 * || x1[i]/ls - x2[j]/ls ||^2)   (+ diag_add on i==j)

Tiling: grid over (n1/B, n2/B) output blocks; each program DMAs one
(B, d) row block of each operand into VMEM, computes the squared
distances via one MXU `pl.dot` plus VPU row/col norms, applies the
exponential on the VPU, and adds the noise/jitter nugget on diagonal
blocks — so Sigma = K + (noise+jitter) I is produced in ONE kernel with
no intermediate n^2 traffic.

Inputs are pre-scaled by the length scales outside the kernel (a cheap
O(n d) op XLA fuses into the producer); d is zero-padded to the 128-lane
boundary by Mosaic automatically.  Falls back to the jnp path for shapes
that do not tile (callers use `ops.kernels` directly in that case).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 256


def _gram_kernel(x1_ref, x2_ref, sv_ref, diag_ref, out_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    a = x1_ref[:]  # (B, d)
    b = x2_ref[:]  # (B, d)
    n1 = jnp.sum(a * a, axis=1, keepdims=True)  # (B, 1)
    n2 = jnp.sum(b * b, axis=1, keepdims=True)  # (B, 1)
    # HIGHEST: the MXU default rounds operands to bf16, which
    # catastrophically cancels the quadratic expansion (measured max err
    # ~0.9 on unit-magnitude Grams at x-norms ~20 — the round-3 on-chip
    # accuracy gate finding that retracted round-2's 0.04/0.13 ms claims).
    # The kernel is HBM-write-bound (n^2 * 4B out), so the f32 multi-pass
    # dot on a (B, d) x (d, B) tile costs nothing measurable.
    cross = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = jnp.maximum(n1 + n2.T - 2.0 * cross, 0.0)
    k = sv_ref[0, 0] * jnp.exp(-0.5 * d2)

    @pl.when(i == j)
    def _():
        B = k.shape[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
        out_ref[:] = k + jnp.where(rows == cols, diag_ref[0, 0], 0.0)

    @pl.when(i != j)
    def _():
        out_ref[:] = k


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def gram_se(
    x1_scaled: jnp.ndarray,
    x2_scaled: jnp.ndarray,
    signal_variance: jnp.ndarray,
    diag_add: jnp.ndarray = 0.0,
    block: int = BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused SE Gram over pre-scaled inputs; shapes must be multiples of
    ``block`` (pad outside; `ops/linalg.py:pad_rows` + mask handles the
    semantics)."""
    n1, d = x1_scaled.shape
    n2 = x2_scaled.shape[0]
    assert n1 % block == 0 and n2 % block == 0, (n1, n2, block)
    sv = jnp.asarray(signal_variance, jnp.float32).reshape(1, 1)
    da = jnp.asarray(diag_add, jnp.float32).reshape(1, 1)
    grid = (n1 // block, n2 // block)
    return pl.pallas_call(
        _gram_kernel,
        out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, block), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x1_scaled.astype(jnp.float32), x2_scaled.astype(jnp.float32), sv, da)


def gram_sigma_ard(
    params: dict,
    x: jnp.ndarray,
    noise: jnp.ndarray,
    jitter: float = 1e-6,
    eps: float = 1e-9,
    block: int = BLOCK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Sigma = ARD-SE Gram + (noise + jitter) I in one fused kernel, for
    n divisible by ``block`` (ARDKernel parametrization,
    `ops/kernels.py:ARDKernel`)."""
    ls = jnp.abs(params["length_scales"]) + eps
    sv = jnp.abs(params["signal_variance"][0])
    xs = x / ls
    return gram_se(
        xs, xs, sv, diag_add=noise + jitter, block=block, interpret=interpret
    )
