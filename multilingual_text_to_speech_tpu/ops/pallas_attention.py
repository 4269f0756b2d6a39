"""Pallas TPU kernel: fused location-sensitive attention step.

One decoder step of Tacotron 2 attention (reference math:
/root/reference/modules/attention.py:39-45,67-86) fuses five XLA ops —
location conv (k=31) over cumulative weights, location projection, energy
tanh+dot, masked softmax, and the context matvec — into a single
VMEM-resident kernel.  Inside the AR scan this removes the intermediate
``[B, T, C]`` / ``[B, T, A]`` HBM round-trips that dominate the step's
memory traffic at serving batch sizes.

Layout: grid over batch tiles; each program holds its ``[Bt, T]`` weight
rows, ``[Bt, T, A]`` memory projection and ``[Bt, T, M]`` memory tile in
VMEM.  T is padded to the 128-lane register width by the caller.

MEASURED (TPU v5e, flagship model, batch 240, chunk 128): the fused kernel
reaches 0.30M mel frames/s vs ~1.4M for XLA's own fusion of the scan body —
XLA already keeps these intermediates fused, and the kernel's per-step
pallas_call overhead plus the unrolled 31-shift conv lose.  Kept as a
correct, tested kernel (``hp.use_pallas_attention``, default OFF) and as
groundwork for a full fused decoder-chunk kernel with DMA-pipelined weights,
which is where a hand kernel can actually beat XLA (weight streaming is the
roofline, ~29us/step at batch 240).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_step_kernel(
    query_ref,        # [Bt, A]    f32 (pre-projected query W_q h + bias)
    memory_ref,       # [Bt, T, M] compute dtype
    mt_ref,           # [Bt, T, A] compute dtype (memory transform)
    cum_ref,          # [Bt, T]    f32 cumulative weights
    mask_ref,         # [Bt, T]    f32 (1 valid / 0 pad)
    loc_filter_ref,   # [K, C]     f32 location conv filter
    wl_ref,           # [C, A]     f32 location projection
    v_ref,            # [A, 1]     f32 energy vector
    ctx_ref,          # [Bt, M]    f32 out
    weights_ref,      # [Bt, T]    f32 out
    new_cum_ref,      # [Bt, T]    f32 out
    *,
    kernel_size: int,
):
    cum = cum_ref[:]                                  # [Bt, T]
    bt, t = cum.shape
    half = (kernel_size - 1) // 2

    # location features: 1-D 'same' conv over T expressed as a sum of
    # shifted copies — K static shifts on the VPU, no HBM round-trip
    k_c = loc_filter_ref[:]                           # [K, C]
    col = jax.lax.broadcasted_iota(jnp.int32, (bt, t), 1)
    loc = jnp.zeros((bt, t, k_c.shape[1]), jnp.float32)
    for k in range(kernel_size):
        off = k - half
        # rotate left by `off` == rotate right by (-off mod T); roll
        # requires a non-negative static shift
        shifted = pltpu.roll(cum, (-off) % t, 1)
        valid = (col + off >= 0) & (col + off < t)
        shifted = jnp.where(valid, shifted, 0.0)
        loc += shifted[..., None] * k_c[k][None, None, :]

    # energy = v . tanh(q + mt + loc @ Wl)   (bias folded into q)
    loc_proj = jax.lax.dot_general(
        loc, wl_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # [Bt, T, A]
    e = jnp.tanh(
        query_ref[:][:, None, :] + mt_ref[:].astype(jnp.float32) + loc_proj
    )
    energy = jax.lax.dot_general(
        e, v_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[..., 0]                                          # [Bt, T]

    # masked softmax
    mask = mask_ref[:]
    energy = jnp.where(mask > 0, energy, -1e9)
    energy = energy - jnp.max(energy, axis=1, keepdims=True)
    num = jnp.exp(energy)
    weights = num / jnp.sum(num, axis=1, keepdims=True)

    # context = weights @ memory
    ctx_ref[:] = jax.lax.dot_general(
        weights[:, None, :], memory_ref[:].astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )[:, 0, :]
    weights_ref[:] = weights
    new_cum_ref[:] = cum + weights


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "batch_tile", "interpret"),
)
def fused_attention_step(
    query: jnp.ndarray,       # [B, A] f32 — W_q h + bias, pre-projected
    memory: jnp.ndarray,      # [B, T, M]
    memory_transform: jnp.ndarray,  # [B, T, A]
    cum_weights: jnp.ndarray, # [B, T] f32
    mask: jnp.ndarray,        # [B, T] bool
    loc_filter: jnp.ndarray,  # [K, C] f32
    wl: jnp.ndarray,          # [C, A] f32
    v: jnp.ndarray,           # [A, 1] f32
    *,
    kernel_size: int,
    batch_tile: int = 8,
    interpret: bool = False,
):
    """Returns (context [B, M] f32, weights [B, T] f32, new_cum [B, T] f32)."""
    b, t, m = memory.shape
    a = query.shape[-1]
    bt = min(batch_tile, b)
    while b % bt != 0:
        bt -= 1
    grid = (b // bt,)

    def idx2(i):
        return (i, 0)

    def idx3(i):
        return (i, 0, 0)

    return pl.pallas_call(
        functools.partial(_attention_step_kernel, kernel_size=kernel_size),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, a), idx2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t, m), idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t, a), idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t), idx2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t), idx2, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (loc_filter.shape[0], loc_filter.shape[1]),
                lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wl.shape[0], a), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, m), idx2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t), idx2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, t), idx2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m), jnp.float32),
            jax.ShapeDtypeStruct((b, t), jnp.float32),
            jax.ShapeDtypeStruct((b, t), jnp.float32),
        ],
        interpret=interpret,
    )(
        query.astype(jnp.float32),
        memory,
        memory_transform,
        cum_weights.astype(jnp.float32),
        mask.astype(jnp.float32),
        loc_filter.astype(jnp.float32),
        wl.astype(jnp.float32),
        v.astype(jnp.float32),
    )
