"""Pallas TPU kernel: the WHOLE autoregressive decoder chunk, fused.

This replaces the XLA ``lax.scan`` inference decode (models/decoder.py) on
the hot serving path.  The reference decodes with a Python frame loop over
two LSTMCells + location-sensitive attention per frame
(/root/reference/modules/tacotron2.py:180-207); the XLA scan already fuses
each step, but profiling (PARITY.md, round 1) showed the step pinned at the
HBM weight-streaming roofline: every one of the thousands of AR steps
re-reads ~33 MB of gate weights plus the attention memory from HBM
(~120 us/step at serving batch 240 on a v5e).

Here ONE ``pallas_call`` runs a whole chunk of steps with

- all decoder weights (prenet, both fused-gate LSTMs, attention operands,
  frame/stop heads) resident in VMEM for the entire chunk,
- the attention memory ``[B, T, M]`` and transposed memory transform
  resident in VMEM (compute dtype),
- a ``fori_loop`` over the chunk's steps whose state (LSTM h/c, context,
  previous frame, cumulative attention weights) lives in the kernel's
  output refs and never leaves VMEM,
- only the per-step mel frames / stop logits written back to HBM.

Weights are thus read from HBM once per CHUNK instead of once per STEP —
at chunk 128 a 128x cut in weight traffic, turning the step from
memory-bound into MXU compute-bound.

Mosaic-shaped design notes (each of these was measured, not guessed):

- Mosaic lowers ops value-at-a-time; large intermediates live in vector
  registers and spill.  v1 of this kernel kept the f32 ``[B, T, A]``
  attention chain + a 31-shift im2col as live values and drowned in 110 MB
  of register-allocator spill slots.  v3 keeps every big intermediate in
  the compute dtype and in flat 2-D layouts.
- The location conv (+ location projection) is folded into one plain 2-D
  matmul in an A-major flattened ``[B, A*T]`` layout: ``loc = cum @ Band``
  — MXU work, no 3-D dots (a 3-D-rhs dot lowers to T separate tiny
  matmuls) and no im2col shuffling.  The query broadcast and the
  v-reduction originally were folded matmuls too (``q @ E``, ``tanh(z) @
  R``); round-3 ablation showed the stage VMEM-traffic bound on those 4 MB
  operand streams, so they now run as VPU lane-broadcasts + a pairwise
  tree sum (76.1 -> 75.0 us/step at T=128; 196.5 -> 177.6 at T=512, where
  the freed VMEM also buys larger batch blocks).
- The two fused-gate LSTM matmuls read from concat scratch buffers whose
  segments are 128-lane aligned (weight rows zero-padded to match), so each
  step runs ONE large gate matmul per cell instead of three partial ones.
- Loop state lives in output refs, not ``fori_loop`` carries — carried
  values cost a copy per iteration.

The always-on prenet dropout (reference quirk, tacotron2.py:40 — active at
inference for output variety) uses a counter-based hash PRNG so compiled
TPU and interpreter runs draw identical masks; zoneout uses its
deterministic eval-mode interpolation, matching models/rnn.py.

Step math mirrored from models/decoder.py::DecoderCell (reference loop
body, tacotron2.py:180-198) and models/attention.py (reference
modules/attention.py:39-156); parity vs the XLA scan is asserted in
tests/test_pallas_decoder.py.  All three attention families run fused
(round 3): location-sensitive folds the location conv into banded matmuls;
the forward family (forward / forward_transition_agent) replaces the conv
fold with a static [T, T] superdiagonal shift matmul for the monotonic
recurrence ``(prev + shift(prev)) * softmax(e)`` — the energy softmax is
UNMASKED over the bucketed length like the reference, the sample mask
applies afterwards as zero + 1e-6 clamp + L1 renorm, and the transition
agent's probability is carried as a lane-replicated [BB, 128] row updated
by three tiny replicated-column matmuls.  Prenet depth is a parameter
(any >= 1).

Set ``PALLAS_DEC_ABLATE=att_lstm,gen_lstm,attention,ctx`` (any subset) to
profile the kernel with stages stubbed out.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Carry = Dict[str, Any]

_NEG_INF = -1e9
_LANES = 128

def _weight_keys(quantized: bool, n_prenet: int = 2,
                 att_kind: str = "ls"):
    """Bundle entries holding kernel weight operands, in kernel operand
    order.  int8 serving mode adds per-output-column dequant scales for
    the two gate matmuls; the forward-attention transition agent adds its
    three split weight blocks + bias (order must match the kernel's
    operand unpacking)."""
    pre = tuple(k for i in range(n_prenet)
                for k in (f"pre_w{i}", f"pre_b{i}"))
    gates = (("att_w", "att_ws", "att_b", "wq", "gen_w", "gen_ws", "gen_b")
             if quantized else
             ("att_w", "att_b", "wq", "gen_w", "gen_b"))
    ta = (("ta_wc", "ta_wq", "ta_wx", "ta_b")
          if att_kind == "fwd_trans" else ())
    return pre + gates + ("head_w", "head_b") + ta


# hp.attention_type -> the kernel's static attention-kind tag
_ATT_KINDS = {
    "location_sensitive": "ls",
    "forward": "fwd",
    "forward_transition_agent": "fwd_trans",
}


def att_kind_of(hp) -> str:
    return _ATT_KINDS[hp.attention_type]

# Attention-operand layouts by text length:
# - T <= 256: ONE A-major fold — band [T, A*T] (operands grow with T^2,
#   fine up to 256);
# - 256 < T <= _MAX_MEMORY_LEN: T-BLOCKED fold with Tb=128 column blocks —
#   per-block band windows [<=3*Tb, A*Tb] (the location conv is banded:
#   only |s - t| <= half taps are nonzero, so block j only reads cum
#   blocks j-1..j+1); operands grow with T*Tb instead of T^2.
# Plus one shared [1, A*Tb] v-scale row for the VPU energy reduction.
# Above _MAX_MEMORY_LEN (or when the VMEM byte model reports no-fit)
# callers use the XLA scan instead (see supports_shapes/_auto_block_cap).
_MAX_MEMORY_LEN = 512
_SINGLE_FOLD_MAX = 256
_T_BLOCK = 128

_ABLATE = frozenset(
    f for f in os.environ.get("PALLAS_DEC_ABLATE", "").split(",") if f)


def _int8_streams_default() -> bool:
    """Default for int8 memory / memory-transform streaming (the serving
    step's two dominant VMEM streams).  OFF until the kernel variant is
    compile-validated on hardware — opt in with
    ``MTTS_PALLAS_INT8_STREAMS=1`` or ``hp.pallas_decoder_int8_streams``;
    interpret-mode parity is covered by tests/test_pallas_decoder.py."""
    return os.environ.get("MTTS_PALLAS_INT8_STREAMS", "0") == "1"


def _padded_t(t_len: int) -> int:
    """Internal memory length: blocked layouts pad T to a _T_BLOCK multiple
    (padded positions are masked to -inf and contribute nothing)."""
    if t_len <= _SINGLE_FOLD_MAX:
        return t_len
    return -(-t_len // _T_BLOCK) * _T_BLOCK


def _block_windows(t_len: int, t_block: int):
    """Static (w0, w1) cum-read windows per column block: the banded
    location conv (half-width < t_block) only needs blocks j-1..j+1."""
    n_b = t_len // t_block
    return [
        (max(j - 1, 0) * t_block, min(j + 2, n_b) * t_block)
        for j in range(n_b)
    ]


def supports(hp) -> bool:
    """True if the fused kernel covers this configuration; otherwise the
    caller should stay on the XLA scan path.

    All three attention families are covered (location-sensitive with the
    banded conv fold; forward / forward-with-transition-agent with a
    shift-matrix recurrence, reference modules/attention.py:89-156) at any
    prenet depth."""
    return (
        hp.attention_type in _ATT_KINDS
        and int(getattr(hp, "prenet_layers", 2)) >= 1
        and hp.decoder_regularization in ("zoneout", "dropout")
    )


def supports_shapes(memory_len: int) -> bool:
    """Per-call shape gate (text length after bucketing)."""
    return memory_len <= _MAX_MEMORY_LEN


def _rand_bits(shape, seed0, seed1, salt):
    """Counter-based uint32 hash (lowbias32) keyed by (seed, salt) — the
    shared PRNG of the serving and training kernels; compiled TPU and
    interpreter runs draw identical masks, and the training backward pass
    regenerates its forward masks bit-exactly from the same inputs."""
    x = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
         * jnp.uint32(shape[-1])
         + jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1))
    x = x + seed0 + salt.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
    x = x ^ (seed1 * jnp.uint32(0x85EBCA6B))
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _r128(n: int) -> int:
    return -(-n // _LANES) * _LANES


def _q_broadcast(q, t_block: int, att_dim: int):
    """Lane-broadcast each q[:, a] over its Tb-lane chunk of the A-major
    flattened layout (2-D ops only: Mosaic cannot lower 3-D reshapes)."""
    return jnp.concatenate(
        [jnp.broadcast_to(q[:, a:a + 1], (q.shape[0], t_block))
         for a in range(att_dim)], axis=1)


def _tile_lanes(x, t_len: int):
    """[BB, 128] lane-replicated row -> [BB, t_len] (2-D concat + prefix
    slice only — Mosaic cannot lower 3-D broadcasts)."""
    reps = -(-t_len // _LANES)
    full = x if reps == 1 else jnp.concatenate([x] * reps, axis=1)
    return full if full.shape[1] == t_len else full[:, :t_len]


def _chunk_tree_sum(x, width: int):
    """Pairwise-tree sum of the ``width``-lane chunks of ``x`` along axis 1
    — the VPU energy reduction e[b, t] = sum_a (v * tanh(z))[b, a*Tb + t]."""
    chunks = [x[:, k * width:(k + 1) * width]
              for k in range(x.shape[1] // width)]
    while len(chunks) > 1:
        nxt = [chunks[k] + chunks[k + 1]
               for k in range(0, len(chunks) - 1, 2)]
        if len(chunks) % 2:
            nxt[-1] = nxt[-1] + chunks[-1]
        chunks = nxt
    return chunks[0]


def _pad_rows(kernel_mat, segments):
    """Zero-pad weight rows so each input segment starts on a 128-lane
    boundary of the concat scratch buffer (aligned vector stores)."""
    parts = []
    row = 0
    for width in segments:
        seg = kernel_mat[row:row + width]
        row += width
        pad = _r128(width) - width
        if pad:
            seg = jnp.concatenate(
                [seg, jnp.zeros((pad, seg.shape[1]), seg.dtype)], axis=0)
        parts.append(seg)
    return jnp.concatenate(parts, axis=0)


def _quantize_columns(w):
    """Symmetric per-output-column int8 quantization: ``w ~= q * scale``.
    Column-wise scales keep each gate unit's dynamic range independent —
    the LSTM gate kernels mix i/f/g/o blocks whose magnitudes differ."""
    wf = w.astype(jnp.float32)
    scale = jnp.maximum(
        jnp.max(jnp.abs(wf), axis=0, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_lastdim(x):
    """Symmetric per-last-dim-channel int8 quantization over all leading
    axes: ``x ~= q * scale[..broadcast.., c]``."""
    xf = x.astype(jnp.float32)
    red = tuple(range(x.ndim - 1))
    scale = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=red, keepdims=True), 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def extract_decoder_bundle(variables, compute_dtype=jnp.bfloat16,
                           cell_params=None,
                           quantize_gates=False) -> Dict[str, jnp.ndarray]:
    """Slice the flax decoder params into the kernel's operand layout.

    The fused-gate LSTM kernels ``[x_dim + hidden, 4*hidden]`` get their
    concat segments (prenet|context|hidden) row-padded to 128-lane
    boundaries; the frame and stop heads are fused into one
    ``[hidden+mem, num_mels+1]`` projection.  Done once per synthesizer.
    ``cell_params`` overrides the default tree path — the training kernel
    passes the DecoderCell subtree directly (and differentiates through
    this whole function, so keep every transform here differentiable).

    ``quantize_gates=True`` (serving only — never under autodiff) stores
    the two LSTM gate kernels as int8 with per-output-column dequant
    scales (W8A8: activations are row-quantized dynamically inside the
    kernel).  The gate matmuls are the serving step's dominant MXU work;
    int8 doubles MXU throughput on the v5e (measured 1.87x on the raw
    dots, ~1.77x including the dynamic quant/dequant VPU work) and halves
    their VMEM/HBM footprint.
    """
    p = (cell_params if cell_params is not None
         else variables["params"]["decoder"]["cell"])
    prenet = p["prenet"]
    n_prenet = len(prenet)
    attg = p["attention_lstm"]["cell"]["gates"]
    geng = p["generator_lstm"]["cell"]["gates"]
    att = p["attention"]
    framep, stopp = p["frame_prediction"], p["stop_prediction"]

    prenet_dim = prenet["fc0"]["kernel"].shape[1]
    hidden = attg["kernel"].shape[1] // 4
    mem_dim = attg["kernel"].shape[0] - prenet_dim - hidden

    d = compute_dtype
    f32 = jnp.float32
    head_k = jnp.concatenate([framep["kernel"], stopp["kernel"]], axis=1)
    head_b = jnp.concatenate([framep["bias"], stopp["bias"]])[None, :]

    if "query_kernel" in att:
        # location-sensitive (reference modules/attention.py:39-86): fold
        # conv filter and location projection into one [K, A] matrix (both
        # linear; folded in f32)
        lc = (att["loc_filter"][:, 0, :].astype(f32)
              @ att["location_kernel"].astype(f32))
        att_extra = {
            "wq": att["query_kernel"].astype(d),
            "att_bias": att["bias"].astype(f32),                  # [1, A]
            "lc": lc.astype(f32),                                 # [K, A]
            "v": att["energy_kernel"].reshape(-1).astype(f32),    # [A]
        }
    else:
        # forward attention family (reference modules/attention.py:89-156):
        # same qt/mt/v energy shape, no location conv
        en = att["energy_net"]
        att_extra = {
            "wq": en["query"]["kernel"].astype(d),
            "att_bias": en["bias"].astype(f32),                   # [1, A]
            "v": en["energy"]["kernel"].reshape(-1).astype(f32),  # [A]
        }
        if "transition_agent" in att:
            # t = sigmoid(W [context; query; prenet_out] + b): split W's
            # row blocks and tile each to 128 replicated output columns so
            # the kernel's three tiny matmuls produce a lane-replicated
            # [BB, 128] t_prob (no width-1 VMEM tensors)
            ta_k = att["transition_agent"]["kernel"].astype(f32)
            tile = lambda w: jnp.tile(w, (1, _LANES)).astype(d)  # noqa: E731
            att_extra.update({
                "ta_wc": tile(ta_k[:mem_dim]),
                "ta_wq": tile(ta_k[mem_dim:mem_dim + hidden]),
                "ta_wx": tile(ta_k[mem_dim + hidden:]),
                "ta_b": jnp.tile(
                    att["transition_agent"]["bias"][None, :],
                    (1, _LANES)).astype(f32),
            })

    att_w = _pad_rows(attg["kernel"], (prenet_dim, mem_dim, hidden))
    gen_w = _pad_rows(geng["kernel"], (hidden, mem_dim, hidden))
    if quantize_gates:
        att_w, att_ws = _quantize_columns(att_w)
        gen_w, gen_ws = _quantize_columns(gen_w)
        quant = {"att_ws": att_ws, "gen_ws": gen_ws}
    else:
        att_w, gen_w = att_w.astype(d), gen_w.astype(d)
        quant = {}
    pre = {}
    for i in range(n_prenet):
        fc = prenet[f"fc{i}"]
        pre[f"pre_w{i}"] = fc["kernel"].astype(d)
        pre[f"pre_b{i}"] = fc["bias"][None, :].astype(f32)
    return {
        **quant,
        **pre,
        "att_w": att_w,
        "att_b": attg["bias"][None, :].astype(f32),
        "gen_w": gen_w,
        "gen_b": geng["bias"][None, :].astype(f32),
        "head_w": _pad_rows(head_k, (hidden, mem_dim)).astype(d),
        "head_b": head_b.astype(f32),
        # folded at call time: bias into the memory transform, the location
        # conv+projection into the banded matmul, v into the reduction
        **att_extra,
    }


def _largest_block(b: int, cap: int) -> int:
    for d in range(min(b, cap), 0, -1):
        if b % d == 0:
            return d
    return b


def _build_kernel(steps, t_len, mem_dim, att_dim, hidden, mmel, prenet_dim,
                  dropout_rate, zoneout_h, zoneout_c, dtype, t_block=None,
                  quantized=False, q_streams=False, att_kind="ls",
                  n_prenet=2, t_in=None):
    keep_rate = 1.0 - dropout_rate
    drop_thresh = np.uint32(min(int(keep_rate * float(2 ** 32)), 2 ** 32 - 1))
    drop_scale = 1.0 / keep_rate if keep_rate > 0.0 else 0.0
    h_pad, m_pad, p_pad = _r128(hidden), _r128(mem_dim), _r128(prenet_dim)
    t_block = t_block or t_len
    n_blocks = t_len // t_block
    windows = _block_windows(t_len, t_block)
    at_b = att_dim * t_block
    t_in = t_len if t_in is None else t_in
    # forward kinds: one [T, T] shift-matrix operand replaces the banded
    # location-conv windows (see _static_energy_operands)
    n_band_refs = n_blocks if att_kind == "ls" else 1
    fwd_trans = att_kind == "fwd_trans"

    # Mosaic rejects bf16 (and int8) dot operands carrying an fp32
    # contract precision — the ambient jax_default_matmul_precision leaks
    # into kernel dot_generals, so pin non-f32 dots to DEFAULT (native MXU
    # passes; accumulation dtype still set by preferred_element_type).
    # Mirrors ops/pallas_train_decoder._mxu_precision.
    kern_precision = (jax.lax.Precision.DEFAULT
                      if dtype == jnp.bfloat16 else None)

    def matmul(x, w_ref, prefer=jnp.float32):
        return jax.lax.dot_general(
            x.astype(dtype), w_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=prefer,
            precision=kern_precision,
        )

    def kernel(*refs):
        (seed_ref, mem_ref, mt_ref, mask_ref) = refs[:4]
        i = 4
        if q_streams:
            # int8 memory / memory-transform dequant scales (per channel /
            # per attention dim): the two operands are the step's dominant
            # VMEM streams, so storing them int8 halves that traffic
            (mem_scale_ref, mts_ref) = refs[i:i + 2]
            i += 2
        else:
            mem_scale_ref = mts_ref = None
        band_refs = refs[i:i + n_band_refs]
        i += n_band_refs
        (vt_ref,) = refs[i:i + 1]
        i += 1
        rest = refs[i:]
        (h_att_ref, c_att_ref, h_gen_ref, c_gen_ref,
         ctx_ref, frame_ref, cum_ref) = rest[:7]
        rest = rest[7:]
        if fwd_trans:
            (tp_ref,) = rest[:1]
            rest = rest[1:]
        else:
            tp_ref = None
        pre_refs = rest[:2 * n_prenet]
        rest = rest[2 * n_prenet:]
        if quantized:
            (att_w_ref, att_ws_ref, att_b_ref, wq_ref,
             gen_w_ref, gen_ws_ref, gen_b_ref,
             head_w_ref, head_b_ref) = rest[:9]
            rest = rest[9:]
        else:
            (att_w_ref, att_b_ref, wq_ref,
             gen_w_ref, gen_b_ref,
             head_w_ref, head_b_ref) = rest[:7]
            att_ws_ref = gen_ws_ref = None
            rest = rest[7:]
        if fwd_trans:
            (ta_wc_ref, ta_wq_ref, ta_wx_ref, ta_b_ref) = rest[:4]
            rest = rest[4:]
        (out_spec_ref, out_stop_ref,
         o_h_att_ref, o_c_att_ref, o_h_gen_ref, o_c_gen_ref,
         o_ctx_ref, o_frame_ref, o_cum_ref) = rest[:9]
        rest = rest[9:]
        if fwd_trans:
            (o_tp_ref,) = rest[:1]
            rest = rest[1:]
        else:
            o_tp_ref = None
        (att_in_ref, gen_in_ref, head_in_ref) = rest[:3]
        qa_ref, qg_ref = (rest[3:5] if quantized else (None, None))
        seed0 = seed_ref[0, 0].astype(jnp.uint32)
        seed1 = seed_ref[0, 1].astype(jnp.uint32)

        def rand_bits(shape, salt):
            """Counter-based uint32 hash (lowbias32) — platform-independent
            stand-in for the TPU core PRNG so compiled and interpreter
            modes draw identical dropout masks."""
            x = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
                 * jnp.uint32(shape[1])
                 + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
            x = x + seed0 + salt.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
            x = x ^ (seed1 * jnp.uint32(0x85EBCA6B))
            x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
            x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
            return x ^ (x >> 16)

        mask_add = mask_ref[:]                                # [BB, T] f32

        def lstm_math(gates, c):
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden:])
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return h_new, c_new

        def zoneout(old, new, z):
            return new if z == 0.0 else z * old + (1.0 - z) * new

        def gate_matmul(in_ref, w_ref, b_ref, ws_ref, q_ref):
            """The fused-gate LSTM matmul: bf16 on the MXU, or W8A8 when
            quantized — dynamic per-row activation quant (VPU, ~0.7us) +
            int8 MXU dot at 2x bf16 throughput + row*column dequant."""
            if not quantized:
                return matmul(in_ref[:], w_ref) + b_ref[:]
            x = in_ref[:].astype(jnp.float32)
            amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
            rs = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
            q_ref[:] = jnp.clip(jnp.round(x * (1.0 / rs)),
                                -127.0, 127.0).astype(jnp.int8)
            g = jax.lax.dot_general(
                q_ref[:], w_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
                precision=jax.lax.Precision.DEFAULT)
            return g.astype(jnp.float32) * rs * ws_ref[:] + b_ref[:]

        def prenet(x, step):
            for layer in range(n_prenet):
                w_ref, b_ref = pre_refs[2 * layer], pre_refs[2 * layer + 1]
                x = jax.nn.relu(matmul(x, w_ref) + b_ref[:])
                if dropout_rate > 0.0:
                    bits = rand_bits(x.shape, step * n_prenet + layer + 1)
                    x = jnp.where(bits < drop_thresh, x * drop_scale, 0.0)
            return x

        # loop state lives in the OUTPUT refs (a fori_loop carry would be
        # copied every iteration); zero the concat scratch pads once so the
        # zero-padded weight rows never meet uninitialized data
        o_h_att_ref[:] = h_att_ref[:]
        o_c_att_ref[:] = c_att_ref[:]
        o_h_gen_ref[:] = h_gen_ref[:]
        o_c_gen_ref[:] = c_gen_ref[:]
        o_ctx_ref[:] = ctx_ref[:]
        o_frame_ref[:] = frame_ref[:]
        o_cum_ref[:] = cum_ref[:]
        if fwd_trans:
            o_tp_ref[:] = tp_ref[:]
        att_in_ref[:] = jnp.zeros_like(att_in_ref)
        gen_in_ref[:] = jnp.zeros_like(gen_in_ref)
        head_in_ref[:] = jnp.zeros_like(head_in_ref)

        def step(s, _):
            ctx = o_ctx_ref[:]
            cum = o_cum_ref[:]
            ctx_d = ctx.astype(dtype)

            x = prenet(o_frame_ref[:], s)
            if "att_lstm" not in _ABLATE:
                att_in_ref[:, :prenet_dim] = x.astype(dtype)
                att_in_ref[:, p_pad:p_pad + mem_dim] = ctx_d
                att_in_ref[:, p_pad + m_pad:p_pad + m_pad + hidden] = (
                    o_h_att_ref[:].astype(dtype))
                gates = gate_matmul(att_in_ref, att_w_ref, att_b_ref,
                                    att_ws_ref, qa_ref)
                hn, cn = lstm_math(gates, o_c_att_ref[:])
                o_h_att_ref[:] = zoneout(o_h_att_ref[:], hn, zoneout_h)
                o_c_att_ref[:] = zoneout(o_c_att_ref[:], cn, zoneout_c)
            h_att = o_h_att_ref[:]

            # attention energies in the A-major flattened [BB, A*Tb] layout,
            # per column block — no 3-D dots, no im2col.  Round-3 ablation
            # showed the stage VMEM-traffic bound, so the query broadcast
            # and the v-reduction run on the VPU (lane broadcasts + a
            # pairwise tree over the A chunks) instead of streaming 4 MB
            # qe/red matmul operands per step: measured 76.1 -> 75.0
            # us/step at T=128 and 196.5 -> 177.6 at T=512 (the freed VMEM
            # also buys larger batch blocks).  Only the banded location
            # conv keeps its MXU fold.  n_blocks == 1 covers T <= 256.
            if "attention" not in _ABLATE:
                q = matmul(h_att, wq_ref).astype(dtype)        # [BB, A]
                qt = _q_broadcast(q, t_block, att_dim)
                parts = []
                for j in range(n_blocks):
                    mt_j = mt_ref[:, j * at_b:(j + 1) * at_b]
                    if q_streams:  # int8 mt: dequant by the per-a scale row
                        mt_j = mt_j.astype(dtype) * mts_ref[:]
                    if att_kind == "ls":
                        w0, w1 = windows[j]
                        loc_j = matmul(
                            cum[:, w0:w1], band_refs[j]).astype(dtype)
                        tz = jnp.tanh(loc_j + qt + mt_j)
                    else:
                        # forward family: same energy, no location conv
                        tz = jnp.tanh(qt + mt_j)
                    # e_j[b, t] = sum_a v[a] * tz[b, a*Tb + t] (f32 tree)
                    parts.append(_chunk_tree_sum(
                        tz.astype(jnp.float32) * vt_ref[:], t_block))
                e = (parts[0] if n_blocks == 1
                     else jnp.concatenate(parts, axis=1))
            else:
                e = cum * 0.01
            if att_kind == "ls":
                e = e + mask_add
                e = e - jnp.max(e, axis=-1, keepdims=True)
                p = jnp.exp(e)
                w = p / jnp.sum(p, axis=-1, keepdims=True)
                new_att_state = cum + w                 # cumulative weights
            else:
                # forward attention (reference modules/attention.py:89-124
                # / 127-156): the softmax energy is UNMASKED over the
                # bucketed length (the sample mask applies AFTER the
                # monotonic recurrence: zero + 1e-6 clamp + L1 renorm, as
                # in models/attention.py::_forward_normalize); only kernel
                # padding beyond the caller's t_in is excluded outright.
                if t_in < t_len:
                    texist = (jax.lax.broadcasted_iota(
                        jnp.int32, e.shape, 1) < t_in)
                    e = jnp.where(texist, e, _NEG_INF)
                e = e - jnp.max(e, axis=-1, keepdims=True)
                p = jnp.exp(e)
                energy = p / jnp.sum(p, axis=-1, keepdims=True)
                # shift(prev) as an MXU matmul with the static [T, T]
                # superdiagonal operand (no lane-granular slicing, which
                # Mosaic relayouts; the 0/1 operand is exact in bf16)
                shifted = matmul(cum, band_refs[0])     # f32 [BB, T]
                if fwd_trans:
                    tp = _tile_lanes(o_tp_ref[:], t_len).astype(jnp.float32)
                    comb = (1.0 - tp) * cum + tp * shifted
                else:
                    comb = cum + shifted
                w = comb * energy
                w = jnp.where(mask_add > -0.5, w, 0.0)
                if t_in < t_len:
                    w = jnp.maximum(w, jnp.where(texist, 1e-6, 0.0))
                else:
                    w = jnp.maximum(w, 1e-6)
                w = w / jnp.sum(w, axis=-1, keepdims=True)
                new_att_state = w                       # current weights
            if "ctx" not in _ABLATE:
                # int8 memory: the per-channel dequant commutes with the
                # t-reduction, so the scale multiplies the SMALL [BB, Mem]
                # result, not the [BB, T, Mem] stream
                mem = (mem_ref[:].astype(dtype) if q_streams
                       else mem_ref[:])
                ctx = jnp.sum(mem * w[:, :, None].astype(dtype),
                              axis=1, dtype=jnp.float32)       # [BB, Mem]
                if q_streams:
                    ctx = ctx * mem_scale_ref[:]
                o_ctx_ref[:] = ctx
                ctx_d = ctx.astype(dtype)
            o_cum_ref[:] = new_att_state
            if fwd_trans:
                # transition agent (reference modules/attention.py:148-155):
                # t = sigmoid(W [context; query; prenet_out] + b) via three
                # lane-replicated [BB, 128] matmuls (no width-1 tensors)
                o_tp_ref[:] = jax.nn.sigmoid(
                    matmul(ctx_d, ta_wc_ref)
                    + matmul(h_att, ta_wq_ref)
                    + matmul(x.astype(dtype), ta_wx_ref)
                    + ta_b_ref[:])

            if "gen_lstm" not in _ABLATE:
                gen_in_ref[:, :hidden] = h_att.astype(dtype)
                gen_in_ref[:, h_pad:h_pad + mem_dim] = ctx_d
                gen_in_ref[:, h_pad + m_pad:h_pad + m_pad + hidden] = (
                    o_h_gen_ref[:].astype(dtype))
                gates = gate_matmul(gen_in_ref, gen_w_ref, gen_b_ref,
                                    gen_ws_ref, qg_ref)
                hn, cn = lstm_math(gates, o_c_gen_ref[:])
                o_h_gen_ref[:] = zoneout(o_h_gen_ref[:], hn, zoneout_h)
                o_c_gen_ref[:] = zoneout(o_c_gen_ref[:], cn, zoneout_c)

            head_in_ref[:, :hidden] = o_h_gen_ref[:].astype(dtype)
            head_in_ref[:, h_pad:h_pad + mem_dim] = ctx_d
            fv = matmul(head_in_ref[:], head_w_ref) + head_b_ref[:]
            frame = fv[:, :mmel]
            o_frame_ref[:] = frame
            out_spec_ref[s] = frame
            out_stop_ref[s, :] = fv[:, mmel]
            return 0

        jax.lax.fori_loop(0, steps, step, 0)

    return kernel


def _band_blocks(bundle, t_len, att_dim, t_block, dtype):
    """Banded-window location-conv operands, one per column block (a single
    [(0, T)] window when t_block == t_len — the T<=256 single fold)."""
    lc = bundle["lc"]
    k_size = lc.shape[0]
    half = (k_size - 1) // 2
    assert t_len % t_block == 0, (t_len, t_block)
    assert half < t_block, "conv half-width must fit one block"
    blocks = []
    for j, (w0, w1) in enumerate(_block_windows(t_len, t_block)):
        s_idx = jnp.arange(w0, w1)[:, None]
        t_idx = jnp.arange(j * t_block, (j + 1) * t_block)[None, :]
        tap = s_idx - t_idx + half
        valid = (tap >= 0) & (tap < k_size)
        band_stj = jnp.where(
            valid[:, :, None],
            jnp.take(lc, jnp.clip(tap, 0, k_size - 1), axis=0),
            0.0)                                          # [W, Tb, A]
        blocks.append(
            jnp.swapaxes(band_stj, 1, 2).reshape(
                w1 - w0, att_dim * t_block).astype(dtype))
    return blocks


def _mt_layout(mt_b, t_len, att_dim, t_block, dtype):
    """[B, T, A] -> the kernel's block-major A-flattened layout
    ``mt[b, j*(A*Tb) + a*Tb + (t - j*Tb)]`` (one block when
    t_block == t_len)."""
    b = mt_b.shape[0]
    if t_block == t_len:
        return jnp.swapaxes(mt_b, 1, 2).reshape(
            b, att_dim * t_len).astype(dtype)
    n_b = t_len // t_block
    return jnp.concatenate([
        jnp.swapaxes(mt_b[:, j * t_block:(j + 1) * t_block, :], 1, 2).reshape(
            b, att_dim * t_block)
        for j in range(n_b)
    ], axis=1).astype(dtype)


def _mt_operand(bundle, memory_transform, t_len, att_dim, t_block, dtype):
    """Pre-biased memory transform in the kernel layout.  Batch-dependent —
    built per call, unlike the static operands."""
    mt_b = memory_transform.astype(jnp.float32) + bundle["att_bias"][None]
    return _mt_layout(mt_b, t_len, att_dim, t_block, dtype)


def _static_energy_operands(bundle, t_len, att_dim, dtype, t_block):
    """The batch-INDEPENDENT energy operands for one padded t_len: the
    banded location-conv windows (location-sensitive) or the [T, T]
    superdiagonal shift matrix (forward family), plus the v-scale row
    ``vt[0, a*Tb + t] = v[a]``.  Pure functions of the decoder weights —
    ``make_decode_fn`` computes them once per text-length bucket instead
    of re-deriving them inside every decode-chunk call."""
    if "lc" in bundle:
        bands = tuple(_band_blocks(bundle, t_len, att_dim, t_block, dtype))
    else:
        # shift(prev)[b, t] = prev[b, t-1] as prev @ S, S[s, s+1] = 1
        bands = (jnp.asarray(np.eye(t_len, k=1, dtype=np.float32),
                             dtype),)
    vt = jnp.repeat(bundle["v"].astype(jnp.float32), t_block)[None, :]
    return bands, (vt,)


def _block_call(kernel, steps, bb, t_len, mem_dim, hidden, mmel, att_dim,
                in_widths, interpret, n_band_refs=1, quantized=False,
                q_streams=False, att_kind="ls", n_prenet=2):
    f32 = jnp.float32
    carry_shapes = (
        jax.ShapeDtypeStruct((bb, hidden), f32),   # h_att
        jax.ShapeDtypeStruct((bb, hidden), f32),   # c_att
        jax.ShapeDtypeStruct((bb, hidden), f32),   # h_gen
        jax.ShapeDtypeStruct((bb, hidden), f32),   # c_gen
        jax.ShapeDtypeStruct((bb, mem_dim), f32),  # context
        jax.ShapeDtypeStruct((bb, mmel), f32),     # frame
        jax.ShapeDtypeStruct((bb, t_len), f32),    # attention weights
    )
    if att_kind == "fwd_trans":  # lane-replicated transition probability
        carry_shapes += (jax.ShapeDtypeStruct((bb, _LANES), f32),)
    n_vmem_in = (3 + len(carry_shapes) + n_band_refs + 1
                 + len(_weight_keys(quantized, n_prenet, att_kind))
                 + (2 if q_streams else 0))   # + mem_scale, mts rows
    dtype = in_widths["dtype"]
    scratch = [
        pltpu.VMEM((bb, in_widths["att"]), dtype),
        pltpu.VMEM((bb, in_widths["gen"]), dtype),
        pltpu.VMEM((bb, in_widths["head"]), dtype),
    ]
    if quantized:  # int8 staging rows for the W8A8 gate matmuls
        scratch += [pltpu.VMEM((bb, in_widths["att"]), jnp.int8),
                    pltpu.VMEM((bb, in_widths["gen"]), jnp.int8)]
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((steps, bb, mmel), f32),
            jax.ShapeDtypeStruct((steps, bb), f32),
            *carry_shapes,
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem_in,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM)
            for _ in range(2 + len(carry_shapes))
        ),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def _auto_block_cap(t_len, mem_dim, att_dim, hidden, mmel, prenet_dim,
                    chunk, dtype, budget=121 * 1024 * 1024,
                    quantized=False, q_streams=False, att_kind="ls",
                    n_prenet=2):
    """Largest batch-block whose kernel fits the VMEM budget; 0 = no-fit
    (the fixed operands alone bust the budget and the caller must take the
    XLA scan — reaching the kernel anyway is a bug).

    Byte model validated on the v5e: weights + the folded attention
    operands are batch-block-independent; memory, transform, outputs and
    concat scratch scale per row.  ``t_len`` is the PADDED length; above
    _SINGLE_FOLD_MAX the T-blocked layout's operands (banded windows +
    shared qe/red) grow with T*Tb instead of T^2.  At T=128 this admits a
    single 240-row block (measured +4% over two 120-row blocks); at T=256
    the [T, A*T] operands force ~64-row blocks."""
    esize = 2 if dtype == jnp.bfloat16 else 4
    at = att_dim * t_len
    p_pad, m_pad, h_pad = _r128(prenet_dim), _r128(mem_dim), _r128(hidden)
    att_in = p_pad + m_pad + h_pad
    gen_in = h_pad + m_pad + h_pad
    head_in = h_pad + m_pad
    if t_len <= _SINGLE_FOLD_MAX:
        tb = t_len
        at_b = at
        band_rows = t_len
    else:
        tb = _T_BLOCK
        at_b = att_dim * tb
        band_rows = sum(w1 - w0 for w0, w1 in _block_windows(t_len, tb))
    if att_kind == "ls":
        # band windows + vt (f32 row)
        att_operands = band_rows * at_b + 2 * at_b
    else:
        # [T, T] shift matrix + vt; transition agent adds 3 lane-replicated
        # [in, 128] weight blocks (counted below with the gate weights)
        att_operands = t_len * t_len + 2 * at_b
    # W8A8 mode: gate weights are 1-byte, plus two [1, 4H] f32 scale rows
    gate_esize = 1 if quantized else esize
    # int8-streams mode stores memory and the mt layout 1-byte (+ scales)
    stream_esize = 1 if q_streams else esize
    fixed = (
        gate_esize * (att_in * 4 * hidden + gen_in * 4 * hidden)
        + (2 * 4 * 4 * hidden if quantized else 0)
        + (4 * (m_pad + at_b) if q_streams else 0)  # mem_scale + mts rows
        + esize * (head_in * (mmel + 1)
                   + mmel * prenet_dim
                   + (n_prenet - 1) * prenet_dim * prenet_dim
                   + hidden * att_dim + att_operands)
        + (esize * (m_pad + h_pad + p_pad) * _LANES
           if att_kind == "fwd_trans" else 0)       # transition agent
    )
    per_row = (
        stream_esize * (t_len * m_pad + at)         # memory, mt layout
        + esize * (att_in + gen_in + head_in)       # concat scratch
        + (att_in + gen_in if quantized else 0)     # int8 staging rows
        + 4 * chunk * (_r128(mmel) + 1)             # spec/stop outputs
        + 4 * (4 * hidden + mem_dim + t_len + mmel + t_len)  # carries, mask
        + (4 * 2 * _LANES if att_kind == "fwd_trans" else 0)  # t_prob i/o
        # Mosaic register-allocator SPILL SLOTS: real VMEM the window
        # model cannot see (same lesson as the train kernels' model).
        # The rolled step loop keeps the [BB, A*Tb] energy row (compute
        # dtype -> esize*at_b) plus a set of f32 gate/staging rows live
        # across the body; the f32-row set is larger when the gates are
        # NOT int8-quantized (no 1-byte staging, more full-width f32
        # rows).  Two v5e calibration points, both at flagship dims and
        # T=256 with at_b = 32768:
        #   * bf16 + int8 gates, B=240 single block: OOM dump measured
        #     21.24M spill = 88.5 KB/row (decode_crossover_2026-08-19.log)
        #     -> esize*at_b + 24K charges 88 KB;
        #   * f32, unquantized: hardware fits 30-row blocks and busts at
        #     40 by 2.32M (130.32M used); solving fixed + 40*per_row =
        #     130.32M against this model's non-spill bytes gives 222.4
        #     KB/row of real spill (spill_probe_f32_2026-08-19.log)
        #     -> esize*at_b + 24K + 72K charges 224 KB.
        # With both points reproduced the budget keeps only a 7M safety
        # margin (121M of the 128M chip) instead of the 18M that the
        # original esize-only charge hid behind.  Every pick this grows
        # is hardware-validated bit-exact against its old pick:
        #   * int8 picks at chunk <= 128 (B in {10..240} x T in
        #     {128..512}) are unchanged;
        #   * at the chunk-256 throughput setting two int8 picks grow —
        #     T=384 80->120 rows (1.072x faster) and T=512 60->80
        #     (1.037x) — int8_c256_picks_2026-08-19.log;
        #   * f32 T=256 grows 16->24 (probe fits 30; 1.322x) and
        #     bf16-unquantized T=512 grows 48->60 (0.979x, noise) —
        #     unquant_t512_block60_2026-08-19.log.
        + esize * at_b + 24 * 1024 + (0 if quantized else 72 * 1024)
    )
    cap = int((budget - fixed) // max(per_row, 1))
    if cap < 8:
        return 0  # no-fit sentinel: callers must fall back to the XLA scan
    return min(cap, 256)


def fits_vmem(t_len, mem_dim, att_dim, hidden, mmel, prenet_dim, chunk,
              dtype, quantized=False, q_streams=False, att_kind="ls",
              n_prenet=2) -> bool:
    """True if the serving kernel fits VMEM at these dims (with at least an
    8-row batch block).  The Synthesizer checks this alongside
    ``supports_shapes`` before routing a decode to the fused path.
    ``q_streams=False`` is the conservative default — int8 streams only
    shrink the footprint."""
    return _auto_block_cap(_padded_t(t_len), mem_dim, att_dim, hidden, mmel,
                           prenet_dim, chunk, dtype,
                           quantized=quantized, q_streams=q_streams,
                           att_kind=att_kind, n_prenet=n_prenet) >= 8


def fused_decode_chunk(
    bundle: Dict[str, jnp.ndarray],
    carry: Carry,
    memory: jnp.ndarray,             # [B, T, Mem] (compute dtype)
    memory_transform: jnp.ndarray,   # [B, T, A]
    mask: jnp.ndarray,               # [B, T] bool
    rng: jax.Array,
    chunk_frames: int,
    *,
    dropout_rate: float,
    zoneout_h: float,
    zoneout_c: float,
    block_cap: Optional[int] = None,  # None = VMEM-model auto
    interpret: bool = False,
    static_ops=None,                  # precomputed _static_energy_operands
    quantize_streams: Optional[bool] = None,  # None = env default
) -> Tuple[Carry, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Drop-in replacement for ``Decoder.decode_chunk`` (inference mode).

    Returns ``(new_carry, (spec [B, S, M], stop_logits [B, S]))`` with the
    same carry pytree structure the XLA scan path uses, so chunks can be
    chained across either implementation.
    """
    b, t_in, mem_dim = memory.shape
    att_dim = memory_transform.shape[-1]
    hidden = carry["h_att"].shape[-1]
    mmel = carry["frame"].shape[-1]
    prenet_dim = int(bundle["pre_w0"].shape[-1])
    steps = int(chunk_frames)
    dtype = bundle["pre_w0"].dtype
    quantized = "att_ws" in bundle  # W8A8 gate matmuls (serving only)
    q_streams = (quantize_streams if quantize_streams is not None
                 else _int8_streams_default())
    # attention family and prenet depth are encoded by the bundle's keys
    att_kind = ("ls" if "lc" in bundle
                else "fwd_trans" if "ta_wc" in bundle else "fwd")
    n_prenet = sum(1 for k in bundle if k.startswith("pre_w"))

    # long texts run the T-blocked layout, which needs T % _T_BLOCK == 0:
    # pad the memory axis (padded positions masked to -inf, contribute 0)
    t_len = _padded_t(t_in)
    cum_in = carry["att_state"]["weights"]
    if t_len != t_in:
        pad = ((0, 0), (0, t_len - t_in))
        memory = jnp.pad(memory, pad + ((0, 0),))
        memory_transform = jnp.pad(memory_transform, pad + ((0, 0),))
        mask = jnp.pad(mask, pad)                     # False => masked out
        cum_in = jnp.pad(cum_in, pad)
    t_block = t_len if t_len <= _SINGLE_FOLD_MAX else _T_BLOCK
    n_t_blocks = t_len // t_block

    if block_cap is None:
        try:
            env_cap = int(os.environ.get("MTTS_PALLAS_BLOCK_CAP", ""))
        except ValueError:
            env_cap = 0
        # non-positive/unset/garbage -> the VMEM-model auto size
        block_cap = env_cap if env_cap > 0 else _auto_block_cap(
            t_len, mem_dim, att_dim, hidden, mmel, prenet_dim, steps, dtype,
            quantized=quantized, q_streams=q_streams, att_kind=att_kind,
            n_prenet=n_prenet)
    if block_cap < 1:
        raise ValueError(
            f"fused serving decoder does not fit VMEM at t_len={t_len}, "
            f"hidden={hidden}, att={att_dim}; callers must gate on "
            "pallas_decoder.fits_vmem()")
    bb = _largest_block(b, block_cap)
    n_blocks = b // bb

    kernel = _build_kernel(
        steps, t_len, mem_dim, att_dim, hidden, mmel, prenet_dim,
        float(dropout_rate), float(zoneout_h), float(zoneout_c), dtype,
        t_block=t_block, quantized=quantized, q_streams=q_streams,
        att_kind=att_kind, n_prenet=n_prenet, t_in=t_in)
    in_widths = {
        "att": int(bundle["att_w"].shape[0]),
        "gen": int(bundle["gen_w"].shape[0]),
        "head": int(bundle["head_w"].shape[0]),
        "dtype": dtype,
    }
    call = _block_call(kernel, steps, bb, t_len, mem_dim, hidden, mmel,
                       att_dim, in_widths, interpret,
                       n_band_refs=n_t_blocks if att_kind == "ls" else 1,
                       quantized=quantized, q_streams=q_streams,
                       att_kind=att_kind, n_prenet=n_prenet)

    mask_add = jnp.where(mask, 0.0, _NEG_INF).astype(jnp.float32)
    seeds = jax.lax.bitcast_convert_type(
        jax.random.bits(rng, (n_blocks, 1, 2), jnp.uint32), jnp.int32)
    weights = tuple(bundle[k]
                    for k in _weight_keys(quantized, n_prenet, att_kind))
    if static_ops is None:
        static_ops = _static_energy_operands(
            bundle, t_len, att_dim, dtype, t_block)
    bands, att_ops = static_ops
    if q_streams:
        # int8 memory (per-channel scales) and memory transform (per-a
        # scales): the two operands dominate the step's VMEM streaming —
        # ctx reads [BB, T, Mem] and the energy stage reads [BB, A*Tb] per
        # block per step — so int8 halves that traffic.  Quality sits with
        # the W8A8 gate quant under hp.pallas_decoder_int8 and is
        # re-measured by demos/int8_quality_check.py.
        memory, mem_scale = _quantize_lastdim(memory)
        mt_b = (memory_transform.astype(jnp.float32)
                + bundle["att_bias"][None])
        mt_q, mts = _quantize_lastdim(mt_b)                    # [B,T,A] int8
        mt_am = _mt_layout(mt_q, t_len, att_dim, t_block, jnp.int8)
        extra_ops = (mem_scale.reshape(1, -1),
                     jnp.repeat(mts.reshape(-1), t_block)[None, :]
                     .astype(dtype))
    else:
        mt_am = _mt_operand(bundle, memory_transform, t_len, att_dim,
                            t_block, dtype)
        extra_ops = ()

    carry_in = (
        carry["h_att"], carry["c_att"], carry["h_gen"], carry["c_gen"],
        carry["context"], carry["frame"], cum_in,
    )
    if att_kind == "fwd_trans":
        # [B, 1] transition probability -> lane-replicated [B, 128]
        carry_in += (jnp.tile(
            carry["att_state"]["t_prob"].astype(jnp.float32), (1, _LANES)),)

    specs, stops, carry_blocks = [], [], []
    for i in range(n_blocks):
        sl = slice(i * bb, (i + 1) * bb)
        out = call(
            seeds[i],
            memory[sl] if q_streams else memory[sl].astype(dtype),
            mt_am[sl], mask_add[sl],
            *extra_ops, *bands, *att_ops,
            *(c[sl] for c in carry_in),
            *weights,
        )
        specs.append(out[0])
        stops.append(out[1])
        carry_blocks.append(out[2:])

    spec = jnp.swapaxes(jnp.concatenate(specs, axis=1), 0, 1)   # [B, S, M]
    stop = jnp.swapaxes(jnp.concatenate(stops, axis=1), 0, 1)   # [B, S]
    merged = [jnp.concatenate(parts, axis=0)
              for parts in zip(*carry_blocks)]
    att_state = {"weights": merged[6][:, :t_in]}
    if att_kind == "fwd_trans":
        att_state["t_prob"] = merged[7][:, :1]
    new_carry = {
        "h_att": merged[0], "c_att": merged[1],
        "h_gen": merged[2], "c_gen": merged[3],
        "context": merged[4], "frame": merged[5],
        "att_state": att_state,
    }
    return new_carry, (spec, stop)


def make_decode_fn(hp, variables, compute_dtype=jnp.bfloat16,
                   interpret: bool = False):
    """Build a jit-ready ``(carry, memory, mt, mask, rng) -> (carry, (spec,
    stop))`` closure over an extracted weight bundle, mirroring the
    signature Synthesizer drives chunks with."""
    bundle = extract_decoder_bundle(
        variables, compute_dtype,
        quantize_gates=bool(getattr(hp, "pallas_decoder_int8", False)))
    zo = hp.decoder_regularization == "zoneout"
    qs_attr = getattr(hp, "pallas_decoder_int8_streams", None)
    kwargs = dict(
        dropout_rate=float(hp.dropout),
        zoneout_h=float(hp.zoneout_hidden) if zo else 0.0,
        zoneout_c=float(hp.zoneout_cell) if zo else 0.0,
        interpret=interpret,
        quantize_streams=None if qs_attr is None else bool(qs_attr),
    )
    chunk = int(getattr(hp, "decode_chunk_frames", 64))
    att_dim = int(hp.attention_dimension)
    static_cache = {}

    def decode_chunk(carry, memory, memory_transform, mask, rng,
                     chunk_frames=chunk):
        # the weight-derived energy operands depend only on the (padded)
        # text-length bucket: build them once per bucket, not in every
        # traced chunk call (under jit they become baked-in constants).
        # ensure_compile_time_eval keeps the cached values CONCRETE even
        # when this fill happens inside a jit trace — without it the cache
        # would hold first-trace tracers and poison any later retrace at
        # the same bucket (e.g. a second jit wrapper over one closure).
        t_pad = _padded_t(memory.shape[1])
        t_block = t_pad if t_pad <= _SINGLE_FOLD_MAX else _T_BLOCK
        if t_pad not in static_cache:
            with jax.ensure_compile_time_eval():
                static_cache[t_pad] = _static_energy_operands(
                    bundle, t_pad, att_dim, compute_dtype, t_block)
        return fused_decode_chunk(
            bundle, carry, memory, memory_transform, mask, rng,
            chunk_frames, static_ops=static_cache[t_pad], **kwargs)

    return decode_chunk
