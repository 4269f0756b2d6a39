"""Pallas TPU kernels: the TRAINING decoder scan, forward AND backward.

The teacher-forced training decode is the reference's hot loop
(/root/reference/modules/tacotron2.py:180-207) differentiated through time.
Round-2 profiling showed the jitted train step at batch 50 spends 83% of its
device time in the two XLA `while` loops (forward scan 51 ms, backward scan
70 ms of a 146 ms step): every one of the 512 sequential steps — and again
every backward step — re-streams the ~36 MB of decoder gate weights from
HBM, the same roofline the inference kernel (ops/pallas_decoder.py) already
solved for serving.

Here the scan runs as chunked Pallas kernels under a ``jax.custom_vjp``:

- the FORWARD kernel advances S steps with weights, attention operands and
  memory VMEM-resident, writing per-step residuals (post-zoneout LSTM
  states, contexts, cumulative/instant attention weights, prenet
  activations) to HBM in the compute dtype;
- the BACKWARD kernel consumes those residuals in reverse, recomputing
  gate pre-activations (storing them would cost GBs) and carrying the
  step-to-step cotangent chain (dh/dc of both LSTMs, dcontext, dcum, the
  frame-feedback gradient) entirely in VMEM.  Per-step gate/head/prenet
  gradients are WRITTEN OUT instead of reduced in-kernel;
- WEIGHT gradients then fall out as a handful of large MXU matmuls over
  the stored activation/cotangent arrays (e.g. ``dW_gates = cat_inputs^T @
  dgates`` over all B*F rows), plus in-kernel f32 accumulators for the
  attention-operand gradients (dband, dred, dmt, dWq) whose per-step
  contributions are rank-1-ish and cheap to fold on the fly.

Stochasticity (always-on prenet dropout, train-mode zoneout / hidden
dropout) uses the same counter-based hash PRNG as the inference kernel so
the backward pass regenerates bit-exact masks from (seed, global step,
salt) instead of storing them.

The custom-vjp boundary takes the PADDED/FOLDED operands (gate matrices
with 128-lane-aligned concat segments, the location conv folded into a
banded matmul, the energy vector folded into a selector) — all built by
differentiable XLA code in ``make_train_decode_fn``, so gradients for the
original parameters (loc_filter, energy_kernel, biases, unpadded gate
kernels) flow out of the returned operand cotangents automatically.

Step math mirrors models/decoder.py::DecoderCell (reference loop body,
tacotron2.py:180-198) with all three attention families: location-sensitive
(modules/attention.py:39-45,67-86) via the banded conv fold, and forward /
forward-with-transition-agent (modules/attention.py:89-156) via the static
[T, T] shift-matrix recurrence whose masked clamp+renorm and softmax stages
are replayed and transposed in the backward kernel.  Forward/gradient
parity vs the XLA scan and finite differences is asserted in
tests/test_pallas_train_decoder.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multilingual_text_to_speech_tpu.ops.pallas_decoder import (
    _LANES,
    _NEG_INF,
    _band_blocks,
    _chunk_tree_sum,
    _mt_operand,
    _q_broadcast,
    _r128,
    _rand_bits,
    _tile_lanes,
    extract_decoder_bundle,
)

# round 3: the TRAIN kernels adopt the serving kernel's T-blocked
# attention layout above 128 symbols (location-sensitive; the forward
# family's operands grow linearly with T and keep the single fold), so
# the coarse bound matches serving; the real gate is the fits_vmem byte
# model below
_MAX_MEMORY_LEN = 512


_ATT_KINDS = {
    "location_sensitive": "ls",
    "forward": "fwd",
    "forward_transition_agent": "fwd_trans",
}


def supports(hp) -> bool:
    """True if the fused training decode covers this configuration.

    Round 3 closed the fallback matrix: any prenet depth >= 1 and all
    three attention families (location-sensitive via the banded conv
    fold; forward / forward-with-transition-agent via the shift-matrix
    recurrence with its masked clamp+renorm transposed in the custom-VJP
    backward), matching the serving kernel."""
    return (
        hp.attention_type in _ATT_KINDS
        and int(getattr(hp, "prenet_layers", 2)) >= 1
        and hp.decoder_regularization in ("zoneout", "dropout")
    )


def padded_t_len(t_len: int, attention_type: str) -> int:
    """Fused-train text length after routing padding.

    Above 128 symbols the location-sensitive kernels need a 64-divisible
    length for the T-blocked fold; 32-multiple buckets (160, 224, ...)
    pad up to the next 64 multiple.  Padding is semantics-preserving for
    ls ONLY — its masked -inf softmax zeroes padded positions exactly,
    while the forward family's UNMASKED energy softmax would shift mass
    onto them (those lengths keep the single fold, whose operands grow
    linearly with T for that family anyway)."""
    if (_ATT_KINDS.get(attention_type) != "ls" or t_len <= 128
            or t_len % 64 == 0):
        return t_len
    return -(-t_len // 64) * 64


def supports_shapes(batch: int, memory_len: int) -> bool:
    """Coarse per-call shape gate: one batch block, VMEM-resident attention.

    This is a necessary condition only — callers on real hardware must ALSO
    pass :func:`fits_vmem`, which runs the byte model at the actual dims
    (at flagship dims the backward kernel stops fitting well below the flat
    256-symbol bound here)."""
    return batch <= 128 and memory_len <= _MAX_MEMORY_LEN


def fits_vmem(hp, batch: int, t_len: int, mem_dim: int, att_dim: int,
              dtype=jnp.float32, train: bool = True) -> bool:
    """True if BOTH chunk kernels fit the VMEM budget at these dims.

    Runs the same byte model that sizes the chunks (``_vmem_chunk``); a
    shape whose chunk-independent footprint alone busts the budget (e.g.
    flagship dims with t_len ≳ 200 in training) must route to the XLA scan
    instead of crashing in Mosaic with a VMEM OOM."""
    cfg = _make_cfg(hp, t_len=t_len, mem_dim=mem_dim, att_dim=att_dim,
                    dtype=dtype, train=train)
    if _vmem_chunk(cfg, batch, cfg.fwd_chunk, False) < 1:
        return False
    if train and _vmem_chunk(cfg, batch, cfg.bwd_chunk, True) < 1:
        return False
    return True


# ---------------------------------------------------------------------------
# shared PRNG helpers (compiled and interpreter modes draw identical masks)
# ---------------------------------------------------------------------------


def _thresh(keep_rate: float) -> np.uint32:
    return np.uint32(min(int(keep_rate * float(2 ** 32)), 2 ** 32 - 1))


# salts: site index within a step (multiplied out by the global step).
# Prenet layer i draws at salt i; the four cell-regularization sites follow,
# so the layout scales with the prenet depth (round 3: any depth >= 1).
def _salt_layout(n_prenet: int):
    """(sites_per_step, att_h, att_c, gen_h, gen_c); prenet layer i -> i."""
    n = int(n_prenet)
    return n + 4, n, n + 1, n + 2, n + 3


class _Cfg:
    """Static kernel configuration (dims, rates, padded widths)."""

    def __init__(self, *, t_len, mem_dim, att_dim, hidden, mmel, prenet_dim,
                 dropout_rate, zoneout_h, zoneout_c, use_zoneout, dtype,
                 fwd_chunk, bwd_chunk, train=True, n_prenet=2,
                 att_kind="ls", loc_half=15):
        assert att_kind in ("ls", "fwd", "fwd_trans"), att_kind
        self.att_kind = att_kind
        self.fwd_trans = att_kind == "fwd_trans"
        self.n_prenet = int(n_prenet)
        # T-blocked attention fold (ls only, round 3): above 128 symbols
        # the energy operands and the dband accumulator grow T*Tb instead
        # of T^2 — the difference between flagship training fitting VMEM
        # at ~170 symbols (single fold) and at 512 (blocked)
        self.loc_half = int(loc_half)
        if att_kind == "ls" and t_len > 128:
            self.t_block = next((tb for tb in (128, 64)
                                 if t_len % tb == 0 and tb > self.loc_half),
                                t_len)
        else:
            self.t_block = t_len
        self.n_blocks = t_len // self.t_block
        self.at_b = att_dim * self.t_block
        # uniform per-block window rows (padded to the 8-sublane grid)
        self.w_pad = -(-(self.t_block + 2 * self.loc_half) // 8) * 8
        (self.salt_sites, self.salt_att_h, self.salt_att_c,
         self.salt_gen_h, self.salt_gen_c) = _salt_layout(n_prenet)
        self.t_len = t_len
        self.mem_dim = mem_dim
        self.att_dim = att_dim
        self.hidden = hidden
        self.mmel = mmel
        self.prenet_dim = prenet_dim
        self.dropout_rate = float(dropout_rate)
        self.zoneout_h = float(zoneout_h)
        self.zoneout_c = float(zoneout_c)
        self.use_zoneout = bool(use_zoneout)
        # eval mode: zoneout becomes its deterministic interpolation and
        # LSTM-output dropout turns off (prenet dropout stays ON — the
        # reference quirk, tacotron2.py:40); no residuals are consumed
        # because eval never differentiates
        self.train = bool(train)
        self.dtype = dtype
        self.fwd_chunk = fwd_chunk
        self.bwd_chunk = bwd_chunk
        self.h_pad = _r128(hidden)
        self.m_pad = _r128(mem_dim)
        self.p_pad = _r128(prenet_dim)
        # concat input widths of the padded gate matrices
        self.att_in = self.p_pad + self.m_pad + self.h_pad
        self.gen_in = self.h_pad + self.m_pad + self.h_pad
        self.head_in = self.h_pad + self.m_pad


def _lstm_forward(gates, c_prev, hidden):
    i = jax.nn.sigmoid(gates[:, :hidden])
    f = jax.nn.sigmoid(gates[:, hidden:2 * hidden])
    g = jnp.tanh(gates[:, 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(gates[:, 3 * hidden:])
    c_new = f * c_prev + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new, (i, f, g, o)


def _mxu_precision(dtype):
    """Explicit contract precision for in-kernel dots.

    Mosaic rejects bf16 matmul operands carrying an fp32 contract
    precision ("Bad lhs type", measured on-chip 2026-08-18): the ambient
    ``jax_default_matmul_precision`` leaks into kernel dot_generals, so a
    user setting that global to "float32" would break every bf16 kernel.
    Pin bf16 to DEFAULT (native MXU passes; f32 accumulation still comes
    from ``preferred_element_type``) and let f32 follow the ambient."""
    return jax.lax.Precision.DEFAULT if dtype == jnp.bfloat16 else None


def _matmul(x, w_ref, dtype, contract=(1, 0)):
    """2-D dot in the compute dtype with f32 accumulation.

    ``contract=(1, 1)`` contracts against the second axis of the weight —
    the transpose-free form used throughout the backward kernel."""
    return jax.lax.dot_general(
        x.astype(dtype), w_ref[:],
        dimension_numbers=(((contract[0],), (contract[1],)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(dtype),
    )


def _cat_nonempty(parts):
    """Lane-concat skipping zero-width segments (Mosaic cannot lower
    zero-column operands; edge blocks of the T-blocked layout produce
    them)."""
    parts = [p for p in parts if p.shape[-1] > 0]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _band_blocks_uniform(bundle, cfg, dtype):
    """Blocked location-conv operand with UNIFORM padded windows, stacked
    to one [n_blocks * w_pad, A*Tb] matrix (the train kernels' dband
    accumulator mirrors this shape, so the window geometry must be static
    and identical across blocks; rows mapping to source positions outside
    [0, T) or taps outside the filter are zero).

    Differentiable in ``bundle['lc']`` — the dband cotangent folds back to
    the conv filter automatically."""
    lc = bundle["lc"]
    k_size = lc.shape[0]
    half = (k_size - 1) // 2
    assert half == cfg.loc_half, (half, cfg.loc_half)
    tb, w = cfg.t_block, cfg.w_pad
    blocks = []
    for j in range(cfg.n_blocks):
        s_idx = jnp.arange(j * tb - half, j * tb - half + w)[:, None]
        t_idx = jnp.arange(j * tb, (j + 1) * tb)[None, :]
        tap = s_idx - t_idx + half
        valid = ((tap >= 0) & (tap < k_size)
                 & (s_idx >= 0) & (s_idx < cfg.t_len))
        band_stj = jnp.where(
            valid[:, :, None],
            jnp.take(lc, jnp.clip(tap, 0, k_size - 1), axis=0),
            0.0)                                          # [W, Tb, A]
        blocks.append(jnp.swapaxes(band_stj, 1, 2).reshape(
            w, cfg.att_dim * tb))
    return jnp.concatenate(blocks, axis=0).astype(dtype)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _build_fwd_kernel(cfg: _Cfg, steps: int):
    """One chunk of S teacher-forced steps; writes outputs + residuals."""
    d = cfg.dtype
    hidden, mmel = cfg.hidden, cfg.mmel
    p_pad, m_pad = cfg.p_pad, cfg.m_pad
    prenet_dim, mem_dim = cfg.prenet_dim, cfg.mem_dim
    keep_pre = 1.0 - cfg.dropout_rate
    pre_thresh = _thresh(keep_pre)
    pre_scale = 1.0 / keep_pre if keep_pre > 0.0 else 0.0
    zh_thresh = _thresh(1.0 - cfg.zoneout_h)
    zc_thresh = _thresh(1.0 - cfg.zoneout_c)
    # dropout-regularized cells: rate on h only (models/rnn.py:85-104)
    dh_keep = 1.0 - cfg.zoneout_h  # zoneout_h doubles as dropout_hidden
    dh_thresh = _thresh(dh_keep)
    dh_scale = 1.0 / dh_keep if dh_keep > 0.0 else 0.0

    n_pre = cfg.n_prenet
    sites = cfg.salt_sites

    def kernel(*refs):
        it = iter(refs)

        def take(n):
            return tuple(next(it) for _ in range(n))

        ctrl_ref, teacher_ref = take(2)
        # broadcast/chunk operands
        (mem_ref, mt_ref, mask_ref, band_ref, vt_ref,
         shifted_ref) = take(6)
        # carry in
        (h_att0_ref, c_att0_ref, h_gen0_ref, c_gen0_ref,
         ctx0_ref, frame0_ref, cum0_ref) = take(7)
        tp0_ref = take(1)[0] if cfg.fwd_trans else None
        # weights
        pre_pairs = take(2 * n_pre)
        pre_w_refs = pre_pairs[0::2]
        pre_b_refs = pre_pairs[1::2]
        (att_w_ref, att_b_ref, wq_ref,
         gen_w_ref, gen_b_ref, head_w_ref, head_b_ref) = take(7)
        if cfg.fwd_trans:  # transition-agent rows + lane-replicated bias
            ta_wc_ref, ta_wq_ref, ta_wx_ref, ta_b_ref = take(4)
        # outputs
        spec_ref, stop_ref, w_ref = take(3)
        if cfg.train:
            # residual streams only exist in training mode — the eval/GTA
            # forward never differentiates, so it skips all HBM streams
            (r_h_att_ref, r_c_att_ref, r_h_gen_ref, r_c_gen_ref,
             r_ctx_ref, r_cum_ref) = take(6)
            # post-dropout output of each prenet layer, then the raw input
            r_pre_refs = take(n_pre)
            (r_raw_ref, r_act_att_ref, r_act_gen_ref) = take(3)
            r_tp_ref = take(1)[0] if cfg.fwd_trans else None
        # carry out
        (o_h_att_ref, o_c_att_ref, o_h_gen_ref, o_c_gen_ref,
         o_ctx_ref, o_frame_ref, o_cum_ref) = take(7)
        o_tp_ref = take(1)[0] if cfg.fwd_trans else None
        # scratch
        att_in_ref, gen_in_ref, head_in_ref = take(3)
        assert next(it, None) is None, "unconsumed kernel refs"
        seed0 = ctrl_ref[0, 0].astype(jnp.uint32)
        seed1 = ctrl_ref[0, 1].astype(jnp.uint32)
        chunk_start = ctrl_ref[0, 2]

        o_h_att_ref[:] = h_att0_ref[:]
        o_c_att_ref[:] = c_att0_ref[:]
        o_h_gen_ref[:] = h_gen0_ref[:]
        o_c_gen_ref[:] = c_gen0_ref[:]
        o_ctx_ref[:] = ctx0_ref[:]
        o_frame_ref[:] = frame0_ref[:]
        o_cum_ref[:] = cum0_ref[:]
        if cfg.fwd_trans:
            o_tp_ref[:] = tp0_ref[:]
        att_in_ref[:] = jnp.zeros_like(att_in_ref)
        gen_in_ref[:] = jnp.zeros_like(gen_in_ref)
        head_in_ref[:] = jnp.zeros_like(head_in_ref)
        mask_add = mask_ref[:]

        def cell_update(h_prev, c_prev, h_new, c_new, gs, salt_h, salt_c):
            if not cfg.train:
                if cfg.use_zoneout:
                    # eval-mode zoneout: deterministic interpolation
                    # (models/rnn.py:79-81)
                    return (cfg.zoneout_h * h_prev
                            + (1.0 - cfg.zoneout_h) * h_new,
                            cfg.zoneout_c * c_prev
                            + (1.0 - cfg.zoneout_c) * c_new)
                return h_new, c_new  # eval-mode dropout cell: no-op
            if cfg.use_zoneout:
                if cfg.zoneout_h == 0.0 and cfg.zoneout_c == 0.0:
                    return h_new, c_new  # static: no masks to draw
                bits_h = _rand_bits(h_new.shape, seed0, seed1,
                                    gs * sites + salt_h)
                bits_c = _rand_bits(c_new.shape, seed0, seed1,
                                    gs * sites + salt_c)
                h_out = jnp.where(bits_h < zh_thresh, h_new, h_prev)
                c_out = jnp.where(bits_c < zc_thresh, c_new, c_prev)
            else:
                if cfg.zoneout_h == 0.0:
                    return h_new, c_new
                bits_h = _rand_bits(h_new.shape, seed0, seed1,
                                    gs * sites + salt_h)
                h_out = jnp.where(bits_h < dh_thresh, h_new * dh_scale, 0.0)
                c_out = c_new
            return h_out, c_out

        def step(s, _):
            gs = chunk_start + s
            teacher = teacher_ref[0, s]
            ctx = o_ctx_ref[:]
            cum = o_cum_ref[:]

            raw = jnp.where(teacher > 0, shifted_ref[s], o_frame_ref[:])
            if cfg.train:
                r_raw_ref[s] = raw.astype(d)

            # prenet (dropout always on); layer i draws at salt i
            x = raw
            for layer in range(n_pre):
                a = (_matmul(x, pre_w_refs[layer], d)
                     + pre_b_refs[layer][:])
                r = jax.nn.relu(a)
                if cfg.dropout_rate > 0.0:
                    bits = _rand_bits(r.shape, seed0, seed1,
                                      gs * sites + layer)
                    x = jnp.where(bits < pre_thresh, r * pre_scale, 0.0)
                else:
                    x = r
                if cfg.train:
                    r_pre_refs[layer][s] = x.astype(d)

            # attention LSTM
            att_in_ref[:, :prenet_dim] = x.astype(d)
            att_in_ref[:, p_pad:p_pad + mem_dim] = ctx.astype(d)
            att_in_ref[:, p_pad + m_pad:p_pad + m_pad + hidden] = (
                o_h_att_ref[:].astype(d))
            gates = _matmul(att_in_ref[:], att_w_ref, d) + att_b_ref[:]
            h_new, c_new, acts = _lstm_forward(gates, o_c_att_ref[:], hidden)
            # post-nonlinearity activations saved so the backward kernel
            # skips the gate recompute matmul AND its transcendentals
            if cfg.train:
                r_act_att_ref[s] = jnp.concatenate(acts, axis=1).astype(d)
            h_att, c_att = cell_update(
                o_h_att_ref[:], o_c_att_ref[:], h_new, c_new, gs,
                cfg.salt_att_h, cfg.salt_att_c)
            o_h_att_ref[:] = h_att
            o_c_att_ref[:] = c_att
            if cfg.train:
                r_h_att_ref[s] = h_att.astype(d)
                r_c_att_ref[s] = c_att.astype(d)

            # attention (A-major folded layout; the query broadcast and
            # v-reduction run on the VPU like the serving kernel —
            # round-3 ablation showed the matmul folds VMEM-traffic bound
            # on their qe/red operand streams).  ``cum`` carries the
            # recurrence state: cumulative weights (location-sensitive)
            # or the previous step's weights (forward family).
            if cfg.train:
                r_cum_ref[s] = cum.astype(d)  # state BEFORE this step
            q = _matmul(h_att, wq_ref, d).astype(d)
            qt = _q_broadcast(q, cfg.t_block, cfg.att_dim)
            if cfg.att_kind == "ls" and cfg.n_blocks > 1:
                # T-blocked energy fold: per-block banded loc windows on a
                # half-padded cum copy (window starts land lane-aligned at
                # j*Tb), operands grow T*Tb instead of T^2
                bb_rows = cum.shape[0]
                cum_pad = _cat_nonempty([
                    jnp.zeros((bb_rows, cfg.loc_half), cum.dtype), cum,
                    jnp.zeros((bb_rows, cfg.w_pad - cfg.t_block
                               - cfg.loc_half), cum.dtype)])
                parts = []
                for jb in range(cfg.n_blocks):
                    win = cum_pad[:, jb * cfg.t_block:
                                  jb * cfg.t_block + cfg.w_pad]
                    band_j = band_ref[jb * cfg.w_pad:(jb + 1) * cfg.w_pad]
                    loc_j = jax.lax.dot_general(
                        win.astype(d), band_j,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_mxu_precision(d)).astype(d)
                    tz_j = jnp.tanh(
                        loc_j + qt
                        + mt_ref[:, jb * cfg.at_b:(jb + 1) * cfg.at_b])
                    parts.append(_chunk_tree_sum(
                        tz_j.astype(jnp.float32) * vt_ref[:], cfg.t_block))
                e = jnp.concatenate(parts, axis=1) + mask_add
            elif cfg.att_kind == "ls":
                loc = _matmul(cum, band_ref, d).astype(d)
                tz = jnp.tanh(loc + qt + mt_ref[:])
                e = _chunk_tree_sum(
                    tz.astype(jnp.float32) * vt_ref[:], cfg.t_len) + mask_add
            else:
                # forward family: same energy net, no location conv
                tz = jnp.tanh(qt + mt_ref[:])
                e = _chunk_tree_sum(
                    tz.astype(jnp.float32) * vt_ref[:], cfg.t_len)
            e = e - jnp.max(e, axis=-1, keepdims=True)
            p = jnp.exp(e)
            if cfg.att_kind == "ls":
                w = p / jnp.sum(p, axis=-1, keepdims=True)
                new_state = cum + w
            else:
                # forward attention (models/attention.py:138-193, reference
                # modules/attention.py:89-156): UNMASKED softmax energy,
                # monotonic shift recurrence via the static [T, T]
                # superdiagonal matmul, then masked zero + 1e-6 clamp +
                # L1 renorm
                energy = p / jnp.sum(p, axis=-1, keepdims=True)
                shifted_w = _matmul(cum, band_ref, d)
                if cfg.fwd_trans:
                    tp_t = _tile_lanes(o_tp_ref[:], cfg.t_len)
                    comb = (1.0 - tp_t) * cum + tp_t * shifted_w
                else:
                    comb = cum + shifted_w
                w = comb * energy
                w = jnp.where(mask_add > -0.5, w, 0.0)
                w = jnp.maximum(w, 1e-6)
                w = w / jnp.sum(w, axis=-1, keepdims=True)
                new_state = w
            w_ref[s] = w
            ctx = jnp.sum(mem_ref[:] * w[:, :, None].astype(d),
                          axis=1, dtype=jnp.float32)
            o_ctx_ref[:] = ctx
            o_cum_ref[:] = new_state
            if cfg.train:
                r_ctx_ref[s] = ctx.astype(d)
            if cfg.fwd_trans:
                # transition agent (models/attention.py:189-192): VPU row
                # reductions against the [1, dim] weight rows, then a
                # lane-replicated sigmoid (no width-1 VMEM tensors)
                lin = (jnp.sum(ctx * ta_wc_ref[:].astype(jnp.float32),
                               axis=1, keepdims=True)
                       + jnp.sum(h_att * ta_wq_ref[:].astype(jnp.float32),
                                 axis=1, keepdims=True)
                       + jnp.sum(x.astype(jnp.float32)
                                 * ta_wx_ref[:].astype(jnp.float32),
                                 axis=1, keepdims=True))
                tp_lane = jax.nn.sigmoid(
                    jnp.broadcast_to(lin, (lin.shape[0], _LANES))
                    + ta_b_ref[:])
                o_tp_ref[:] = tp_lane
                if cfg.train:
                    r_tp_ref[s] = tp_lane

            # generator LSTM
            gen_in_ref[:, :hidden] = h_att.astype(d)
            gen_in_ref[:, cfg.h_pad:cfg.h_pad + mem_dim] = ctx.astype(d)
            gen_in_ref[:, cfg.h_pad + m_pad:cfg.h_pad + m_pad + hidden] = (
                o_h_gen_ref[:].astype(d))
            gates = _matmul(gen_in_ref[:], gen_w_ref, d) + gen_b_ref[:]
            h_new, c_new, acts = _lstm_forward(gates, o_c_gen_ref[:], hidden)
            if cfg.train:
                r_act_gen_ref[s] = jnp.concatenate(acts, axis=1).astype(d)
            h_gen, c_gen = cell_update(
                o_h_gen_ref[:], o_c_gen_ref[:], h_new, c_new, gs,
                cfg.salt_gen_h, cfg.salt_gen_c)
            o_h_gen_ref[:] = h_gen
            o_c_gen_ref[:] = c_gen
            if cfg.train:
                r_h_gen_ref[s] = h_gen.astype(d)
                r_c_gen_ref[s] = c_gen.astype(d)

            # frame/stop heads (fused)
            head_in_ref[:, :hidden] = h_gen.astype(d)
            head_in_ref[:, cfg.h_pad:cfg.h_pad + mem_dim] = ctx.astype(d)
            fv = _matmul(head_in_ref[:], head_w_ref, d) + head_b_ref[:]
            frame = fv[:, :mmel]
            o_frame_ref[:] = frame
            spec_ref[s] = frame
            stop_ref[s, :] = fv[:, mmel]
            return 0

        jax.lax.fori_loop(0, steps, step, 0)

    return kernel


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------


def _build_bwd_kernel(cfg: _Cfg, steps: int):
    """One chunk of S steps in REVERSE; consumes fwd residuals, carries the
    step-to-step cotangent chain, writes per-step gate/head/prenet grads and
    accumulates the attention-operand grads in f32."""
    d = cfg.dtype
    hidden, mmel = cfg.hidden, cfg.mmel
    p_pad, m_pad, h_pad = cfg.p_pad, cfg.m_pad, cfg.h_pad
    prenet_dim, mem_dim = cfg.prenet_dim, cfg.mem_dim
    keep_pre = 1.0 - cfg.dropout_rate
    pre_scale = 1.0 / keep_pre if keep_pre > 0.0 else 0.0
    zh_thresh = _thresh(1.0 - cfg.zoneout_h)
    zc_thresh = _thresh(1.0 - cfg.zoneout_c)
    dh_keep = 1.0 - cfg.zoneout_h
    dh_thresh = _thresh(dh_keep)
    dh_scale = 1.0 / dh_keep if dh_keep > 0.0 else 0.0

    n_pre = cfg.n_prenet
    sites = cfg.salt_sites

    def kernel(*refs):
        it = iter(refs)

        def take(n):
            return tuple(next(it) for _ in range(n))

        ctrl_ref, teacher_ref = take(2)
        # broadcast operands
        mem_ref, mt_ref, band_ref, vt_ref = take(4)
        # mask row for the forward family's renorm stage
        mask_ref = take(1)[0] if cfg.att_kind != "ls" else None
        # weights (transpose-matmuls only; no gate recompute)
        pre_w_refs = take(n_pre)
        att_w_ref, wq_ref, gen_w_ref, head_w_ref = take(4)
        if cfg.fwd_trans:  # transition-agent weight rows
            ta_wc_ref, ta_wq_ref, ta_wx_ref = take(3)
        # fwd residual streams for this chunk
        r_h_att_ref, r_c_att_ref, r_c_gen_ref, r_cum_ref = take(4)
        r_pre_refs = take(n_pre)  # post-dropout output of each prenet layer
        r_act_att_ref, r_act_gen_ref, r_w_ref = take(3)
        r_tp_ref = take(1)[0] if cfg.fwd_trans else None
        # chunk-entry states (the carry that ENTERED this chunk)
        c_att0_ref, c_gen0_ref = take(2)
        tp0_ref = take(1)[0] if cfg.fwd_trans else None
        # output cotangent streams
        dspec_ref, dstop_ref, dw_out_ref = take(3)
        # incoming cotangent carry (from the chunk after this one)
        (i_dh_att_ref, i_dc_att_ref, i_dh_gen_ref, i_dc_gen_ref,
         i_dctx_ref, i_dcum_ref, i_dframe_ref) = take(7)
        i_dtp_ref = take(1)[0] if cfg.fwd_trans else None
        # outputs: per-step grad streams
        dg_att_ref, dg_gen_ref, da_frame_ref = take(3)
        da_pre_refs = take(n_pre)  # pre-relu grad of each prenet layer
        dctx_out_ref, dshift_ref = take(2)
        # transition-agent pre-sigmoid grad stream (weight grads assemble
        # outside as matmuls over the ctx/h_att/prenet residual streams)
        dlin_ref = take(1)[0] if cfg.fwd_trans else None
        # outputs: f32 accumulators (summed over chunks outside); the
        # forward family's band operand is the CONSTANT shift matrix, so
        # it has no gradient accumulator
        dmt_acc_ref = take(1)[0]
        dband_acc_ref = take(1)[0] if cfg.att_kind == "ls" else None
        dvt_acc_ref, dwq_acc_ref = take(2)
        # outputs: outgoing cotangent carry
        (o_dh_att_ref, o_dc_att_ref, o_dh_gen_ref, o_dc_gen_ref,
         o_dctx_ref, o_dcum_ref, o_dframe_ref) = take(7)
        o_dtp_ref = take(1)[0] if cfg.fwd_trans else None
        assert next(it, None) is None, "unconsumed kernel refs"
        seed0 = ctrl_ref[0, 0].astype(jnp.uint32)
        seed1 = ctrl_ref[0, 1].astype(jnp.uint32)
        chunk_start = ctrl_ref[0, 2]

        o_dh_att_ref[:] = i_dh_att_ref[:]
        o_dc_att_ref[:] = i_dc_att_ref[:]
        o_dh_gen_ref[:] = i_dh_gen_ref[:]
        o_dc_gen_ref[:] = i_dc_gen_ref[:]
        o_dctx_ref[:] = i_dctx_ref[:]
        o_dcum_ref[:] = i_dcum_ref[:]
        o_dframe_ref[:] = i_dframe_ref[:]
        if cfg.fwd_trans:
            o_dtp_ref[:] = i_dtp_ref[:]
        dmt_acc_ref[:] = jnp.zeros_like(dmt_acc_ref)
        if cfg.att_kind == "ls":
            dband_acc_ref[:] = jnp.zeros_like(dband_acc_ref)
        dvt_acc_ref[:] = jnp.zeros_like(dvt_acc_ref)
        dwq_acc_ref[:] = jnp.zeros_like(dwq_acc_ref)

        def masks(shape, gs, salt):
            return _rand_bits(shape, seed0, seed1, gs * sites + salt)

        def cell_backward(dh_tot, dc_tot, acts, c_prev, gs, salt_h, salt_c):
            """Shared LSTM+regularization backward over the STORED
            post-nonlinearity activations (i|f|g|o) — no gate recompute
            matmul and no sigmoid/tanh re-evaluation.

            Returns (dgates [B,4H], dh_prev_reg, dc_prev) where dh_prev_reg
            is the regularization's pass-through gradient to the previous h
            (zoneout keep-old path; zero for dropout cells)."""
            i = acts[:, :hidden]
            f = acts[:, hidden:2 * hidden]
            g = acts[:, 2 * hidden:3 * hidden]
            o = acts[:, 3 * hidden:]
            c_new = f * c_prev + i * g
            tanh_c = jnp.tanh(c_new)
            if cfg.use_zoneout:
                if cfg.zoneout_h == 0.0 and cfg.zoneout_c == 0.0:
                    dh_new, dh_prev_reg = dh_tot, jnp.zeros_like(dh_tot)
                    dc_from_state = dc_tot
                    dc_prev_reg = jnp.zeros_like(dc_tot)
                else:
                    zh = (masks((dh_tot.shape[0], hidden), gs, salt_h)
                          < zh_thresh)
                    zc = (masks((dc_tot.shape[0], hidden), gs, salt_c)
                          < zc_thresh)
                    dh_new = jnp.where(zh, dh_tot, 0.0)
                    dh_prev_reg = jnp.where(zh, 0.0, dh_tot)
                    dc_from_state = jnp.where(zc, dc_tot, 0.0)
                    dc_prev_reg = jnp.where(zc, 0.0, dc_tot)
            else:
                if cfg.zoneout_h == 0.0:
                    dh_new = dh_tot
                else:
                    keep = (masks((dh_tot.shape[0], hidden), gs, salt_h)
                            < dh_thresh)
                    dh_new = jnp.where(keep, dh_tot * dh_scale, 0.0)
                dh_prev_reg = jnp.zeros_like(dh_tot)
                dc_from_state = dc_tot
                dc_prev_reg = jnp.zeros_like(dc_tot)
            dc_new = dc_from_state + dh_new * o * (1.0 - tanh_c * tanh_c)
            dc_prev = dc_prev_reg + dc_new * f
            dgi = dc_new * g * i * (1.0 - i)
            dgf = dc_new * c_prev * f * (1.0 - f)
            dgg = dc_new * i * (1.0 - g * g)
            dgo = dh_new * tanh_c * o * (1.0 - o)
            return (jnp.concatenate([dgi, dgf, dgg, dgo], axis=1),
                    dh_prev_reg, dc_prev)

        def prev(r_ref, init_ref, s):
            guard = jnp.maximum(s - 1, 0)
            return jnp.where(s > 0, r_ref[guard].astype(jnp.float32),
                             init_ref[:])

        def step(idx, _):
            s = steps - 1 - idx
            gs = chunk_start + s
            teacher = teacher_ref[0, s]

            h_att_s = r_h_att_ref[s].astype(jnp.float32)
            cum_s = r_cum_ref[s].astype(jnp.float32)
            w_s = r_w_ref[s]
            c_att_prev = prev(r_c_att_ref, c_att0_ref, s)
            c_gen_prev = prev(r_c_gen_ref, c_gen0_ref, s)

            # ---- heads --------------------------------------------------
            dframe_tot = dspec_ref[s] + o_dframe_ref[:]
            da_frame_ref[s] = dframe_tot.astype(d)
            head_w = head_w_ref[:]
            dproto = jax.lax.dot_general(
                dframe_tot.astype(d), head_w[:, :mmel],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mxu_precision(d))
            dproto = dproto + (dstop_ref[s, :][:, None]
                               * head_w[:, mmel][None, :].astype(jnp.float32))
            dh_gen_tot = o_dh_gen_ref[:] + dproto[:, :hidden]
            dctx_tot = o_dctx_ref[:] + dproto[:, h_pad:h_pad + mem_dim]

            # ---- generator LSTM ----------------------------------------
            dgates_g, dh_prev_reg_g, dc_prev_g = cell_backward(
                dh_gen_tot, o_dc_gen_ref[:],
                r_act_gen_ref[s].astype(jnp.float32), c_gen_prev, gs,
                cfg.salt_gen_h, cfg.salt_gen_c)
            dg_gen_ref[s] = dgates_g.astype(d)
            dcat_g = _matmul(dgates_g, gen_w_ref, d, contract=(1, 1))
            dh_att_tot = o_dh_att_ref[:] + dcat_g[:, :hidden]
            dctx_tot = dctx_tot + dcat_g[:, h_pad:h_pad + mem_dim]
            o_dh_gen_ref[:] = (dh_prev_reg_g
                               + dcat_g[:, h_pad + m_pad:
                                        h_pad + m_pad + hidden])
            o_dc_gen_ref[:] = dc_prev_g

            # ---- transition agent (fwd_trans only) ----------------------
            # tp_s = sigmoid(ctx·wc + h_att·wq + x·wx + b) was consumed by
            # step s+1's recurrence; its cotangent arrives in the dtp
            # carry.  Backward runs BEFORE the attention/dctx_out stage so
            # the ctx contribution reaches the memory cotangent.
            if cfg.fwd_trans:
                p_s = r_tp_ref[s].astype(jnp.float32)   # lane-replicated
                dlin = (o_dtp_ref[:][:, :1] * p_s[:, :1]
                        * (1.0 - p_s[:, :1]))           # [B, 1] f32
                dlin_ref[s] = jnp.broadcast_to(dlin, p_s.shape)
                bb = dlin.shape[0]
                dctx_tot = dctx_tot + (
                    jnp.broadcast_to(dlin, (bb, mem_dim))
                    * ta_wc_ref[:].astype(jnp.float32))
                dh_att_tot = dh_att_tot + (
                    jnp.broadcast_to(dlin, (bb, hidden))
                    * ta_wq_ref[:].astype(jnp.float32))
                dx_ta = (jnp.broadcast_to(dlin, (bb, prenet_dim))
                         * ta_wx_ref[:].astype(jnp.float32))

            # ---- attention ---------------------------------------------
            dctx_out_ref[s] = dctx_tot.astype(d)
            dw = (dw_out_ref[s] + o_dcum_ref[:]
                  + jnp.sum(mem_ref[:].astype(jnp.float32)
                            * dctx_tot[:, None, :], axis=2))
            # recompute the energy chain (VPU broadcast/reduction — mirrors
            # the forward; e = sum_a vt * tanh(z), so dtz = tile(de) * vt
            # and the v-cotangent is a [1, A*T] row, not the old [A*T, T]
            # dred accumulator)
            q = _matmul(h_att_s, wq_ref, d).astype(d)
            qt = _q_broadcast(q, cfg.t_block, cfg.att_dim)
            if cfg.att_kind == "ls" and cfg.n_blocks > 1:
                # T-blocked backward: replay each block's banded window,
                # accumulate dmt/dband/dvt per block, gather dq and the
                # windowed dcum scatter on a half-padded lane layout
                de = w_s * (dw - jnp.sum(dw * w_s, axis=-1, keepdims=True))
                bb_rows = cum_s.shape[0]
                pad_tail = cfg.w_pad - cfg.t_block - cfg.loc_half
                cum_pad = _cat_nonempty([
                    jnp.zeros((bb_rows, cfg.loc_half), cum_s.dtype), cum_s,
                    jnp.zeros((bb_rows, pad_tail), cum_s.dtype)])
                dq = jnp.zeros((bb_rows, cfg.att_dim), jnp.float32)
                dcum_pad = jnp.zeros(
                    (bb_rows, cum_pad.shape[1]), jnp.float32)
                for jb in range(cfg.n_blocks):
                    lo_l, hi_l = jb * cfg.at_b, (jb + 1) * cfg.at_b
                    win = cum_pad[:, jb * cfg.t_block:
                                  jb * cfg.t_block + cfg.w_pad]
                    band_j = band_ref[jb * cfg.w_pad:(jb + 1) * cfg.w_pad]
                    loc_j = jax.lax.dot_general(
                        win.astype(d), band_j,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_mxu_precision(d)).astype(d)
                    tz_j = jnp.tanh(loc_j + qt + mt_ref[:, lo_l:hi_l])
                    de_j = de[:, jb * cfg.t_block:(jb + 1) * cfg.t_block]
                    de_t_j = jnp.concatenate([de_j] * cfg.att_dim, axis=1)
                    dtz_j = de_t_j * vt_ref[:]
                    dz_j = dtz_j * (1.0 - tz_j.astype(jnp.float32) ** 2)
                    dmt_acc_ref[:, lo_l:hi_l] += dz_j
                    dband_acc_ref[jb * cfg.w_pad:(jb + 1) * cfg.w_pad] += (
                        jax.lax.dot_general(
                            win.astype(d), dz_j.astype(d),
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_mxu_precision(d)))
                    dvt_acc_ref[:] += jnp.sum(
                        tz_j.astype(jnp.float32) * de_t_j, axis=0,
                        keepdims=True)
                    dq = dq + jnp.concatenate(
                        [jnp.sum(dz_j[:, a * cfg.t_block:
                                      (a + 1) * cfg.t_block],
                                 axis=1, keepdims=True)
                         for a in range(cfg.att_dim)], axis=1)
                    dwin_j = jax.lax.dot_general(
                        dz_j.astype(d), band_j,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_mxu_precision(d))          # [B, W]
                    before = jb * cfg.t_block
                    after = dcum_pad.shape[1] - before - cfg.w_pad
                    dcum_pad = dcum_pad + _cat_nonempty([
                        jnp.zeros((bb_rows, before), jnp.float32), dwin_j,
                        jnp.zeros((bb_rows, after), jnp.float32)])
                o_dcum_ref[:] += dcum_pad[:, cfg.loc_half:
                                          cfg.loc_half + cfg.t_len]
                dwq_acc_ref[:] += jax.lax.dot_general(
                    h_att_s.astype(d), dq.astype(d),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_mxu_precision(d))
                dh_att_tot = dh_att_tot + _matmul(dq, wq_ref, d,
                                                  contract=(1, 1))
            elif cfg.att_kind == "ls":
                loc = _matmul(cum_s, band_ref, d).astype(d)
                tz = jnp.tanh(loc + qt + mt_ref[:])
                # softmax backward straight off the stored weights
                de = w_s * (dw - jnp.sum(dw * w_s, axis=-1, keepdims=True))
            else:
                # forward family: replay the softmax + shift recurrence +
                # masked clamp/renorm from the stored state (bit-exact:
                # same op sequence as the forward kernel), then transpose
                # each stage
                tz = jnp.tanh(qt + mt_ref[:])
                e = _chunk_tree_sum(
                    tz.astype(jnp.float32) * vt_ref[:], cfg.t_len)
                e = e - jnp.max(e, axis=-1, keepdims=True)
                pexp = jnp.exp(e)
                energy = pexp / jnp.sum(pexp, axis=-1, keepdims=True)
                shifted_w = _matmul(cum_s, band_ref, d)
                if cfg.fwd_trans:
                    tp_prev = prev(r_tp_ref, tp0_ref, s)
                    tp_t = _tile_lanes(tp_prev, cfg.t_len)
                    comb = (1.0 - tp_t) * cum_s + tp_t * shifted_w
                else:
                    comb = cum_s + shifted_w
                w_raw = comb * energy
                wm = jnp.where(mask_ref[:] > -0.5, w_raw, 0.0)
                wc = jnp.maximum(wm, 1e-6)
                s_norm = jnp.sum(wc, axis=-1, keepdims=True)
                # renorm backward (w_s == wc / s_norm is the stored w)
                dwc = (dw - jnp.sum(dw * w_s, axis=-1, keepdims=True)) \
                    / s_norm
                dw_raw = jnp.where(wm > 1e-6, dwc, 0.0)
                denergy = dw_raw * comb
                dcomb = dw_raw * energy
                if cfg.fwd_trans:
                    o_dcum_ref[:] = ((1.0 - tp_t) * dcomb + _matmul(
                        tp_t * dcomb, band_ref, d, contract=(1, 1)))
                    dtp = jnp.sum(dcomb * (shifted_w - cum_s),
                                  axis=-1, keepdims=True)   # [B, 1]
                    o_dtp_ref[:] = jnp.broadcast_to(
                        dtp, (dtp.shape[0], _LANES))
                else:
                    o_dcum_ref[:] = dcomb + _matmul(dcomb, band_ref, d,
                                                    contract=(1, 1))
                de = energy * (denergy - jnp.sum(
                    denergy * energy, axis=-1, keepdims=True))
            if not (cfg.att_kind == "ls" and cfg.n_blocks > 1):
                # single-fold tail (the blocked branch above did all of
                # this per block)
                de_t = jnp.concatenate([de] * cfg.att_dim, axis=1)
                dtz = de_t * vt_ref[:]
                dz = dtz * (1.0 - tz.astype(jnp.float32) ** 2)
                dmt_acc_ref[:] += dz
                if cfg.att_kind == "ls":
                    dband_acc_ref[:] += jax.lax.dot_general(
                        cum_s.astype(d), dz.astype(d),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_mxu_precision(d))
                dvt_acc_ref[:] += jnp.sum(
                    tz.astype(jnp.float32) * de_t, axis=0, keepdims=True)
                # dq[b, a] = sum over the a-th T-lane chunk of dz
                dq = jnp.concatenate(
                    [jnp.sum(dz[:, a * cfg.t_len:(a + 1) * cfg.t_len],
                             axis=1, keepdims=True)
                     for a in range(cfg.att_dim)], axis=1)
                dwq_acc_ref[:] += jax.lax.dot_general(
                    h_att_s.astype(d), dq.astype(d),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_mxu_precision(d))
                dh_att_tot = dh_att_tot + _matmul(dq, wq_ref, d,
                                                  contract=(1, 1))
                if cfg.att_kind == "ls":
                    o_dcum_ref[:] += _matmul(dz, band_ref, d,
                                             contract=(1, 1))

            # ---- attention LSTM ----------------------------------------
            dgates_a, dh_prev_reg_a, dc_prev_a = cell_backward(
                dh_att_tot, o_dc_att_ref[:],
                r_act_att_ref[s].astype(jnp.float32), c_att_prev, gs,
                cfg.salt_att_h, cfg.salt_att_c)
            dg_att_ref[s] = dgates_a.astype(d)
            dcat_a = _matmul(dgates_a, att_w_ref, d, contract=(1, 1))
            dx = dcat_a[:, :prenet_dim]
            if cfg.fwd_trans:  # prenet output also fed the transition agent
                dx = dx + dx_ta
            o_dctx_ref[:] = dcat_a[:, p_pad:p_pad + mem_dim]
            o_dh_att_ref[:] = (dh_prev_reg_a
                               + dcat_a[:, p_pad + m_pad:
                                        p_pad + m_pad + hidden])
            o_dc_att_ref[:] = dc_prev_a

            # ---- prenet (layers in reverse) -----------------------------
            # post-dropout output > 0 <=> relu passed AND the unit was
            # kept, so one where() replays both masks; * pre_scale replays
            # the kept-unit scaling (pre_scale == 1 when dropout is off)
            for layer in range(n_pre - 1, -1, -1):
                out_l = r_pre_refs[layer][s].astype(jnp.float32)
                da_l = jnp.where(out_l > 0.0, dx * pre_scale, 0.0)
                da_pre_refs[layer][s] = da_l.astype(d)
                dx = _matmul(da_l, pre_w_refs[layer], d, contract=(1, 1))
            draw = dx
            dshift_ref[s] = jnp.where(teacher > 0, draw, 0.0).astype(d)
            o_dframe_ref[:] = jnp.where(teacher > 0, 0.0, draw)
            return 0

        jax.lax.fori_loop(0, steps, step, 0)

    return kernel


# ---------------------------------------------------------------------------
# drivers: chunked pallas calls + custom VJP
# ---------------------------------------------------------------------------


def _make_cfg(hp, *, t_len: int, mem_dim: int, att_dim: int, dtype,
              fwd_chunk: int = 64, bwd_chunk: int = 32,
              train: bool = True) -> "_Cfg":
    """Kernel configuration from hparams + runtime dims (single source for
    the decode factory and the ``fits_vmem`` routing gate)."""
    use_zoneout = hp.decoder_regularization == "zoneout"
    zo_h = float(hp.zoneout_hidden) if use_zoneout else float(hp.dropout_hidden)
    zo_c = float(hp.zoneout_cell) if use_zoneout else 0.0
    return _Cfg(
        t_len=t_len, mem_dim=mem_dim, att_dim=att_dim,
        hidden=int(hp.decoder_dimension), mmel=int(hp.num_mels),
        prenet_dim=int(hp.prenet_dimension),
        n_prenet=int(getattr(hp, "prenet_layers", 2)),
        att_kind=_ATT_KINDS[hp.attention_type],
        loc_half=(int(getattr(hp, "attention_kernel_size", 31)) - 1) // 2,
        dropout_rate=float(hp.dropout),
        zoneout_h=zo_h, zoneout_c=zo_c, use_zoneout=use_zoneout,
        dtype=dtype, fwd_chunk=fwd_chunk, bwd_chunk=bwd_chunk,
        train=train,
    )


def _chunk_size(total: int, cap: int) -> int:
    for s in range(min(cap, total), 0, -1):
        if total % s == 0:
            return s
    return total


def _vmem_chunk(cfg: _Cfg, b: int, cap: int, backward: bool,
                budget: int = 118 * 1024 * 1024) -> int:
    """Largest chunk S <= cap whose kernel fits the VMEM budget.

    Rough byte model (validated against Mosaic's OOM dumps on the v5e):
    weights + attention operands are chunk-independent; residual/cotangent
    streams and per-step grad outputs scale with S."""
    esize = 2 if cfg.dtype == jnp.bfloat16 else 4
    bb = -(-b // 8) * 8
    t, a = cfg.t_len, cfg.att_dim
    at = a * t
    fixed = esize * (
        cfg.att_in * 4 * cfg.hidden        # att_w
        + cfg.gen_in * 4 * cfg.hidden      # gen_w
        + cfg.head_in * (cfg.mmel + 1)     # head_w
        + cfg.mmel * cfg.prenet_dim        # prenet layer 0
        + (cfg.n_prenet - 1) * cfg.prenet_dim * cfg.prenet_dim
        + cfg.hidden * a                   # wq
        # band: banded conv fold (ls; T-blocked above 128 symbols) or the
        # [T, T] shift matrix (fwd)
        + (cfg.n_blocks * cfg.w_pad * cfg.at_b if cfg.att_kind == "ls"
           else t * t)
        + bb * at                          # mt_am
        + bb * t * _r128(cfg.mem_dim)      # memory
    ) + 4 * at \
        + 4 * bb * (4 * cfg.hidden + cfg.mem_dim + cfg.t_len + cfg.mmel) * 4
    if cfg.fwd_trans:
        # ta rows + lane-replicated tp/dtp carries (f32)
        fixed += 4 * (cfg.mem_dim + cfg.hidden + cfg.prenet_dim
                      + 3 * 128) + 4 * bb * 4 * 128
    if backward:
        fixed += 4 * (bb * at + cfg.at_b + cfg.hidden * a)     # f32 accs
        if cfg.att_kind == "ls":
            fixed += 4 * cfg.n_blocks * cfg.w_pad * cfg.at_b   # dband acc
    if cfg.train and backward and esize == 4:
        # Mosaic register-allocator SPILL SLOTS are real VMEM the window
        # model cannot see.  The 2026-08 v5e OOM dump for the f32 ls
        # backward at flagship dims (b=20, T=128, prenet 3) showed 22.9M
        # of spill slots next to 106.4M of windows — 1.3M over the 128M
        # chip limit at the model's S=8 pick.  The step loop is rolled
        # (fori_loop), so spills track the step body's f32 live set, not
        # S: charge 512 B x batch-block x hidden, which routes that dump's
        # case to S=4 (measured 121M on-device, fits).  The T-blocked ls
        # fold multiplies that live set per block: the 2026-08-18 v5e dump
        # for (b=20, T=192, 3 blocks, prenet 2) showed 41.3M of spills and
        # 144.6M total at S=4 — scale the charge by n_blocks, which
        # correctly zeroes that shape (no S fits; it must take the XLA
        # scan).  bf16 charges NOTHING: the 2026-08-18
        # hw_probe_train_vmem.py sweep measured bf16 ls backward fits at
        # (T=256, b=50, S=8) and (T=512 = 8 blocks, b=16, S=4) exactly
        # where the uncharged model routes them — a bf16 charge as small
        # as 4M would wrongly zero both.
        fixed += 512 * bb * cfg.hidden * (
            cfg.n_blocks if cfg.att_kind == "ls" else 1)
    # per-step stream bytes (residuals in/out + grads out + cotangents)
    if backward:
        # residual reads: h_att, c_att, c_gen, cum, prenet outs, acts x2
        per_step = esize * bb * (
            3 * cfg.hidden + t + cfg.n_prenet * cfg.prenet_dim
            + 8 * cfg.hidden)
        # grad writes: dgates x2, da_frame, per-layer da, dctx, dshift
        per_step += esize * bb * (8 * cfg.hidden + 2 * cfg.mmel
                                  + cfg.n_prenet * cfg.prenet_dim
                                  + cfg.mem_dim)
        per_step += 4 * bb * (cfg.mmel + 1 + t + t)  # dspec/dstop/dw_out + w
        if cfg.fwd_trans:
            per_step += 4 * bb * 2 * 128             # r_tp read + dlin write
    elif cfg.train:
        # residual writes incl. the two activation streams
        per_step = esize * bb * (
            4 * cfg.hidden + cfg.mem_dim + t
            + cfg.n_prenet * cfg.prenet_dim
            + cfg.mmel + 8 * cfg.hidden)
        per_step += 4 * bb * (cfg.mmel + 1 + t)      # spec/stop/w outputs
        if cfg.fwd_trans:
            per_step += 4 * bb * 128                 # r_tp write
    else:
        per_step = 4 * bb * (cfg.mmel + 1 + t)       # eval: outputs only
    if fixed + per_step > budget:
        return 0  # no-fit: even a single-step chunk busts the budget
    s = cap
    while s > 1 and fixed + s * per_step > budget:
        s //= 2
    return max(s, 1)


def _weight_order(n_prenet: int, att_kind: str = "ls"):
    pre = tuple(k for i in range(n_prenet)
                for k in (f"pre_w{i}", f"pre_b{i}"))
    base = pre + ("att_w", "att_b", "wq", "gen_w", "gen_b",
                  "head_w", "head_b")
    if att_kind == "fwd_trans":
        base += ("ta_wc", "ta_wq", "ta_wx", "ta_b")
    return base


def _bwd_weight_order(n_prenet: int, att_kind: str = "ls"):
    base = (tuple(f"pre_w{i}" for i in range(n_prenet))
            + ("att_w", "wq", "gen_w", "head_w"))
    if att_kind == "fwd_trans":
        base += ("ta_wc", "ta_wq", "ta_wx")
    return base

_VMEM_LIMIT = 128 * 1024 * 1024


def _fwd_call(cfg: _Cfg, steps: int, b: int, interpret: bool):
    f32 = jnp.float32
    d = cfg.dtype
    t, mem, hid, mmel, p = (cfg.t_len, cfg.mem_dim, cfg.hidden, cfg.mmel,
                            cfg.prenet_dim)
    kernel = _build_fwd_kernel(cfg, steps)
    residual_shapes = (
        jax.ShapeDtypeStruct((steps, b, hid), d),      # r_h_att
        jax.ShapeDtypeStruct((steps, b, hid), d),      # r_c_att
        jax.ShapeDtypeStruct((steps, b, hid), d),      # r_h_gen
        jax.ShapeDtypeStruct((steps, b, hid), d),      # r_c_gen
        jax.ShapeDtypeStruct((steps, b, mem), d),      # r_ctx
        jax.ShapeDtypeStruct((steps, b, t), d),        # r_cum
        # post-dropout output of each prenet layer, in layer order
        *(jax.ShapeDtypeStruct((steps, b, p), d)
          for _ in range(cfg.n_prenet)),
        jax.ShapeDtypeStruct((steps, b, mmel), d),     # r_raw
        jax.ShapeDtypeStruct((steps, b, 4 * hid), d),  # r_act_att
        jax.ShapeDtypeStruct((steps, b, 4 * hid), d),  # r_act_gen
        # lane-replicated transition probabilities (fwd_trans)
        *((jax.ShapeDtypeStruct((steps, b, _LANES), f32),)
          if cfg.fwd_trans else ()),
    ) if cfg.train else ()
    out_shape = (
        jax.ShapeDtypeStruct((steps, b, mmel), f32),   # spec
        jax.ShapeDtypeStruct((steps, b), f32),         # stop
        jax.ShapeDtypeStruct((steps, b, t), f32),      # w
        *residual_shapes,
        jax.ShapeDtypeStruct((b, hid), f32),           # carries...
        jax.ShapeDtypeStruct((b, hid), f32),
        jax.ShapeDtypeStruct((b, hid), f32),
        jax.ShapeDtypeStruct((b, hid), f32),
        jax.ShapeDtypeStruct((b, mem), f32),
        jax.ShapeDtypeStruct((b, mmel), f32),
        jax.ShapeDtypeStruct((b, t), f32),
        *((jax.ShapeDtypeStruct((b, _LANES), f32),)    # tp carry
          if cfg.fwd_trans else ()),
    )
    # broadcast+shifted, carry, weights
    n_carry = 8 if cfg.fwd_trans else 7
    n_vmem_in = 6 + n_carry + len(_weight_order(cfg.n_prenet, cfg.att_kind))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem_in,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shape),
        scratch_shapes=[
            pltpu.VMEM((b, cfg.att_in), d),
            pltpu.VMEM((b, cfg.gen_in), d),
            pltpu.VMEM((b, cfg.head_in), d),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )


def _bwd_call(cfg: _Cfg, steps: int, b: int, interpret: bool):
    f32 = jnp.float32
    d = cfg.dtype
    t, mem, hid, mmel, p, a = (cfg.t_len, cfg.mem_dim, cfg.hidden, cfg.mmel,
                               cfg.prenet_dim, cfg.att_dim)
    kernel = _build_bwd_kernel(cfg, steps)
    fwd_trans = cfg.fwd_trans
    out_shape = (
        jax.ShapeDtypeStruct((steps, b, 4 * hid), d),  # dg_att
        jax.ShapeDtypeStruct((steps, b, 4 * hid), d),  # dg_gen
        jax.ShapeDtypeStruct((steps, b, mmel), d),     # da_frame
        # pre-relu grad of each prenet layer, in layer order
        *(jax.ShapeDtypeStruct((steps, b, p), d)
          for _ in range(cfg.n_prenet)),
        jax.ShapeDtypeStruct((steps, b, mem), d),      # dctx_out
        jax.ShapeDtypeStruct((steps, b, mmel), d),     # dshift
        *((jax.ShapeDtypeStruct((steps, b, _LANES), f32),)  # dlin
          if fwd_trans else ()),
        jax.ShapeDtypeStruct((b, a * t), f32),         # dmt_acc
        # dband_acc (ls): stacked uniform windows when T-blocked
        *((jax.ShapeDtypeStruct(
            (cfg.n_blocks * cfg.w_pad, cfg.at_b) if cfg.n_blocks > 1
            else (t, a * t), f32),)
          if cfg.att_kind == "ls" else ()),
        jax.ShapeDtypeStruct((1, cfg.at_b), f32),      # dvt_acc
        jax.ShapeDtypeStruct((hid, a), f32),           # dwq_acc
        jax.ShapeDtypeStruct((b, hid), f32),           # carry out...
        jax.ShapeDtypeStruct((b, hid), f32),
        jax.ShapeDtypeStruct((b, hid), f32),
        jax.ShapeDtypeStruct((b, hid), f32),
        jax.ShapeDtypeStruct((b, mem), f32),
        jax.ShapeDtypeStruct((b, t), f32),
        jax.ShapeDtypeStruct((b, mmel), f32),
        *((jax.ShapeDtypeStruct((b, _LANES), f32),)    # dtp carry
          if fwd_trans else ()),
    )
    # broadcast (+ mask row for the forward family) + weights
    # + residual streams + entry states + cotangent streams + carry
    n_vmem_in = ((4 if cfg.att_kind == "ls" else 5)
                 + len(_bwd_weight_order(cfg.n_prenet, cfg.att_kind))
                 + 7 + cfg.n_prenet + (1 if fwd_trans else 0)
                 + (3 if fwd_trans else 2)
                 + 3 + (8 if fwd_trans else 7))
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_vmem_in,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )


def _pad_cat(parts, widths, pads, dtype):
    """Concatenate ``parts`` along the last axis with each segment zero-padded
    to its 128-lane boundary — the activation-side mirror of _pad_rows."""
    segs = []
    for x, width, pad in zip(parts, widths, pads):
        x = x.astype(dtype)
        if pad > width:
            z = jnp.zeros(x.shape[:-1] + (pad - width,), dtype)
            x = jnp.concatenate([x, z], axis=-1)
        segs.append(x)
    return jnp.concatenate(segs, axis=-1)


def _zero_ct(x):
    """Cotangent for a non-differentiable (integer) input."""
    return np.zeros(x.shape, jax.dtypes.float0)


def make_core(cfg: _Cfg, interpret: bool = False):
    """Build the custom-vjp core: (ops, memory, mask_add, shifted, teacher,
    seeds, init_carry) -> (spec [F,B,M] f32, stop [F,B], w [F,B,T]).

    ``ops`` holds the padded/folded operands (differentiable inputs);
    ``teacher`` is int32 [F]; ``seeds`` int32 [2]; ``init_carry`` the
    7-tuple (h_att, c_att, h_gen, c_gen, ctx, frame, cum), all f32.
    """
    d = cfg.dtype

    def _run_forward(ops, memory, mask_add, shifted, teacher, seeds,
                     init_carry):
        f = shifted.shape[0]
        b = memory.shape[0]
        cap = _vmem_chunk(cfg, b, cfg.fwd_chunk, False)
        if cap < 1:
            if not interpret:
                raise ValueError(
                    "fused train decoder forward does not fit VMEM at "
                    f"t_len={cfg.t_len}, batch={b}, hidden={cfg.hidden}; "
                    "callers must gate on pallas_train_decoder.fits_vmem()")
            cap = cfg.fwd_chunk  # interpreter mode has no VMEM limit
        s_chunk = _chunk_size(f, cap)
        call = _fwd_call(cfg, s_chunk, b, interpret)
        w_ops = []
        for k in _weight_order(cfg.n_prenet, cfg.att_kind):
            v = ops[k]
            w_ops.append(v.astype(jnp.float32)
                         if k.startswith(("pre_b", "ta_"))
                         or k in ("att_b", "gen_b", "head_b") else
                         v.astype(d))
        mem_d = memory.astype(d)
        band, vt, mt_am = (ops["band"].astype(d),
                           ops["vt"].astype(jnp.float32),
                           ops["mt_am"].astype(d))
        carry = tuple(init_carry)
        per_chunk = []
        for k in range(f // s_chunk):
            ctrl = jnp.concatenate(
                [seeds.reshape(2), jnp.asarray([k * s_chunk], jnp.int32)]
            ).reshape(1, 3)
            t_chunk = teacher[k * s_chunk:(k + 1) * s_chunk].reshape(1, -1)
            out = call(
                ctrl, t_chunk,
                mem_d, mt_am, mask_add, band, vt,
                shifted[k * s_chunk:(k + 1) * s_chunk].astype(d),
                *carry,
                *w_ops,
            )
            n_streams = ((12 + cfg.n_prenet + (1 if cfg.fwd_trans else 0))
                         if cfg.train else 3)
            per_chunk.append(out[:n_streams])
            carry = out[n_streams:]
        streams = [jnp.concatenate(parts, axis=0)
                   for parts in zip(*per_chunk)]
        if not cfg.train:
            spec, stop, w_seq = streams
            return (spec, stop, w_seq), None
        (spec, stop, w_seq, r_h_att, r_c_att, r_h_gen, r_c_gen,
         r_ctx, r_cum) = streams[:9]
        r_pre = tuple(streams[9:9 + cfg.n_prenet])
        (r_raw, r_act_att, r_act_gen) = streams[9 + cfg.n_prenet:
                                                12 + cfg.n_prenet]
        r_tp = streams[12 + cfg.n_prenet] if cfg.fwd_trans else None
        residuals = (r_h_att, r_c_att, r_h_gen, r_c_gen, r_ctx, r_cum,
                     r_pre, r_raw, r_act_att, r_act_gen, w_seq, r_tp)
        return (spec, stop, w_seq), residuals

    def core(ops, memory, mask_add, shifted, teacher, seeds, init_carry):
        outs, _ = _run_forward(ops, memory, mask_add, shifted, teacher,
                               seeds, init_carry)
        return outs

    if not cfg.train:
        # eval/GTA: NO custom VJP — the backward kernel regenerates
        # train-mode stochastic masks, which would be silently wrong for
        # the deterministic eval forward. A plain function makes jax.grad
        # fail loudly (pallas_call is not differentiable) instead.
        core.run_forward = core
        return core

    core_vjp = jax.custom_vjp(core)

    def core_fwd(ops, memory, mask_add, shifted, teacher, seeds, init_carry):
        outs, residuals = _run_forward(ops, memory, mask_add, shifted,
                                       teacher, seeds, init_carry)
        # shifted is NOT saved: the backward pass re-reads the per-step
        # inputs from the r_raw residual stream and only needs its shape,
        # which cfg/r_raw already carry.  mask_add IS saved for the
        # forward family, whose backward replays the masked clamp+renorm.
        mask_res = mask_add if cfg.att_kind != "ls" else None
        return outs, (ops, memory, mask_res, teacher, seeds, init_carry,
                      residuals)

    def core_bwd(res, cts):
        (ops, memory, mask_res, teacher, seeds, init_carry,
         residuals) = res
        dspec, dstop, dw_out = cts
        (r_h_att, r_c_att, r_h_gen, r_c_gen, r_ctx, r_cum,
         r_pre, r_raw, r_act_att, r_act_gen, w_seq, r_tp) = residuals
        f = teacher.shape[0]
        b = memory.shape[0]
        cap = _vmem_chunk(cfg, b, cfg.bwd_chunk, True)
        if cap < 1:
            if not interpret:
                raise ValueError(
                    "fused train decoder backward does not fit VMEM at "
                    f"t_len={cfg.t_len}, batch={b}, hidden={cfg.hidden}; "
                    "callers must gate on pallas_train_decoder.fits_vmem()")
            cap = cfg.bwd_chunk
        s_chunk = _chunk_size(f, cap)
        call = _bwd_call(cfg, s_chunk, b, interpret)

        bwd_order = _bwd_weight_order(cfg.n_prenet, cfg.att_kind)
        w_ops = {k: (ops[k].astype(jnp.float32) if k.startswith("ta_")
                     else ops[k].astype(d)) for k in bwd_order}
        mem_d = memory.astype(d)
        band, vt, mt_am = (ops["band"].astype(d),
                           ops["vt"].astype(jnp.float32),
                           ops["mt_am"].astype(d))
        mask_row = (mask_res.astype(jnp.float32),) \
            if cfg.att_kind != "ls" else ()
        init_carry = tuple(init_carry)
        (h0, c0, hg0, cg0, ctx0, frame0, cum0) = init_carry[:7]

        # cotangent chain starts at zero: the final states are unused
        dcarry = (jnp.zeros((b, cfg.hidden), jnp.float32),
                  jnp.zeros((b, cfg.hidden), jnp.float32),
                  jnp.zeros((b, cfg.hidden), jnp.float32),
                  jnp.zeros((b, cfg.hidden), jnp.float32),
                  jnp.zeros((b, cfg.mem_dim), jnp.float32),
                  jnp.zeros((b, cfg.t_len), jnp.float32),
                  jnp.zeros((b, cfg.mmel), jnp.float32))
        if cfg.fwd_trans:
            dcarry += (jnp.zeros((b, _LANES), jnp.float32),)
        n_accs = 4 if cfg.att_kind == "ls" else 3
        accs = None
        per_chunk = [None] * (f // s_chunk)
        for k in range(f // s_chunk - 1, -1, -1):
            lo, hi = k * s_chunk, (k + 1) * s_chunk
            ctrl = jnp.concatenate(
                [seeds.reshape(2), jnp.asarray([lo], jnp.int32)]
            ).reshape(1, 3)
            t_chunk = teacher[lo:hi].reshape(1, -1)
            if k == 0:
                entry = (c0, cg0)
            else:
                entry = (r_c_att[lo - 1].astype(jnp.float32),
                         r_c_gen[lo - 1].astype(jnp.float32))
            if cfg.fwd_trans:
                entry += (init_carry[7] if k == 0 else r_tp[lo - 1],)
            out = call(
                ctrl, t_chunk,
                mem_d, mt_am, band, vt, *mask_row,
                *(w_ops[kk] for kk in bwd_order),
                r_h_att[lo:hi], r_c_att[lo:hi], r_c_gen[lo:hi],
                r_cum[lo:hi], *(rp[lo:hi] for rp in r_pre),
                r_act_att[lo:hi], r_act_gen[lo:hi], w_seq[lo:hi],
                *((r_tp[lo:hi],) if cfg.fwd_trans else ()),
                *entry,
                dspec[lo:hi], dstop[lo:hi], dw_out[lo:hi],
                *dcarry,
            )
            n_streams = 5 + cfg.n_prenet + (1 if cfg.fwd_trans else 0)
            per_chunk[k] = out[:n_streams]
            chunk_accs = out[n_streams:n_streams + n_accs]
            accs = (chunk_accs if accs is None else
                    tuple(a + c for a, c in zip(accs, chunk_accs)))
            dcarry = out[n_streams + n_accs:]

        streams = [jnp.concatenate(parts, axis=0)
                   for parts in zip(*per_chunk)]
        dg_att, dg_gen, da_frame = streams[:3]
        da_pre = streams[3:3 + cfg.n_prenet]
        dctx_seq, dshift = streams[3 + cfg.n_prenet:5 + cfg.n_prenet]
        dlin_seq = streams[5 + cfg.n_prenet] if cfg.fwd_trans else None
        if cfg.att_kind == "ls":
            dmt_am, dband, dvt, dwq = accs
        else:
            dmt_am, dvt, dwq = accs
            dband = jnp.zeros_like(ops["band"])  # constant shift matrix

        # ---- weight gradients: large MXU matmuls over stored streams ----
        hid, mem, p, mmel = cfg.hidden, cfg.mem_dim, cfg.prenet_dim, cfg.mmel
        h_pad, m_pad, p_pad = cfg.h_pad, cfg.m_pad, cfg.p_pad

        def shift1(r, init):
            return jnp.concatenate([init[None].astype(r.dtype), r[:-1]],
                                   axis=0)

        def flat(x):
            return x.reshape(f * b, x.shape[-1])

        def wgrad(cat, dg):
            return jax.lax.dot_general(
                flat(cat), flat(dg),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_mxu_precision(d))

        cat_att = _pad_cat(
            [r_pre[-1], shift1(r_ctx, ctx0), shift1(r_h_att, h0)],
            [p, mem, hid], [p_pad, m_pad, h_pad], d)
        d_att_w = wgrad(cat_att, dg_att)
        d_att_b = jnp.sum(dg_att.astype(jnp.float32), axis=(0, 1))[None, :]

        cat_gen = _pad_cat(
            [r_h_att, r_ctx, shift1(r_h_gen, hg0)],
            [hid, mem, hid], [h_pad, m_pad, h_pad], d)
        d_gen_w = wgrad(cat_gen, dg_gen)
        d_gen_b = jnp.sum(dg_gen.astype(jnp.float32), axis=(0, 1))[None, :]

        cat_head = _pad_cat([r_h_gen, r_ctx], [hid, mem], [h_pad, m_pad], d)
        dfv = jnp.concatenate(
            [da_frame.astype(d), dstop[..., None].astype(d)], axis=-1)
        d_head_w = wgrad(cat_head, dfv)
        d_head_b = jnp.sum(dfv.astype(jnp.float32), axis=(0, 1))[None, :]

        # prenet layer i's input is r_raw (i=0) or the previous layer's
        # post-dropout output
        d_pre = {}
        for i in range(cfg.n_prenet):
            inp = r_raw if i == 0 else r_pre[i - 1]
            d_pre[f"pre_w{i}"] = wgrad(inp, da_pre[i])
            d_pre[f"pre_b{i}"] = jnp.sum(
                da_pre[i].astype(jnp.float32), axis=(0, 1))[None, :]

        d_memory = jnp.einsum(
            "sbt,sbm->btm", w_seq.astype(jnp.float32),
            dctx_seq.astype(jnp.float32))

        d_ops = {
            **d_pre,
            "att_w": d_att_w, "att_b": d_att_b, "wq": dwq,
            "gen_w": d_gen_w, "gen_b": d_gen_b,
            "head_w": d_head_w, "head_b": d_head_b,
            "band": dband, "vt": dvt, "mt_am": dmt_am,
        }
        if cfg.fwd_trans:
            # transition-agent grads: matmuls of the pre-sigmoid grad
            # stream against the stored ctx / h_att / prenet residuals
            dlin_col = dlin_seq[..., 0]                  # [F, B] f32
            d_ops["ta_wc"] = jnp.einsum(
                "sb,sbm->m", dlin_col, r_ctx.astype(jnp.float32))[None, :]
            d_ops["ta_wq"] = jnp.einsum(
                "sb,sbh->h", dlin_col, r_h_att.astype(jnp.float32))[None, :]
            d_ops["ta_wx"] = jnp.einsum(
                "sb,sbp->p", dlin_col,
                r_pre[-1].astype(jnp.float32))[None, :]
            # ops["ta_b"] is the lane-replicated bias row; its outer
            # transpose (broadcast) SUMS lanes, so the total in lane 0 is
            # exact regardless of per-lane distribution
            d_ops["ta_b"] = jnp.zeros(
                (1, _LANES), jnp.float32).at[0, 0].set(jnp.sum(dlin_col))
        d_ops = {k: v.astype(ops[k].dtype) for k, v in d_ops.items()}
        # dcarry is in KERNEL order (..., dctx, dcum, dframe[, dtp]) while
        # init_carry is (..., ctx, frame, cum[, tp]) — swap frame/cum
        d_init = (dcarry[0], dcarry[1], dcarry[2], dcarry[3],
                  dcarry[4], dcarry[6], dcarry[5]) + (
                      (dcarry[7],) if cfg.fwd_trans else ())
        return (d_ops, d_memory.astype(memory.dtype),
                jnp.zeros((b, cfg.t_len), jnp.float32),
                dshift.astype(jnp.float32),
                _zero_ct(teacher), _zero_ct(seeds), d_init)

    core_vjp.defvjp(core_fwd, core_bwd)
    # forward-only entry for eval-mode decodes (no VJP, residuals ignored)
    core_vjp.run_forward = lambda *a: _run_forward(*a)[0]
    return core_vjp


# ---------------------------------------------------------------------------
# public factory
# ---------------------------------------------------------------------------


def make_train_decode_fn(hp, dtype=jnp.float32, interpret: bool = False,
                         fwd_chunk: int = 64, bwd_chunk: int = 32,
                         train: bool = True):
    """Build the fused training decode:

    ``decode(cell_params, memory [B,T,Mem], memory_transform [B,T,A],
    mask [B,T] bool, shifted [B,F,M], teacher [F] bool, rng)``
    -> ``(spec [B,F,M], stop [B,F], alignments [B,F,T])``.

    Fully differentiable w.r.t. ``cell_params``, ``memory`` and
    ``memory_transform`` — the custom-vjp core sees the padded/folded
    operands, and this wrapper's operand construction (weight folding,
    banded location-conv matrix, bias-into-transform fold) is plain
    differentiable XLA, so parameter cotangents assemble automatically.

    ``train=False`` builds the eval/GTA variant: deterministic zoneout
    interpolation, LSTM-output dropout off (prenet dropout stays on), and
    a forward-only entry with NO custom VJP — do not differentiate
    through it; eval never needs to.
    """
    def decode(cell_params, memory, memory_transform, mask, shifted,
               teacher, rng):
        b, t_len, mem_dim = memory.shape
        att_dim = memory_transform.shape[-1]
        frames = shifted.shape[1]
        cfg = _make_cfg(hp, t_len=t_len, mem_dim=mem_dim, att_dim=att_dim,
                        dtype=dtype, fwd_chunk=fwd_chunk,
                        bwd_chunk=bwd_chunk, train=train)
        core = make_core(cfg, interpret=interpret)

        # differentiable operand construction (f32; cast inside the core):
        # gradients for lc/v/bias flow out of the band/vt/mt_am cotangents
        bundle = extract_decoder_bundle(
            None, compute_dtype=jnp.float32, cell_params=cell_params)
        if cfg.att_kind == "ls" and cfg.n_blocks > 1:
            # T-blocked banded windows, stacked uniform (round 3: lifts
            # the fused-training text ceiling past the single fold's
            # T^2 VMEM growth)
            band = _band_blocks_uniform(bundle, cfg, jnp.float32)
        elif cfg.att_kind == "ls":
            band = _band_blocks(bundle, t_len, att_dim, t_len,
                                jnp.float32)[0]
        else:
            # forward family: shift(prev)[b, t] = prev[b, t-1] as the
            # static [T, T] superdiagonal matmul operand (constant — its
            # cotangent is discarded)
            band = jnp.asarray(np.eye(t_len, k=1, dtype=np.float32))
        vt = jnp.repeat(bundle["v"].astype(jnp.float32),
                        cfg.t_block)[None, :]
        mt_am = _mt_operand(bundle, memory_transform, t_len, att_dim,
                            cfg.t_block, jnp.float32)
        ops = {k: bundle[k] for k in _weight_order(cfg.n_prenet, "ls")}
        ops.update(band=band, vt=vt, mt_am=mt_am)
        if cfg.fwd_trans:
            # [1, dim] rows for the kernel's VPU reductions (the bundle
            # stores the serving kernel's 128-column tiles; slicing one
            # column keeps the construction differentiable)
            ops.update(
                ta_wc=bundle["ta_wc"][:, :1].T.astype(jnp.float32),
                ta_wq=bundle["ta_wq"][:, :1].T.astype(jnp.float32),
                ta_wx=bundle["ta_wx"][:, :1].T.astype(jnp.float32),
                ta_b=bundle["ta_b"].astype(jnp.float32),
            )

        mask_add = jnp.where(mask, 0.0, _NEG_INF).astype(jnp.float32)
        seeds = jax.lax.bitcast_convert_type(
            jax.random.bits(rng, (2,), jnp.uint32), jnp.int32)
        f32 = jnp.float32
        if cfg.att_kind == "ls":
            w0 = jnp.zeros((b, t_len), f32)
        else:  # forward attention starts with all mass on token 0
            w0 = jnp.zeros((b, t_len), f32).at[:, 0].set(1.0)
        init_carry = (
            jnp.zeros((b, cfg.hidden), f32), jnp.zeros((b, cfg.hidden), f32),
            jnp.zeros((b, cfg.hidden), f32), jnp.zeros((b, cfg.hidden), f32),
            jnp.zeros((b, mem_dim), f32), jnp.zeros((b, cfg.mmel), f32),
            w0,
        )
        if cfg.fwd_trans:  # t_prob starts at 0.5 (lane-replicated)
            init_carry += (jnp.full((b, _LANES), 0.5, f32),)
        entry = core if train else core.run_forward
        spec, stop, w_seq = entry(
            ops, memory.astype(jnp.float32), mask_add,
            jnp.swapaxes(shifted, 0, 1).astype(jnp.float32),
            teacher.astype(jnp.int32), seeds, init_carry,
        )
        return (jnp.swapaxes(spec, 0, 1), jnp.swapaxes(stop, 0, 1),
                jnp.swapaxes(w_seq, 0, 1))

    return decode
