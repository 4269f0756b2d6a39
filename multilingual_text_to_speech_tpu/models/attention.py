"""Attention mechanisms for the autoregressive decoder.

Rebuild of ``/root/reference/modules/attention.py``.  The reference keeps
attention state (cumulative weights, precomputed memory projection) as module
attributes mutated per frame; here each mechanism is a pure per-step function
— state comes in and goes out explicitly, so the decoder can run as one
``lax.scan``:

    context, weights, new_state = attention(query, memory, memory_transform,
                                             mask, state, prev_decoder_output)

The memory projection (reference ``AttentionBase.reset``,
modules/attention.py:23-28) is computed ONCE by the decoder before the scan
and broadcast into every step.

Reference quirks fixed (SURVEY.md §7):
- ``ForwardAttentionWithTransition.reset`` wrong arity
  (modules/attention.py:141) — states are initialized uniformly here.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

AttState = Dict[str, jnp.ndarray]

_NEG_INF = -1e9  # softmax masking (float32-safe stand-in for -inf)


def init_attention_state(
    attention_type: str, batch_size: int, max_len: int
) -> AttState:
    """Initial per-utterance attention state for the scan carry."""
    weights = jnp.zeros((batch_size, max_len), jnp.float32)
    if attention_type in ("forward", "forward_transition_agent"):
        # forward attention starts with all mass on the first token
        # (modules/attention.py:101-104)
        weights = weights.at[:, 0].set(1.0)
    state: AttState = {"weights": weights}
    if attention_type == "forward_transition_agent":
        state["t_prob"] = jnp.full((batch_size, 1), 0.5, jnp.float32)
    return state


class LocationSensitiveAttention(nn.Module):
    """Tacotron 2 location-sensitive attention
    (reference: modules/attention.py:48-86).

    Energy = v . tanh(W_q q + W_m m + W_l conv(cumulative_weights) + b);
    state carries the cumulative weights.

    This XLA step is already well-fused inside the decoder scan; the hot
    serving/training paths bypass it entirely via the whole-chunk Pallas
    decoder kernels (ops/pallas_decoder.py, ops/pallas_train_decoder.py),
    which fold the conv/projection/reduction into VMEM-resident matmuls.
    (A per-step fused attention kernel was tried in round 2 and measured 4x
    SLOWER than XLA's own scan-body fusion — superseded and removed.)
    """

    representation_dim: int = 128
    kernel_size: int = 31
    location_channels: int = 32
    smoothing: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,             # [B, Q]
        memory: jnp.ndarray,            # [B, T, M]
        memory_transform: jnp.ndarray,  # [B, T, A]
        mask: jnp.ndarray,              # [B, T] bool
        state: AttState,
        prev_decoder_output: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, AttState]:
        cum_weights = state["weights"]
        a = self.representation_dim

        wq = self.param("query_kernel", nn.initializers.lecun_normal(),
                        (query.shape[-1], a))
        loc_filter = self.param(
            "loc_filter", nn.initializers.lecun_normal(),
            (self.kernel_size, 1, self.location_channels))
        wl = self.param("location_kernel", nn.initializers.lecun_normal(),
                        (self.location_channels, a))
        bias = self.param("bias", nn.initializers.zeros, (1, a))
        v = self.param("energy_kernel", nn.initializers.lecun_normal(),
                       (a, 1))

        q = (query.astype(self.dtype) @ wq.astype(self.dtype))[:, None, :]
        loc = jax.lax.conv_general_dilated(
            cum_weights[..., None].astype(self.dtype),
            loc_filter.astype(self.dtype),
            window_strides=(1,),
            padding=[((self.kernel_size - 1) // 2,) * 2],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        loc = loc @ wl.astype(self.dtype)
        energy = jnp.tanh(
            (q + memory_transform + loc).astype(jnp.float32) + bias
        )
        energy = (energy @ v)[..., 0]

        energy = jnp.where(mask, energy, _NEG_INF)
        if self.smoothing:
            sig = jax.nn.sigmoid(energy) * mask
            weights = sig / jnp.maximum(jnp.sum(sig, axis=-1, keepdims=True), 1e-8)
        else:
            weights = jax.nn.softmax(energy, axis=-1)

        context = jnp.einsum("bt,btm->bm", weights,
                             memory.astype(jnp.float32))
        return context, weights, {"weights": cum_weights + weights}


class _ForwardEnergy(nn.Module):
    """Softmax energy shared by both forward-attention variants
    (reference: modules/attention.py:106-112)."""

    representation_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, memory_transform):
        q = nn.Dense(self.representation_dim, use_bias=False,
                     dtype=self.dtype, name="query")(query)[:, None, :]
        bias = self.param("bias", nn.initializers.zeros,
                          (1, self.representation_dim))
        energy = jnp.tanh((q + memory_transform).astype(jnp.float32) + bias)
        energy = nn.Dense(1, use_bias=False, name="energy")(energy)[..., 0]
        return jax.nn.softmax(energy, axis=1)


def _shift_forward(w: jnp.ndarray) -> jnp.ndarray:
    """Shift weights one token forward: [w0, w1, ...] -> [0, w0, w1, ...]."""
    return jnp.pad(w, ((0, 0), (1, 0)))[:, :-1]


def _forward_normalize(w: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked clamp + L1 normalization (modules/attention.py:119-121)."""
    w = jnp.where(mask, w, 0.0)
    w = jnp.clip(w, min=1e-6)
    return w / jnp.sum(w, axis=1, keepdims=True)


class ForwardAttention(nn.Module):
    """Monotonic forward attention without transition agent
    (arXiv:1807.06736; reference: modules/attention.py:89-124)."""

    representation_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, memory, memory_transform, mask, state,
                 prev_decoder_output):
        prev = state["weights"]
        energy = _ForwardEnergy(self.representation_dim, dtype=self.dtype,
                                name="energy_net")(query, memory_transform)
        w = (prev + _shift_forward(prev)) * energy
        weights = _forward_normalize(w, mask)
        context = jnp.einsum("bt,btm->bm", weights, memory)
        return context, weights, {"weights": weights}


class ForwardAttentionWithTransition(nn.Module):
    """Forward attention with an explicit transition agent
    (reference: modules/attention.py:127-156): the DNN-gated recursion
    ``((1-t)*w + t*shift(w)) * energy`` with
    ``t = sigmoid(Linear([context, query, prev_output]))``."""

    representation_dim: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, memory, memory_transform, mask, state,
                 prev_decoder_output):
        prev, t_prob = state["weights"], state["t_prob"]

        energy = _ForwardEnergy(self.representation_dim, dtype=self.dtype,
                                name="energy_net")(query, memory_transform)
        w = ((1.0 - t_prob) * prev + t_prob * _shift_forward(prev)) * energy
        weights = _forward_normalize(w, mask)
        context = jnp.einsum("bt,btm->bm", weights, memory)

        t_in = jnp.concatenate([context, query, prev_decoder_output], axis=-1)
        new_t = jax.nn.sigmoid(
            nn.Dense(1, name="transition_agent")(t_in)
        )
        return context, weights, {"weights": weights, "t_prob": new_t}
