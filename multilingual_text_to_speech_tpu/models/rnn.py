"""LSTM cells with zoneout/dropout regularization, explicit-PRNG style.

Rebuild of ``/root/reference/modules/layers.py:18-47``.  The decoder's
autoregressive loop is a ``lax.scan`` (not a Python frame loop), so all
per-step stochastic ops take explicit PRNG keys threaded through the scan —
no implicit RNG state.

The fused gate matmul ``[x, h] @ W  ([in+hid, 4*hid])`` is a single MXU call
per step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def dropout(x: jnp.ndarray, rate: float, key: jax.Array) -> jnp.ndarray:
    """Inverted dropout with an explicit key (torch F.dropout semantics)."""
    if rate <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


class LSTMCell(nn.Module):
    """Plain LSTM cell; gate order (i, f, g, o) like torch.nn.LSTMCell."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        hs = self.hidden_size
        zx = jnp.concatenate([x, h], axis=-1).astype(self.dtype)
        gates = nn.Dense(4 * hs, dtype=self.dtype, name="gates")(zx)
        gates = gates.astype(jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        new_c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        return new_h, new_c


class ZoneoutLSTMCell(nn.Module):
    """LSTM cell with zoneout (reference: modules/layers.py:18-34).

    Training: each h/c element keeps its previous value with probability z
    (torch's ``(1-z)*dropout(new-old, z) + old`` reduces to exactly this
    because inverted dropout's 1/(1-z) scaling cancels the (1-z) factor).
    Eval: deterministic interpolation ``z*old + (1-z)*new``.
    """

    hidden_size: int
    zoneout_h: float = 0.1
    zoneout_c: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        h: jnp.ndarray,
        c: jnp.ndarray,
        key: jax.Array,
        train: bool,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        new_h, new_c = LSTMCell(self.hidden_size, dtype=self.dtype, name="cell")(x, h, c)
        if train:
            kh, kc = jax.random.split(key)
            keep_h = jax.random.bernoulli(kh, 1.0 - self.zoneout_h, new_h.shape)
            keep_c = jax.random.bernoulli(kc, 1.0 - self.zoneout_c, new_c.shape)
            new_h = jnp.where(keep_h, new_h, h)
            new_c = jnp.where(keep_c, new_c, c)
        else:
            new_h = self.zoneout_h * h + (1.0 - self.zoneout_h) * new_h
            new_c = self.zoneout_c * c + (1.0 - self.zoneout_c) * new_c
        return new_h, new_c


class DropoutLSTMCell(nn.Module):
    """LSTM cell with dropout on the output h (reference: modules/layers.py:37-47)."""

    hidden_size: int
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        h: jnp.ndarray,
        c: jnp.ndarray,
        key: jax.Array,
        train: bool,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        new_h, new_c = LSTMCell(self.hidden_size, dtype=self.dtype, name="cell")(x, h, c)
        if train:
            new_h = dropout(new_h, self.dropout_rate, key)
        return new_h, new_c
