"""Convolutional building blocks, plain and meta-generated.

Rebuild of ``/root/reference/modules/layers.py`` and
``/root/reference/modules/generated.py`` as Flax linen modules with
channels-LAST layout ``[batch, time, channels]`` (XLA/TPU-native; the
reference is channels-first torch).

Key re-designs:
- grouped convolutions use ``feature_group_count`` (one XLA conv) and the
  highway gate split works on a ``[..., groups, 2*c]`` reshape instead of
  torch.chunk interleaving (modules/layers.py:149-151) — same math;
- the contextual parameter generator (modules/generated.py:7-96) emits conv
  kernels/biases as *traced tensors* that feed a standard grouped conv — a
  natural fit for JAX, no functional-conv special case needed;
- generated batch-norm keeps running statistics SHARED across groups
  (modules/generated.py:59-61) in a ``batch_stats`` collection while
  scale/bias are generated per group.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry (reference: modules/layers.py:8-15)."""
    return {
        "relu": jax.nn.relu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "identity": lambda x: x,
    }[name]


def same_pad_amounts(kernel: int, dilation: int) -> tuple[int, int]:
    """'same' padding incl. even kernels (reference: modules/layers.py:72-73)."""
    p = (kernel - 1) * dilation // 2
    return (p, p) if kernel % 2 != 0 else (p, p + 1)


class ConvBlock(nn.Module):
    """Conv1d -> BatchNorm -> activation -> dropout, channels-last.

    Reference: modules/layers.py:50-86.
    """

    output_channels: int
    kernel: int
    dropout: float = 0.0
    activation: str = "identity"
    dilation: int = 1
    groups: int = 1
    batch_norm: bool = True
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        train = self.train
        pad = same_pad_amounts(self.kernel, self.dilation)
        x = nn.Conv(
            features=self.output_channels,
            kernel_size=(self.kernel,),
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            padding=[pad],
            use_bias=not self.batch_norm,
            dtype=self.dtype,
        )(x)
        if self.batch_norm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,           # torch BatchNorm1d momentum=0.1
                epsilon=1e-5,
                dtype=jnp.float32,
            )(x)
        x = get_activation(self.activation)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


def _highway_gate(h: jnp.ndarray, x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Split a 2x-wide grouped conv output into per-group (gate, value) halves
    and apply the highway combination h2*sigmoid(h1) + x*(1-sigmoid(h1)).

    The torch layout (chunk into 2*groups, even chunks = gates) corresponds
    to reshaping each group's channels into [2, c]: index 0 = gate half,
    index 1 = value half (modules/layers.py:147-153)."""
    *lead, total = h.shape
    c = total // (2 * groups)
    hg = h.reshape(*lead, groups, 2, c)
    h1 = hg[..., 0, :].reshape(*lead, groups * c)
    h2 = hg[..., 1, :].reshape(*lead, groups * c)
    p = jax.nn.sigmoid(h1)
    return h2 * p + x * (1.0 - p)


class HighwayConvBlock(nn.Module):
    """Gated 1-D convolution (reference: modules/layers.py:134-153)."""

    output_channels: int
    kernel: int
    dropout: float = 0.0
    activation: str = "identity"
    dilation: int = 1
    groups: int = 1
    batch_norm: bool = True
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = ConvBlock(
            output_channels=2 * self.output_channels,
            kernel=self.kernel,
            dropout=self.dropout,
            activation=self.activation,
            dilation=self.dilation,
            groups=self.groups,
            batch_norm=self.batch_norm,
            train=self.train,
            dtype=self.dtype,
        )(x)
        return _highway_gate(h, x, self.groups)


# ---------------------------------------------------------------------------
# Meta-generated layers (contextual parameter generator)
# ---------------------------------------------------------------------------

class Conv1dGenerated(nn.Module):
    """Grouped conv whose per-group weights are generated from embeddings.

    ``embedding [groups, E] -> Linear(E, bottleneck) -> Linear(bottleneck,
    out/g * in/g * k)`` reshaped into the conv kernel (+ generated bias).
    Reference: modules/generated.py:7-42.
    """

    bottleneck_dim: int
    in_channels: int          # total (groups * per-group)
    out_channels: int         # total
    kernel: int
    dilation: int = 1
    groups: int = 1
    bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embedding: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        g = self.groups
        assert embedding.shape[0] == g, (
            "Number of generator embeddings must match conv groups."
        )
        cin = self.in_channels // g
        cout = self.out_channels // g

        e = nn.Dense(self.bottleneck_dim, name="bottleneck")(embedding)  # [g, b]
        kernel_flat = nn.Dense(cout * cin * self.kernel, name="kernel")(e)
        # lax conv kernel layout HWIO for NWC inputs: [k, in/g, out_total]
        kernel = kernel_flat.reshape(g, cout, cin, self.kernel)
        kernel = jnp.transpose(kernel, (3, 2, 0, 1)).reshape(
            self.kernel, cin, g * cout
        )

        pad = same_pad_amounts(self.kernel, self.dilation)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1,),
            padding=[pad],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=g,
        )
        if self.bias:
            b = nn.Dense(cout, name="bias")(e).reshape(g * cout)
            y = y + b.astype(y.dtype)
        return y


class BatchNorm1dGenerated(nn.Module):
    """Batch norm with per-group generated affine and SHARED running stats.

    Reference: modules/generated.py:45-96 — running mean/var buffers span all
    ``groups * num_features`` channels and are not generated; only the affine
    (scale, bias) comes from the generator bottleneck.
    """

    bottleneck_dim: int
    num_features: int          # total channels (groups * per-group)
    groups: int = 1
    eps: float = 1e-8
    momentum: float = 0.1      # torch convention: new = (1-m)*old + m*batch
    train: bool = False

    @nn.compact
    def __call__(self, embedding: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        train = self.train
        g = self.groups
        per_group = self.num_features // g
        assert embedding.shape[0] == g

        e = nn.Dense(self.bottleneck_dim, name="bottleneck")(embedding)  # [g, b]
        affine = nn.Dense(2 * per_group, name="affine")(e)               # [g, 2c]
        scale = affine[:, :per_group].reshape(-1)                        # [g*c]
        bias = affine[:, per_group:].reshape(-1)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.num_features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.num_features, jnp.float32)
        )

        if train:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))  # all but channels
            mean = jnp.mean(x32, axis=axes)
            var = jnp.var(x32, axis=axes)
            n = x32.size / self.num_features
            # torch F.batch_norm updates running var with the unbiased estimator
            unbiased = var * (n / max(n - 1.0, 1.0))
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean) * inv + bias


class ConvBlockGenerated(nn.Module):
    """Generated twin of ConvBlock (reference: modules/layers.py:89-131)."""

    bottleneck_dim: int
    in_channels: int
    out_channels: int
    kernel: int
    dropout: float = 0.0
    activation: str = "identity"
    dilation: int = 1
    groups: int = 1
    batch_norm: bool = True
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embedding: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        train = self.train
        x = Conv1dGenerated(
            bottleneck_dim=self.bottleneck_dim,
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            kernel=self.kernel,
            dilation=self.dilation,
            groups=self.groups,
            bias=not self.batch_norm,
            dtype=self.dtype,
        )(embedding, x)
        if self.batch_norm:
            x = BatchNorm1dGenerated(
                bottleneck_dim=self.bottleneck_dim,
                num_features=self.out_channels,
                groups=self.groups,
                train=train,
            )(embedding, x)
        x = get_activation(self.activation)(x)
        if self.dropout > 0.0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


class HighwayConvBlockGenerated(nn.Module):
    """Gated generated conv (reference: modules/layers.py:156-178)."""

    bottleneck_dim: int
    in_channels: int
    out_channels: int
    kernel: int
    dropout: float = 0.0
    activation: str = "identity"
    dilation: int = 1
    groups: int = 1
    batch_norm: bool = True
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embedding: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        h = ConvBlockGenerated(
            bottleneck_dim=self.bottleneck_dim,
            in_channels=self.in_channels,
            out_channels=2 * self.out_channels,
            kernel=self.kernel,
            dropout=self.dropout,
            activation=self.activation,
            dilation=self.dilation,
            groups=self.groups,
            batch_norm=self.batch_norm,
            train=self.train,
            dtype=self.dtype,
        )(embedding, x)
        return _highway_gate(h, x, self.groups)
