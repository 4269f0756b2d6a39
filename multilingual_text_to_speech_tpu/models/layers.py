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
    def generate(self, embedding: jnp.ndarray):
        """Emit the conv kernel ``[k, in/g, g, out/g]`` and optional bias
        ``[out_total]`` from the generator embeddings.

        The generating Dense's columns are ordered ``(k, cin, cout)`` per
        group — NOT the torch ``(cout, cin, k)`` order — so every reshape on
        the emitted kernel keeps a lane-tileable minor dimension.  The torch
        order would materialize a ``[g, cout, cin, k]`` tensor whose minor
        dim k pads 3 -> 128 lanes (a ~1 ms, 42x-padded relayout per layer at
        f32; profiled).  Weight ports permute the columns once host-side."""
        g = self.groups
        assert embedding.shape[0] == g, (
            "Number of generator embeddings must match conv groups."
        )
        cin = self.in_channels // g
        cout = self.out_channels // g

        e = nn.Dense(self.bottleneck_dim, name="bottleneck")(embedding)  # [g, b]
        kernel_flat = nn.Dense(cout * cin * self.kernel, name="kernel")(e)
        kernel = kernel_flat.reshape(g, self.kernel, cin, cout)
        kernel = jnp.transpose(kernel, (1, 2, 0, 3))  # [k, cin, g, cout]
        bias = (
            nn.Dense(cout, name="bias")(e).reshape(g * cout)
            if self.bias else None
        )
        return kernel, bias

    def conv(self, x: jnp.ndarray, kernel: jnp.ndarray,
             bias: jnp.ndarray | None) -> jnp.ndarray:
        """Apply the generated conv to the flat [B, T, g*cin] layout
        (language-interleaved channel blocks, reference-compatible)."""
        pad = same_pad_amounts(self.kernel, self.dilation)
        wio = kernel.reshape(kernel.shape[0], kernel.shape[1], -1)  # [k,cin,g*cout]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            wio.astype(self.dtype),
            window_strides=(1,),
            padding=[pad],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.groups,
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    def __call__(self, embedding: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        kernel, bias = self.generate(embedding)
        return self.conv(x, kernel, bias)


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
    def affine_and_stats(self, embedding: jnp.ndarray):
        """Generated per-group affine ``(scale, bias)`` (flattened to
        ``[g*c]``) plus the shared running-stat variables."""
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
        return scale, bias, ra_mean, ra_var

    def __call__(self, embedding: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        """``x``: flat [..., g*c]; the running stats are flat [g*c]."""
        train = self.train
        scale, bias, ra_mean, ra_var = self.affine_and_stats(embedding)
        ch_shape = (self.num_features,)

        if train:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - len(ch_shape)))
            mean = jnp.mean(x32, axis=axes).reshape(-1)
            var = jnp.var(x32, axis=axes).reshape(-1)
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
        shift = bias - mean * inv
        # normalize in f32, return in the input dtype: keeps the elementwise
        # chain between MXU convs at bf16 width (HBM-bound otherwise)
        return (x * inv.reshape(ch_shape) + shift.reshape(ch_shape)).astype(x.dtype)


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

    def setup(self):
        self.conv_mod = Conv1dGenerated(
            bottleneck_dim=self.bottleneck_dim,
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            kernel=self.kernel,
            dilation=self.dilation,
            groups=self.groups,
            bias=not self.batch_norm,
            dtype=self.dtype,
            name="Conv1dGenerated_0",
        )
        self.bn_mod = (
            BatchNorm1dGenerated(
                bottleneck_dim=self.bottleneck_dim,
                num_features=self.out_channels,
                groups=self.groups,
                train=self.train,
                name="BatchNorm1dGenerated_0",
            )
            if self.batch_norm else None
        )
        if self.dropout > 0.0:
            self.drop_mod = nn.Dropout(
                rate=self.dropout, deterministic=not self.train,
                name="Dropout_0",
            )

    def generate_folded(self, embedding: jnp.ndarray):
        """EVAL-mode kernel+bias with batch-norm FOLDED IN: running-stat
        normalization scales the GENERATED kernel instead of an elementwise
        pass over [B, T, g*C], so the conv emits already-normalized values
        (same math as reference modules/generated.py:94-96 in eval)."""
        kernel, bias = self.conv_mod.generate(embedding)
        if self.bn_mod is not None:
            scale, b, ra_mean, ra_var = self.bn_mod.affine_and_stats(embedding)
            inv = scale * jax.lax.rsqrt(ra_var.value + self.bn_mod.eps)
            g = self.groups
            kernel = kernel * inv.reshape(g, -1)  # [k, cin, g, cout] layout
            bias = b - ra_mean.value * inv
        return kernel, bias

    def __call__(self, embedding: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        train = self.train
        if self.batch_norm and not train:
            kernel, bias = self.generate_folded(embedding)
            x = self.conv_mod.conv(x, kernel, bias)
        elif self.batch_norm:
            x = self.bn_mod(embedding, self.conv_mod(embedding, x))
        else:
            x = self.conv_mod(embedding, x)
        x = get_activation(self.activation)(x)
        if self.dropout > 0.0:
            x = self.drop_mod(x)
        return x


class HighwayConvBlockGenerated(nn.Module):
    """Gated generated conv (reference: modules/layers.py:156-178).

    Eval path: the 2x-wide conv is SPLIT at kernel-generation time into two
    aligned convs (per-group gate half / value half), so the highway gate is
    pure elementwise math — no interleaved channel re-chunking (profiled at
    ~1 ms/layer of pure data movement at serving batch sizes).
    """

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

    def setup(self):
        self.block = ConvBlockGenerated(
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
            name="ConvBlockGenerated_0",
        )

    def __call__(self, embedding: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        if self.batch_norm and not self.train:
            # EVAL: split the 2x-wide conv at kernel-generation time into an
            # aligned gate conv + value conv (per-group channel blocks are
            # [gate c | value c], the torch even/odd chunk layout,
            # modules/layers.py:149-151).  The gate then needs no interleaved
            # re-chunking — profiled at ~1 ms/layer of pure data movement.
            kernel, bias = self.block.generate_folded(embedding)
            g, c = self.groups, self.out_channels // self.groups
            bias = bias.reshape(g, 2 * c)
            act = get_activation(self.activation)
            h1 = act(self.block.conv_mod.conv(
                x, kernel[..., :c], bias[:, :c].reshape(-1)))
            h2 = act(self.block.conv_mod.conv(
                x, kernel[..., c:], bias[:, c:].reshape(-1)))
            p = jax.nn.sigmoid(h1)
            return h2 * p + x * (1.0 - p)
        h = self.block(embedding, x)
        return _highway_gate(h, x, self.groups)
