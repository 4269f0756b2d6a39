"""Convolutional building blocks, plain and meta-generated.

Rebuild of ``/root/reference/modules/layers.py`` and
``/root/reference/modules/generated.py`` as Flax linen modules with
channels-LAST layout ``[batch, time, channels]`` (XLA/TPU-native; the
reference is channels-first torch).

Key re-designs:
- grouped convolutions run on a group-major [g, B, T, c] layout as per-tap
  group-batched MXU matmuls (see grouped_conv1d_taps; XLA's grouped-conv
  path profiled ~10x off roofline in the full graph), and the highway gate
  split is a minor-dim slice instead of torch.chunk interleaving
  (modules/layers.py:149-151) — same math;
- inference can assign ANY language to each row group via ``group_langs``
  (gathered generator embeddings / kernel blocks / running stats), so a
  sorted batch runs each sample through only its own language's encoder
  instead of all g of them (the reference's accent path, which both it and
  this framework keep for true fractional blends, costs g-fold compute);
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


def flat_to_gmajor(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """[B, T, g*c] (group-blocked channels) -> group-major [g, B, T, c]."""
    b, t, gc = x.shape
    return jnp.transpose(x.reshape(b, t, groups, gc // groups), (2, 0, 1, 3))


def gmajor_to_flat(x4: jnp.ndarray) -> jnp.ndarray:
    """Group-major [g, B, T, c] -> [B, T, g*c] (inverse of flat_to_gmajor)."""
    g, b, t, c = x4.shape
    return jnp.transpose(x4, (1, 2, 0, 3)).reshape(b, t, g * c)


def grouped_conv1d_taps(
    x4: jnp.ndarray,         # group-major [g, B, T, cin]
    kernel: jnp.ndarray,     # [k, cin, g, cout]
    bias: Optional[jnp.ndarray],  # [g*cout] or None
    dilation: int,
    dtype: jnp.dtype,
) -> jnp.ndarray:
    """Grouped 'same' 1-D conv lowered as k per-tap group-batched matmuls on
    a group-major layout.

    XLA:TPU's layout assignment serves ``feature_group_count`` grouped convs
    badly inside the full encoder graph (profiled: 0.3-2.9 ms/conv at the
    flagship shapes vs the ~0.03-0.07 ms MXU roofline, with the group axis
    pushed into the 8-lane minor dim).  In group-major [g, B, T, c] every
    tap is einsum ``gbti,gio->gbto`` — a clean g-batched matmul with a
    128-lane minor dimension — and everything between convs (highway gates,
    masks, batch-norm) is elementwise or a minor-dim slice, so no per-layer
    relayout survives.
    """
    g, b, t, _ = x4.shape
    k = kernel.shape[0]
    lo, hi = same_pad_amounts(k, dilation)
    w = jnp.transpose(kernel, (0, 2, 1, 3)).astype(dtype)  # [k, g, cin, cout]
    xs = x4.astype(dtype)
    if k == 1:
        y = jnp.einsum("gbti,gio->gbto", xs, w[0])
    else:
        xp = jnp.pad(xs, ((0, 0), (0, 0), (lo, hi), (0, 0)))
        y = None
        for tap in range(k):
            contrib = jnp.einsum(
                "gbti,gio->gbto",
                xp[:, :, tap * dilation: tap * dilation + t],
                w[tap],
            )
            y = contrib if y is None else y + contrib
    if bias is not None:
        y = y + bias.reshape(g, 1, 1, -1).astype(y.dtype)
    return y


class _GroupedConv1d(nn.Module):
    """Param-compatible stand-in for ``nn.Conv(feature_group_count=g)``
    (same ``kernel [k, cin/g, out_total]`` / ``bias`` variables) that computes
    via :func:`grouped_conv1d_taps`.  Accepts the group-major [g, B, T, c]
    layout directly, or flat [B, T, g*c] (converted in and out)."""

    features: int
    kernel_size: int
    dilation: int
    groups: int
    use_bias: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 group_langs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        flat = x.ndim == 3
        cin = x.shape[-1] // self.groups if flat else x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, cin, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        k4 = kernel.reshape(self.kernel_size, cin, self.groups, -1)
        if group_langs is not None:
            # inference row groups: each row group uses its language's block
            k4 = k4[:, :, group_langs]
            if bias is not None:
                bias = bias.reshape(self.groups, -1)[group_langs].reshape(-1)
        x4 = flat_to_gmajor(x, self.groups) if flat else x
        y = grouped_conv1d_taps(x4, k4, bias, self.dilation, self.dtype)
        return gmajor_to_flat(y) if flat else y


class _GroupedBatchNorm(nn.Module):
    """``nn.BatchNorm``-compatible batch norm (same ``scale``/``bias`` params
    and flat ``mean``/``var`` running stats over all g*c channels) that
    operates on the group-major [g, B, T, c] layout: channel (g, c) maps to
    flat channel g*c + c.  Matches flax semantics: biased batch variance,
    ``ra = momentum*ra + (1-momentum)*batch``, f32 math."""

    num_features: int          # total channels (g * c)
    groups: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    use_running_average: bool = True

    @nn.compact
    def __call__(self, x4: jnp.ndarray,
                 group_langs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        g = self.groups
        c = self.num_features // g
        scale = self.param("scale", nn.initializers.ones,
                           (self.num_features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.num_features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros(self.num_features, jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones(self.num_features, jnp.float32))

        scale = scale.reshape(g, c)
        bias = bias.reshape(g, c)
        if group_langs is not None:
            assert self.use_running_average, (
                "row-group language gathers are inference-only")
            scale = scale[group_langs]
            bias = bias[group_langs]

        x32 = x4.astype(jnp.float32)
        if self.use_running_average:
            mean = ra_mean.value.reshape(g, c)
            var = ra_var.value.reshape(g, c)
            if group_langs is not None:
                mean = mean[group_langs]
                var = var[group_langs]
        else:
            mean = jnp.mean(x32, axis=(1, 2))                      # [g, c]
            var = jnp.mean(jnp.square(x32), axis=(1, 2)) - jnp.square(mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean.reshape(-1)
                ra_var.value = m * ra_var.value + (1 - m) * var.reshape(-1)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * inv
        return x32 * inv[:, None, None, :] + shift[:, None, None, :]


class ConvBlock(nn.Module):
    """Conv1d -> BatchNorm -> activation -> dropout, channels-last.

    Reference: modules/layers.py:50-86.  Grouped blocks (groups > 1) also
    accept the group-major [g, B, T, c] layout and keep it end to end.
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
    def __call__(self, x: jnp.ndarray,
                 group_langs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        train = self.train
        pad = same_pad_amounts(self.kernel, self.dilation)
        gmajor = x.ndim == 4
        if self.groups > 1 or gmajor:
            x = _GroupedConv1d(
                features=self.output_channels,
                kernel_size=self.kernel,
                dilation=self.dilation,
                groups=self.groups,
                use_bias=not self.batch_norm,
                dtype=self.dtype,
                name="Conv_0",
            )(x, group_langs)
        else:
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
            if gmajor:
                x = _GroupedBatchNorm(
                    num_features=self.output_channels,
                    groups=self.groups,
                    momentum=0.9,   # torch BatchNorm1d momentum=0.1
                    epsilon=1e-5,
                    use_running_average=not train,
                    name="BatchNorm_0",
                )(x, group_langs)
            else:
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
    index 1 = value half (modules/layers.py:147-153).

    Group-major [g, B, T, 2c] inputs: the channel axis is already per-group,
    so the halves are plain minor-dim slices (no relayout)."""
    if h.ndim == 4:
        c = h.shape[-1] // 2
        p = jax.nn.sigmoid(h[..., :c])
        return h[..., c:] * p + x * (1.0 - p)
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
    def __call__(self, x: jnp.ndarray,
                 group_langs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
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
        )(x, group_langs)
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
        f32; profiled).  Weight ports permute the columns once host-side.

        ``embedding`` may carry MORE rows than ``groups`` (row-group
        inference: the caller gathers per-row-group language embeddings, see
        encoder._to_row_groups) — the per-group channel splits come from the
        module config; the row count comes from the embedding."""
        r = embedding.shape[0]                  # row groups (g at training)
        cin = self.in_channels // self.groups
        cout = self.out_channels // self.groups

        e = nn.Dense(self.bottleneck_dim, name="bottleneck")(embedding)  # [r, b]
        kernel_flat = nn.Dense(cout * cin * self.kernel, name="kernel")(e)
        kernel = kernel_flat.reshape(r, self.kernel, cin, cout)
        kernel = jnp.transpose(kernel, (1, 2, 0, 3))  # [k, cin, r, cout]
        bias = (
            nn.Dense(cout, name="bias")(e).reshape(r * cout)
            if self.bias else None
        )
        return kernel, bias

    def conv(self, x: jnp.ndarray, kernel: jnp.ndarray,
             bias: jnp.ndarray | None) -> jnp.ndarray:
        """Apply the generated conv.  Group-major [g, B, T, cin] inputs stay
        group-major; flat [B, T, g*cin] (group-blocked channels,
        reference-compatible) is converted in and out."""
        if x.ndim == 4 or self.groups > 1:
            # per-tap group-batched matmuls: XLA:TPU's grouped-conv path is
            # far off the MXU roofline here (see grouped_conv1d_taps)
            x4 = x if x.ndim == 4 else flat_to_gmajor(x, self.groups)
            y = grouped_conv1d_taps(x4, kernel, bias, self.dilation, self.dtype)
            return y if x.ndim == 4 else gmajor_to_flat(y)
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
        """Generated per-row-group affine ``(scale, bias)`` (flattened to
        ``[r*c]``, r = embedding rows) plus the shared running-stat
        variables (always flat [g*c])."""
        per_group = self.num_features // self.groups

        e = nn.Dense(self.bottleneck_dim, name="bottleneck")(embedding)  # [r, b]
        affine = nn.Dense(2 * per_group, name="affine")(e)               # [r, 2c]
        scale = affine[:, :per_group].reshape(-1)                        # [r*c]
        bias = affine[:, per_group:].reshape(-1)

        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.num_features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.num_features, jnp.float32)
        )
        return scale, bias, ra_mean, ra_var

    def gathered_stats(self, ra_mean, ra_var, group_langs):
        """Running stats for each row group: flat [g*c] -> [r*c] by language
        gather (inference-only; see encoder._to_row_groups)."""
        c = self.num_features // self.groups
        mean = ra_mean.value.reshape(self.groups, c)[group_langs].reshape(-1)
        var = ra_var.value.reshape(self.groups, c)[group_langs].reshape(-1)
        return mean, var

    def __call__(self, embedding: jnp.ndarray, x: jnp.ndarray,
                 group_langs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``x``: flat [..., g*c] or group-major [r, B, T, c]; the running
        stats are stored flat [g*c] either way (checkpoint-stable)."""
        train = self.train
        scale, bias, ra_mean, ra_var = self.affine_and_stats(embedding)
        gmajor = x.ndim == 4
        r = embedding.shape[0]
        c = self.num_features // self.groups

        if train:
            assert group_langs is None, (
                "row-group language gathers are inference-only (running-stat "
                "updates would mix row groups)")
            x32 = x.astype(jnp.float32)
            if gmajor:
                mean = jnp.mean(x32, axis=(1, 2)).reshape(-1)        # [g*c]
                var = (jnp.mean(jnp.square(x32), axis=(1, 2)).reshape(-1)
                       - jnp.square(mean))
            else:
                axes = tuple(range(x.ndim - 1))
                mean = jnp.mean(x32, axis=axes).reshape(-1)
                var = jnp.var(x32, axis=axes).reshape(-1)
            n = x32.size / self.num_features
            # torch F.batch_norm updates running var with the unbiased estimator
            unbiased = var * (n / max(n - 1.0, 1.0))
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        elif group_langs is not None:
            mean, var = self.gathered_stats(ra_mean, ra_var, group_langs)
        else:
            mean = ra_mean.value
            var = ra_var.value

        inv = jax.lax.rsqrt(var + self.eps) * scale
        shift = bias - mean * inv
        if gmajor:
            inv = inv.reshape(r, 1, 1, c)
            shift = shift.reshape(r, 1, 1, c)
        # normalize in f32, return in the input dtype: keeps the elementwise
        # chain between MXU convs at bf16 width (HBM-bound otherwise)
        return (x * inv + shift).astype(x.dtype)


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

    def generate_folded(self, embedding: jnp.ndarray,
                        group_langs: Optional[jnp.ndarray] = None):
        """EVAL-mode kernel+bias with batch-norm FOLDED IN: running-stat
        normalization scales the GENERATED kernel instead of an elementwise
        pass over [B, T, g*C], so the conv emits already-normalized values
        (same math as reference modules/generated.py:94-96 in eval).

        ``group_langs`` [r]: inference row groups — the embedding is already
        language-gathered; gather the running stats the same way."""
        kernel, bias = self.conv_mod.generate(embedding)
        if self.bn_mod is not None:
            scale, b, ra_mean, ra_var = self.bn_mod.affine_and_stats(embedding)
            if group_langs is not None:
                mean, var = self.bn_mod.gathered_stats(
                    ra_mean, ra_var, group_langs)
            else:
                mean, var = ra_mean.value, ra_var.value
            inv = scale * jax.lax.rsqrt(var + self.bn_mod.eps)
            r = embedding.shape[0]
            kernel = kernel * inv.reshape(r, -1)  # [k, cin, r, cout] layout
            bias = b - mean * inv
        return kernel, bias

    def __call__(self, embedding: jnp.ndarray, x: jnp.ndarray,
                 group_langs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        train = self.train
        if self.batch_norm and not train:
            kernel, bias = self.generate_folded(embedding, group_langs)
            x = self.conv_mod.conv(x, kernel, bias)
        elif self.batch_norm:
            x = self.bn_mod(embedding, self.conv_mod(embedding, x),
                            group_langs)
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

    def __call__(self, embedding: jnp.ndarray, x: jnp.ndarray,
                 group_langs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.batch_norm and not self.train:
            # EVAL: split the 2x-wide conv at kernel-generation time into an
            # aligned gate conv + value conv (per-group channel blocks are
            # [gate c | value c], the torch even/odd chunk layout,
            # modules/layers.py:149-151).  The gate then needs no interleaved
            # re-chunking — profiled at ~1 ms/layer of pure data movement.
            kernel, bias = self.block.generate_folded(embedding, group_langs)
            c = self.out_channels // self.groups
            bias = bias.reshape(embedding.shape[0], 2 * c)
            act = get_activation(self.activation)
            h1 = act(self.block.conv_mod.conv(
                x, kernel[..., :c], bias[:, :c].reshape(-1)))
            h2 = act(self.block.conv_mod.conv(
                x, kernel[..., c:], bias[:, c:].reshape(-1)))
            p = jax.nn.sigmoid(h1)
            return h2 * p + x * (1.0 - p)
        h = self.block(embedding, x, group_langs)
        return _highway_gate(h, x, self.groups)
