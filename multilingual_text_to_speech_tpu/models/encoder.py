"""Encoders: vanilla BiLSTM, conditional, separate, grouped convolutional,
and the meta-learning generated convolutional encoder.

Rebuild of ``/root/reference/modules/encoder.py`` with TPU re-designs:

- the packed-sequence BiLSTM becomes ``nn.Bidirectional`` scans with
  ``seq_lengths`` masking (same semantics: padding contributes nothing and
  the backward pass starts at each sample's true last token);
- ``MultiEncoder``'s L independent encoders run as ONE vmapped encoder with
  a leading language axis (``nn.vmap`` over parameters) instead of a Python
  loop over modules (modules/encoder.py:87-97);
- the grouped convolutional encoders keep the reference's
  ``[B/L, T, L*C]`` grouped layout fed by language-interleaved batches
  (modules/encoder.py:100-156), which XLA lowers to grouped convs on MXU;
- inference-time accent control (per-character language weight mixing,
  modules/encoder.py:136-156) expands the single input across all language
  groups and mixes outputs with normalized weights.

Reference quirk *not* replicated: MultiEncoder's weight normalization
``x_langs.sum(2, keepdim=True)[0]`` (modules/encoder.py:89) indexes the
batch dimension by mistake; here weights are normalized per sample.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multilingual_text_to_speech_tpu.models.layers import (
    ConvBlock,
    ConvBlockGenerated,
    HighwayConvBlock,
    HighwayConvBlockGenerated,
)


def _normalize_lang_weights(x_langs: jnp.ndarray) -> jnp.ndarray:
    """Normalize per-character language weights [B, T, L] to sum to 1."""
    total = jnp.sum(x_langs, axis=2, keepdims=True)
    return x_langs / jnp.maximum(total, 1e-8)


class Encoder(nn.Module):
    """Vanilla Tacotron 2 encoder: conv stack -> masked BiLSTM
    (reference: modules/encoder.py:9-45)."""

    output_dim: int
    num_blocks: int = 3
    kernel_size: int = 5
    dropout: float = 0.5
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,               # [B, T, E]
        x_lengths: jnp.ndarray,       # [B]
        x_langs: Optional[jnp.ndarray] = None,  # unused (API parity)
    ) -> jnp.ndarray:
        assert self.output_dim % 2 == 0
        for i in range(self.num_blocks):
            x = ConvBlock(
                output_channels=self.output_dim,
                kernel=self.kernel_size,
                dropout=self.dropout,
                activation="relu",
                train=self.train,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
        half = self.output_dim // 2
        bilstm = nn.Bidirectional(
            nn.RNN(nn.OptimizedLSTMCell(half, dtype=self.dtype), name="fwd"),
            nn.RNN(nn.OptimizedLSTMCell(half, dtype=self.dtype), name="bwd"),
            name="bilstm",
        )
        x = bilstm(x, seq_lengths=x_lengths)
        # zero out padding (pad_packed_sequence parity)
        t = x.shape[1]
        mask = jnp.arange(t)[None, :] < x_lengths[:, None]
        return jnp.where(mask[..., None], x, 0.0)


class ConditionalEncoder(nn.Module):
    """Language embedding concatenated to each character embedding, then a
    vanilla encoder (reference: modules/encoder.py:48-71)."""

    num_langs: int
    langs_embedding_dim: int
    output_dim: int
    num_blocks: int = 3
    kernel_size: int = 5
    dropout: float = 0.5
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_lengths, x_langs):
        # x_langs: [B, T, L] per-character one-hot/weights -> indices
        lang_idx = jnp.argmax(x_langs, axis=2)
        emb = nn.Embed(self.num_langs, self.langs_embedding_dim,
                       name="language_embedding")(lang_idx)
        x = jnp.concatenate([x, emb.astype(x.dtype)], axis=-1)
        return Encoder(
            self.output_dim, self.num_blocks, self.kernel_size,
            self.dropout, train=self.train, dtype=self.dtype, name="encoder",
        )(x, x_lengths)


class MultiEncoder(nn.Module):
    """L language-specific vanilla encoders, outputs mixed by per-character
    language weights (reference: modules/encoder.py:74-97).

    TPU design: one vmapped encoder with stacked parameters — all languages
    encode in parallel in a single fused program; the per-character mix is
    one einsum.
    """

    num_langs: int
    output_dim: int
    num_blocks: int = 3
    kernel_size: int = 5
    dropout: float = 0.5
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_lengths, x_langs):
        VmapEncoder = nn.vmap(
            Encoder,
            in_axes=(None, None),          # same inputs for every language
            out_axes=0,                    # [L, B, T, C]
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
            axis_size=self.num_langs,
        )
        outs = VmapEncoder(
            self.output_dim, self.num_blocks, self.kernel_size,
            self.dropout, train=self.train, dtype=self.dtype, name="encoders",
        )(x, x_lengths)
        w = _normalize_lang_weights(x_langs)                  # [B, T, L]
        return jnp.einsum("btl,lbtc->btc", w, outs)


class _GroupedConvStack(nn.Module):
    """The DCTTS-style grouped highway conv topology shared by the plain and
    generated convolutional encoders (reference: modules/encoder.py:125-130,
    180-191): 2 ConvBlocks(k=1) + 8 Highway(k=3, dil 3^i twice) +
    2 Highway(k=3) + 2 Highway(k=1)."""

    input_dim: int     # per-group
    output_dim: int    # per-group
    dropout: float
    groups: int
    generated: bool = False
    bottleneck_dim: int = 4
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, embedding=None, mask=None, group_langs=None):
        """``x``: group-major [r, B/r, T, C] (see ``_to_grouped`` /
        ``_to_row_groups``).
        ``mask``: optional [r, B/r, T, 1] zero-mask applied after every
        block so activations beyond each sample's length stay exactly zero —
        this makes the stack invariant to bucket padding (each layer then
        sees zeros beyond the boundary, identical to running at the exact
        length with zero 'same'-padding).
        ``group_langs``: optional [r] language id per row group (inference);
        ``embedding`` must then already be gathered to [r, E]."""
        g = self.groups
        cin, cout = self.input_dim * g, self.output_dim * g
        specs = (
            [("conv", 1, 1, "relu"), ("conv", 1, 1, "identity")]
            + [("hw", 3, 3 ** i, "identity") for i in range(4)]
            + [("hw", 3, 3 ** i, "identity") for i in range(4)]
            + [("hw", 3, 1, "identity")] * 2
            + [("hw", 1, 1, "identity")] * 2
        )
        for li, (kind, k, dil, act) in enumerate(specs):
            in_ch = cin if li == 0 else cout
            if self.generated:
                cls = ConvBlockGenerated if kind == "conv" else HighwayConvBlockGenerated
                x = cls(
                    bottleneck_dim=self.bottleneck_dim,
                    in_channels=in_ch,
                    out_channels=cout,
                    kernel=k,
                    dropout=self.dropout,
                    activation=act,
                    dilation=dil,
                    groups=g,
                    train=self.train,
                    dtype=self.dtype,
                    name=f"layer{li}",
                )(embedding, x, group_langs)
                if mask is not None:
                    x = x * mask
            else:
                cls = ConvBlock if kind == "conv" else HighwayConvBlock
                x = cls(
                    output_channels=cout,
                    kernel=k,
                    dropout=self.dropout,
                    activation=act,
                    dilation=dil,
                    groups=g,
                    train=self.train,
                    dtype=self.dtype,
                    name=f"layer{li}",
                )(x, group_langs)
                if mask is not None:
                    x = x * mask
        return x


def _to_grouped(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """[B, T, C] with language-interleaved batch -> group-major [g, B/g, T, C].

    Batch entries (k*g + j) for j in 0..g-1 carry language j (the perfect
    sampler contract, utils/samplers.py:50-67); entry k*g+j becomes row
    [j, k].  The reference packs groups into channels ([B/g, T, g*C],
    modules/encoder.py:100-156); here the group axis leads so every conv is
    a g-batched MXU matmul and all between-conv ops are elementwise — XLA's
    layout assignment of the channel-packed form was profiled ~10x off
    roofline (see layers.grouped_conv1d_taps)."""
    b, t, c = x.shape
    return jnp.transpose(x.reshape(b // groups, groups, t, c), (1, 0, 2, 3))


def _expand_for_mixing(x, x_lengths, groups: int):
    """Replicate every sample across all language groups for inference-time
    accent mixing: out[b*g + j] = x[b] (language-interleaved layout where
    sample b's replicas occupy one group row)."""
    b, t, c = x.shape
    x = jnp.broadcast_to(x[:, None], (b, groups, t, c)).reshape(
        b * groups, t, c)
    if x_lengths is not None:
        x_lengths = jnp.broadcast_to(
            x_lengths[:, None], (b, groups)).reshape(b * groups)
    return x, x_lengths


def _mix_grouped_outputs(h, x_langs, groups: int):
    """h [B*g, T, C] (sample-major replicas) + weights [B, T, L] ->
    weighted per-character mix [B, T, C]."""
    bg, t, c = h.shape
    b = bg // groups
    h = h.reshape(b, groups, t, c)
    w = _normalize_lang_weights(x_langs)          # [B, T, L]
    return jnp.einsum("btl,bltc->btc", w, h)


def _grouped_length_mask(x_lengths, batch: int, time: int,
                         groups: int, dtype=jnp.float32):
    """Per-sample length mask in the group-major layout: [g, B/g, T, 1]
    (broadcasts over channels)."""
    if x_lengths is None:
        return None
    m = (jnp.arange(time)[None, :] < x_lengths[:, None]).astype(dtype)
    m = m.reshape(batch // groups, groups, time).transpose(1, 0, 2)
    return m[..., None]                                    # [g, B/g, T, 1]


def _to_row_groups(x: jnp.ndarray, row_groups: int) -> jnp.ndarray:
    """[B, T, C] with language-CONTIGUOUS batch -> [r, B/r, T, C].

    Row-group inference layout (no interleave contract): the host sorts the
    batch by language and pads each language's run to a whole number of row
    groups; samples [i*B/r, (i+1)*B/r) form row group i, whose language id
    is ``group_langs[i]``.  A zero-copy reshape — no transpose."""
    b, t, c = x.shape
    return x.reshape(row_groups, b // row_groups, t, c)


def _from_row_groups(x4: jnp.ndarray) -> jnp.ndarray:
    """[r, B/r, T, C] -> [B, T, C] (inverse of _to_row_groups)."""
    r, br, t, c = x4.shape
    return x4.reshape(r * br, t, c)


def _row_group_length_mask(x_lengths, batch: int, time: int,
                           row_groups: int, dtype=jnp.float32):
    """Length mask in the row-group layout: [r, B/r, T, 1]."""
    if x_lengths is None:
        return None
    m = (jnp.arange(time)[None, :] < x_lengths[:, None]).astype(dtype)
    return m.reshape(row_groups, batch // row_groups, time)[..., None]


def _from_grouped(x4: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Group-major [g, B/g, T, C] -> [B, T, C] (inverse of _to_grouped)."""
    g, bg, t, c = x4.shape
    return jnp.transpose(x4, (1, 0, 2, 3)).reshape(g * bg, t, c)


class ConvolutionalEncoder(nn.Module):
    """Fully convolutional grouped encoder ("separate" strategy when
    groups = num languages; reference: modules/encoder.py:100-156)."""

    input_dim: int
    output_dim: int
    dropout: float = 0.05
    groups: int = 1
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_lengths=None, x_langs=None, group_langs=None):
        # group_langs given => row-group inference (language-sorted batch,
        # each sample encoded ONLY by its own language's kernels — g-fold
        # cheaper than mixing); x_langs given => accent mixing: replicate
        # every sample across all language groups and mix the per-group
        # outputs with the per-character weights (the reference supports
        # that for batch 1 only; modules/encoder.py:136-156)
        if group_langs is not None:
            assert x_langs is None, "row groups and accent mixing are exclusive"
            r = group_langs.shape[0]
            mask = _row_group_length_mask(
                x_lengths, x.shape[0], x.shape[1], r, dtype=self.dtype)
            h = _to_row_groups(x, r)
            h = self._stack(h, mask=mask, group_langs=group_langs)
            return _from_row_groups(h)

        inference_mix = x_langs is not None
        if inference_mix:
            x, x_lengths = _expand_for_mixing(x, x_lengths, self.groups)

        mask = _grouped_length_mask(
            x_lengths, x.shape[0], x.shape[1], self.groups, dtype=self.dtype,
        )
        h = _to_grouped(x, self.groups)
        h = self._stack(h, mask=mask)
        h = _from_grouped(h, self.groups)

        if inference_mix:
            h = _mix_grouped_outputs(h, x_langs, self.groups)
        return h

    def _stack(self, h, mask=None, group_langs=None):
        return _GroupedConvStack(
            input_dim=self.input_dim,
            output_dim=self.output_dim,
            dropout=self.dropout,
            groups=self.groups,
            generated=False,
            train=self.train,
            dtype=self.dtype,
            name="stack",
        )(h, mask=mask, group_langs=group_langs)


class GeneratedConvolutionalEncoder(nn.Module):
    """Grouped convolutional encoder whose weights are emitted by a
    contextual parameter generator conditioned on a learned per-language
    embedding — the paper's headline meta-learning model
    (reference: modules/encoder.py:159-221)."""

    input_dim: int
    output_dim: int
    dropout: float = 0.05
    embedding_dim: int = 10     # generator_dim
    bottleneck_dim: int = 4     # generator_bottleneck_dim
    groups: int = 1
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_lengths=None, x_langs=None, group_langs=None):
        e = nn.Embed(self.groups, self.embedding_dim, name="generator_embedding")(
            jnp.arange(self.groups)
        )

        if group_langs is not None:
            # row-group inference: gather each row group's language embedding
            # — the whole generator then emits kernels per ROW GROUP, and
            # every sample pays only its own language's encoder
            assert x_langs is None, "row groups and accent mixing are exclusive"
            r = group_langs.shape[0]
            mask = _row_group_length_mask(
                x_lengths, x.shape[0], x.shape[1], r, dtype=self.dtype)
            h = _to_row_groups(x, r)
            h = self._stack(h, e[group_langs], mask, group_langs)
            return _from_row_groups(h)

        inference_mix = x_langs is not None
        if inference_mix:
            x, x_lengths = _expand_for_mixing(x, x_lengths, self.groups)

        mask = _grouped_length_mask(
            x_lengths, x.shape[0], x.shape[1], self.groups, dtype=self.dtype,
        )
        h = _to_grouped(x, self.groups)
        h = self._stack(h, e, mask)
        h = _from_grouped(h, self.groups)

        if inference_mix:
            h = _mix_grouped_outputs(h, x_langs, self.groups)
        return h

    def _stack(self, h, embedding, mask=None, group_langs=None):
        return _GroupedConvStack(
            input_dim=self.input_dim,
            output_dim=self.output_dim,
            dropout=self.dropout,
            groups=self.groups,
            generated=True,
            bottleneck_dim=self.bottleneck_dim,
            train=self.train,
            dtype=self.dtype,
            name="stack",
        )(h, embedding=embedding, mask=mask, group_langs=group_langs)
