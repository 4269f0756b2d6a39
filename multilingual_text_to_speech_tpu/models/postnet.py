"""Post-nets: residual conv stack and the CBHG linear-spectrogram predictor.

Rebuild of ``/root/reference/modules/tacotron2.py:49-76`` (conv Postnet) and
``/root/reference/modules/cbhg.py`` (CBHG with conv bank, maxpool, highway
layers and a masked BiGRU).  Channels-last layout throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from multilingual_text_to_speech_tpu.models.layers import ConvBlock


class Postnet(nn.Module):
    """Residual enhancement: 5 ConvBlocks (tanh except last) + skip
    (reference: modules/tacotron2.py:49-76)."""

    dimension: int = 512
    num_blocks: int = 5
    kernel_size: int = 5
    dropout: float = 0.5
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_lengths=None) -> jnp.ndarray:
        # x: [B, F, M]
        assert self.num_blocks > 1
        residual = x
        input_dim = x.shape[-1]
        for i in range(self.num_blocks):
            last = i == self.num_blocks - 1
            x = ConvBlock(
                output_channels=input_dim if last else self.dimension,
                kernel=self.kernel_size,
                dropout=self.dropout,
                activation="identity" if last else "tanh",
                train=self.train,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
        return x + residual


class HighwayLayer(nn.Module):
    """Gated dense layer (reference: modules/cbhg.py:72-88)."""

    dimension: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = jax.nn.relu(nn.Dense(self.dimension, dtype=self.dtype,
                                 name="linear")(x).astype(jnp.float32))
        p = jax.nn.sigmoid(nn.Dense(self.dimension, dtype=self.dtype,
                                    name="gate")(x).astype(jnp.float32))
        return h * p + x * (1.0 - p)


class PostnetCBHG(nn.Module):
    """CBHG predicting linear spectrograms from mels
    (reference: modules/cbhg.py:8-69).

    conv bank (k=1..bank_size) -> maxpool(2, stride 1) -> two projection
    convs -> residual -> 4 highway layers -> masked BiGRU -> linear output.
    The reference's sort/pack/unsort dance (cbhg.py:57-64) is replaced by
    ``seq_lengths``-aware scans — no reordering needed.
    """

    output_dim: int                    # num_fft//2 + 1
    bank_size: int = 8
    bank_channels: int = 128
    projection_channels: int = 256
    projection_kernel_size: int = 3
    highway_dim: int = 128
    gru_dim: int = 128
    dropout: float = 0.0
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_lengths: jnp.ndarray) -> jnp.ndarray:
        # x: [B, F, M]
        assert self.gru_dim % 2 == 0
        residual = x
        input_dim = x.shape[-1]

        bank = [
            ConvBlock(self.bank_channels, k, self.dropout, "relu",
                      train=self.train, dtype=self.dtype, name=f"bank{k}")(x)
            for k in range(1, self.bank_size + 1)
        ]
        h = jnp.concatenate(bank, axis=-1)

        # maxpool width 2, stride 1, right-padded (cbhg.py:31-32)
        h = jnp.maximum(h, jnp.pad(h, ((0, 0), (0, 1), (0, 0)))[:, 1:])

        h = ConvBlock(self.projection_channels, self.projection_kernel_size,
                      self.dropout, "relu", train=self.train, dtype=self.dtype,
                      name="projection1")(h)
        h = ConvBlock(input_dim, self.projection_kernel_size,
                      self.dropout, "identity", train=self.train,
                      dtype=self.dtype, name="projection2")(h)

        h = h + residual
        h = jax.nn.relu(nn.Dense(self.highway_dim, dtype=self.dtype,
                                 name="pre_highway")(h).astype(jnp.float32))
        for i in range(4):
            h = HighwayLayer(self.highway_dim, dtype=self.dtype,
                             name=f"highway{i}")(h)

        half = self.gru_dim // 2
        bigru = nn.Bidirectional(
            nn.RNN(nn.GRUCell(half, dtype=self.dtype), name="fwd"),
            nn.RNN(nn.GRUCell(half, dtype=self.dtype), name="bwd"),
            name="bigru",
        )
        h = bigru(h, seq_lengths=x_lengths)
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name="output")(h).astype(jnp.float32)
