"""Adversarial speaker classifiers with gradient reversal/clipping.

Rebuild of ``/root/reference/modules/classifier.py`` using ``jax.custom_vjp``
instead of torch autograd Functions: the forward is identity, the backward
clamps the cotangent and (for reversal) negates and scales it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def gradient_reversal(x, scale: float = 1.0, clamp: float = 0.25):
    """Identity forward; backward clamps grad to ±clamp then negates × scale
    (reference: modules/classifier.py:6-18)."""
    return x


def _grev_fwd(x, scale, clamp):
    return x, None


def _grev_bwd(scale, clamp, _, g):
    return (-scale * jnp.clip(g, -clamp, clamp),)


gradient_reversal.defvjp(_grev_fwd, _grev_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_clipping(x, clamp: float = 0.25):
    """Identity forward; backward clamps grad to ±clamp
    (reference: modules/classifier.py:21-32)."""
    return x


def _gclip_fwd(x, clamp):
    return x, None


def _gclip_bwd(clamp, _, g):
    return (jnp.clip(g, -clamp, clamp),)


gradient_clipping.defvjp(_gclip_fwd, _gclip_bwd)


class ReversalClassifier(nn.Module):
    """Two dense layers behind a gradient-reversal layer
    (reference: modules/classifier.py:35-60)."""

    hidden_dim: int
    output_dim: int
    gradient_clipping_bounds: float = 0.25
    scale_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = gradient_reversal(x, self.scale_factor, self.gradient_clipping_bounds)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc2")(x)
        return x.astype(jnp.float32)


def reversal_classifier_loss(
    input_lengths: jnp.ndarray,   # [B]
    speakers: jnp.ndarray,        # [B] int
    prediction: jnp.ndarray,      # [B, T, n_speakers] logits
) -> jnp.ndarray:
    """Masked per-character cross-entropy over speakers
    (reference: modules/classifier.py:62-69, ignore_index semantics)."""
    b, t, _ = prediction.shape
    mask = jnp.arange(t)[None, :] < input_lengths[:, None]
    logp = jax.nn.log_softmax(prediction, axis=-1)
    target = jnp.broadcast_to(speakers[:, None], (b, t))
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    return jnp.sum(jnp.where(mask, nll, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


class CosineSimilarityClassifier(nn.Module):
    """Single dense layer behind a gradient-clipping layer
    (reference: modules/classifier.py:72-88).  Flagged non-converging by the
    reference authors (params/params.py:113); kept for parity."""

    output_dim: int
    gradient_clipping_bounds: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = gradient_clipping(x, self.gradient_clipping_bounds)
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        name="fc")(x).astype(jnp.float32)


def cosine_similarity_classifier_loss(
    input_lengths: jnp.ndarray,
    speakers: jnp.ndarray,
    prediction: jnp.ndarray,
    embeddings: jnp.ndarray,      # encoder outputs [B, T, C]
    classifier_kernel: jnp.ndarray,  # [C, n_speakers]
) -> jnp.ndarray:
    """CE plus mean |cosine| between encoder outputs and class weights
    (reference: modules/classifier.py:90-106)."""
    loss = reversal_classifier_loss(input_lengths, speakers, prediction)
    dot = jnp.einsum("btc,cs->bts", embeddings, classifier_kernel)
    norm_e = jnp.linalg.norm(embeddings, axis=2, keepdims=True)
    norm_w = jnp.linalg.norm(classifier_kernel, axis=0)[None, None, :]
    cosine = jnp.abs(dot / jnp.maximum(norm_e * norm_w, 1e-8))
    return loss + jnp.mean(jnp.sum(cosine, axis=2))
