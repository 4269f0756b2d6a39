"""Tacotron 2 top-level model, factories and losses.

Rebuild of ``/root/reference/modules/tacotron2.py:222-485``: character
embedding, encoder dispatch (5 variants), optional adversarial classifier,
scan decoder, postnet dispatch (conv residual / CBHG linear), output masking,
and the composite loss (2*MSE pre + MSE post + weighted stop BCE + guided
attention + adversarial CE).

Layout note: this framework is channels-LAST — spectrograms are
``[batch, frames, bins]`` (the reference is ``[batch, bins, frames]``).
CLI boundaries transpose when writing reference-format ``.npy`` files.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multilingual_text_to_speech_tpu.models.classifier import (
    CosineSimilarityClassifier,
    ReversalClassifier,
    cosine_similarity_classifier_loss,
    reversal_classifier_loss,
)
from multilingual_text_to_speech_tpu.models.decoder import Decoder
from multilingual_text_to_speech_tpu.models.encoder import (
    ConditionalEncoder,
    ConvolutionalEncoder,
    Encoder,
    GeneratedConvolutionalEncoder,
    MultiEncoder,
)
from multilingual_text_to_speech_tpu.models.postnet import Postnet, PostnetCBHG


def lengths_to_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """[B] -> bool [B, max_length] (reference: utils/__init__.py:7-10)."""
    return jnp.arange(max_length)[None, :] < lengths[:, None]


def _languages_to_weights(languages: Optional[jnp.ndarray], batch: int,
                          time: int, num_langs: int) -> Optional[jnp.ndarray]:
    """Normalize language conditioning to per-character weights [B, T, L].

    Accepts [B] indices, [B, T] per-character indices, or [B, T, L] weights
    (the reference's 1-D/2-D/3-D language specs, tacotron2.py:387-408).
    Fixes the reference's broken one-hot collate path (dataset.py:302-303).
    """
    if languages is None:
        return None
    if languages.ndim == 1:
        languages = jnp.broadcast_to(languages[:, None], (batch, time))
    if languages.ndim == 2:
        return jax.nn.one_hot(languages, num_langs, dtype=jnp.float32)
    return languages.astype(jnp.float32)


class Tacotron(nn.Module):
    """Multilingual Tacotron 2 (reference: modules/tacotron2.py:222-408).

    ``train`` is a construction-time attribute: build one train-mode and one
    eval-mode instance; both share a single parameter tree.
    """

    hp: Any
    train: bool = False
    dtype: jnp.dtype = jnp.float32
    # device mesh for the fused Pallas training decode's data-parallel
    # shard_map path (models/decoder.py); None = single-device
    mesh: Any = None

    def setup(self):
        hp = self.hp
        self.embedding = nn.Embed(
            hp.total_symbols(), hp.embedding_dimension,
            embedding_init=nn.initializers.xavier_uniform(),
            name="embedding",
        )
        self.encoder = self._make_encoder()
        if hp.reversal_classifier:
            if hp.reversal_classifier_type == "reversal":
                self.classifier = ReversalClassifier(
                    hidden_dim=hp.reversal_classifier_dim,
                    output_dim=hp.speaker_number,
                    gradient_clipping_bounds=hp.reversal_gradient_clipping,
                    dtype=self.dtype,
                )
            else:
                self.classifier = CosineSimilarityClassifier(
                    output_dim=hp.speaker_number,
                    gradient_clipping_bounds=hp.reversal_gradient_clipping,
                    dtype=self.dtype,
                )
        self.decoder = Decoder(hp, train=self.train, dtype=self.dtype,
                               mesh=self.mesh)
        if hp.predict_linear:
            self.postnet = PostnetCBHG(
                output_dim=hp.num_fft // 2 + 1,
                bank_size=hp.cbhg_bank_kernels,
                bank_channels=hp.cbhg_bank_dimension,
                projection_channels=hp.cbhg_projection_dimension,
                projection_kernel_size=hp.cbhg_projection_kernel_size,
                highway_dim=hp.cbhg_highway_dimension,
                gru_dim=hp.cbhg_rnn_dim,
                dropout=hp.cbhg_dropout,
                train=self.train,
                dtype=self.dtype,
            )
        else:
            self.postnet = Postnet(
                dimension=hp.postnet_dimension,
                num_blocks=hp.postnet_blocks,
                kernel_size=hp.postnet_kernel_size,
                dropout=hp.dropout,
                train=self.train,
                dtype=self.dtype,
            )

    def _make_encoder(self):
        """Encoder dispatch (reference: modules/tacotron2.py:286-303)."""
        hp = self.hp
        ln = hp.language_number if hp.multi_language else 1
        common = dict(
            num_blocks=hp.encoder_blocks,
            kernel_size=hp.encoder_kernel_size,
            dropout=hp.dropout,
            train=self.train,
            dtype=self.dtype,
        )
        if hp.encoder_type == "simple":
            return Encoder(hp.encoder_dimension, **common)
        if hp.encoder_type == "separate":
            return MultiEncoder(ln, hp.encoder_dimension, **common)
        if hp.encoder_type == "shared":
            return ConditionalEncoder(
                ln, hp.input_language_embedding, hp.encoder_dimension, **common
            )
        if hp.encoder_type == "convolutional":
            # dropout 0.05 hardcoded in the reference factory (tacotron2.py:300)
            return ConvolutionalEncoder(
                hp.embedding_dimension, hp.encoder_dimension,
                dropout=0.05, groups=ln, train=self.train, dtype=self.dtype,
            )
        if hp.encoder_type == "generated":
            return GeneratedConvolutionalEncoder(
                hp.embedding_dimension, hp.encoder_dimension,
                dropout=0.05,
                embedding_dim=hp.generator_dim,
                bottleneck_dim=hp.generator_bottleneck_dim,
                groups=ln, train=self.train, dtype=self.dtype,
            )
        raise ValueError(f"unknown encoder type: {self.hp.encoder_type}")

    # -- shared encode path ----------------------------------------------------

    def _encode(self, text, text_lengths, languages, mix_languages=False,
                group_langs=None):
        """``mix_languages``: inference-time accent mixing for the grouped
        convolutional encoders (training uses the language-interleaved
        grouped-batch contract instead and must NOT mix).

        ``group_langs`` [r]: row-group inference for the grouped encoders —
        the batch is language-sorted/padded by the host (synthesis.py) and
        row group i (samples [i*B/r, (i+1)*B/r)) runs ONLY language
        ``group_langs[i]``'s encoder: g-fold cheaper than mixing when the
        language weights are one-hot (the overwhelmingly common case)."""
        hp = self.hp
        b, t = text.shape
        langs_w = _languages_to_weights(
            languages, b, t, hp.language_number if hp.multi_language else 1
        )
        embedded = self.embedding(text)
        # padding_idx=0 parity: PAD positions embed to zero
        embedded = jnp.where((text != 0)[..., None], embedded, 0.0)
        grouped = hp.encoder_type in ("convolutional", "generated")
        if group_langs is not None and grouped:
            encoded = self.encoder(
                embedded.astype(self.dtype), text_lengths, None,
                group_langs=group_langs,
            )
        else:
            encoder_langs = langs_w if (mix_languages or not grouped) else None
            encoded = self.encoder(
                embedded.astype(self.dtype), text_lengths, encoder_langs
            )
        return encoded.astype(jnp.float32), langs_w

    # -- training / teacher-forced forward --------------------------------------

    def __call__(
        self,
        text: jnp.ndarray,             # [B, T] int
        text_lengths: jnp.ndarray,     # [B]
        target: jnp.ndarray,           # [B, F, M] mel target
        target_lengths: jnp.ndarray,   # [B]
        speakers: Optional[jnp.ndarray],
        languages: Optional[jnp.ndarray],
        teacher_forcing_ratio,
        rng: jax.Array,
    ) -> Dict[str, jnp.ndarray]:
        hp = self.hp
        encoded, langs_w = self._encode(text, text_lengths, languages,
                                        mix_languages=False)

        speaker_prediction = (
            self.classifier(encoded) if hp.reversal_classifier else None
        )

        lang_idx = (
            jnp.argmax(langs_w, axis=2) if langs_w is not None else None
        )
        pre, stop, alignment = self.decoder(
            encoded, text_lengths, target, teacher_forcing_ratio,
            speakers, lang_idx, rng,
        )
        post = self.postnet(pre, target_lengths)

        frames = target.shape[1]
        target_mask = lengths_to_mask(target_lengths, frames)
        # padded stop logits forced to 1000 (tacotron2.py:378-380)
        stop = jnp.where(target_mask, stop, 1000.0)
        pre = pre * target_mask[..., None]
        post = post * target_mask[..., None]

        return {
            "post_prediction": post,
            "pre_prediction": pre,
            "stop_token": stop,
            "alignment": alignment,
            "speaker_prediction": speaker_prediction,
            "encoder_output": encoded,
        }

    # -- inference pieces (driven chunk-by-chunk from the host) ------------------

    def encode_for_inference(
        self,
        text: jnp.ndarray,
        text_lengths: jnp.ndarray,
        speakers: Optional[jnp.ndarray],
        languages: Optional[jnp.ndarray],
        group_langs: Optional[jnp.ndarray] = None,
    ):
        """Encode + prepare decoder memory; returns everything decode_chunk
        needs (reference: tacotron2.py:387-403).

        ``group_langs``: language-sorted row-group encode (see ``_encode``)
        — skips the g-fold accent-mixing expansion when languages are
        one-hot."""
        encoded, langs_w = self._encode(text, text_lengths, languages,
                                        mix_languages=group_langs is None,
                                        group_langs=group_langs)
        lang_idx = jnp.argmax(langs_w, axis=2) if langs_w is not None else None
        memory, memory_transform = self.decoder.prepare_memory(
            encoded, speakers, lang_idx
        )
        mask = lengths_to_mask(text_lengths, text.shape[1])
        carry = self.decoder.initial_carry(
            text.shape[0], text.shape[1], memory.shape[-1]
        )
        return memory, memory_transform, mask, carry

    def decode_chunk(self, carry, memory, memory_transform, mask, rng,
                     chunk_frames: int):
        return self.decoder.decode_chunk(
            carry, memory, memory_transform, mask, rng, chunk_frames
        )

    def apply_postnet(self, pre: jnp.ndarray, lengths: jnp.ndarray):
        return self.postnet(pre, lengths)


def build_model(hp, train: bool = False, dtype=jnp.float32) -> Tacotron:
    return Tacotron(hp, train=train, dtype=dtype)


# ---------------------------------------------------------------------------
# Loss (reference: modules/tacotron2.py:411-485)
# ---------------------------------------------------------------------------

@dataclass
class TacotronLossState:
    """Mutable guided-attention schedule carried across steps and persisted
    in checkpoints (reference: TacotronLoss state_dict, tacotron2.py:433-441)."""

    guided_att_variance: float
    guided_att_steps: int
    guided_att_gamma: float

    @classmethod
    def init(cls, hp) -> "TacotronLossState":
        return cls(
            guided_att_variance=hp.guided_attention_toleration,
            guided_att_steps=hp.guided_attention_steps,
            guided_att_gamma=hp.guided_attention_gain,
        )

    def update(self) -> "TacotronLossState":
        return TacotronLossState(
            guided_att_variance=self.guided_att_variance * self.guided_att_gamma,
            guided_att_steps=max(0, self.guided_att_steps - 1),
            guided_att_gamma=self.guided_att_gamma,
        )

    def state_dict(self):
        return {
            "guided_att_variance": self.guided_att_variance,
            "guided_att_steps": self.guided_att_steps,
            "guided_att_gamma": self.guided_att_gamma,
        }

    @classmethod
    def from_state_dict(cls, d):
        return cls(**d)


def _bce_with_logits_pos_weight(logits, targets, pos_weight):
    """torch.nn.functional.binary_cross_entropy_with_logits with pos_weight."""
    log_sig = -jax.nn.softplus(-logits)       # log sigmoid(x)
    log_one_minus = -jax.nn.softplus(logits)  # log(1 - sigmoid(x))
    loss = -(pos_weight * targets * log_sig + (1.0 - targets) * log_one_minus)
    return jnp.mean(loss)


def guided_attention_loss(
    alignments: jnp.ndarray,       # [B, F, T]
    input_lengths: jnp.ndarray,    # [B]
    target_lengths: jnp.ndarray,   # [B]
    variance,
) -> jnp.ndarray:
    """Diagonal-band penalty (reference: tacotron2.py:443-457), vectorized:
    W[b,f,l] = 1 - exp(-((l/L_b - f/F_b)^2) / (2 g^2)) within the valid
    rectangle; loss = mean_b sum(W*A)/F_b."""
    _, frames, tokens = alignments.shape
    f = jnp.arange(frames, dtype=jnp.float32)[None, :, None]
    l = jnp.arange(tokens, dtype=jnp.float32)[None, None, :]
    fl = target_lengths.astype(jnp.float32)[:, None, None]
    ll = input_lengths.astype(jnp.float32)[:, None, None]
    w = 1.0 - jnp.exp(-((l / ll - f / fl) ** 2) / (2.0 * variance ** 2))
    valid = (f < fl) & (l < ll)
    w = jnp.where(valid, w, 0.0)
    per_sample = jnp.sum(w * alignments, axis=(1, 2)) / jnp.maximum(
        target_lengths.astype(jnp.float32), 1.0
    )
    return jnp.mean(per_sample)


def tacotron_loss(
    outputs: Dict[str, jnp.ndarray],
    *,
    hp,
    input_lengths: jnp.ndarray,
    target_lengths: jnp.ndarray,
    pre_target: jnp.ndarray,        # [B, F, M] mel
    post_target: jnp.ndarray,       # [B, F, M or bins]
    stop_target: jnp.ndarray,       # [B, F]
    speakers: Optional[jnp.ndarray],
    guided_att_variance,
    guided_att_active: bool | jnp.ndarray = True,
    classifier_kernel: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Composite loss (reference: tacotron2.py:459-485).

    Means are over ALL elements including padding (predictions are masked to
    zero and targets are zero-padded — reference F.mse_loss semantics)."""
    losses: Dict[str, jnp.ndarray] = {
        "mel_pre": 2.0 * jnp.mean(
            (outputs["pre_prediction"] - pre_target) ** 2
        ),
        "mel_pos": jnp.mean(
            (outputs["post_prediction"] - post_target) ** 2
        ),
        "stop_token": _bce_with_logits_pos_weight(
            outputs["stop_token"], stop_target, 100.0
        ) / (hp.num_mels + 2),
    }

    if hp.reversal_classifier:
        if hp.reversal_classifier_type == "reversal":
            cls_loss = reversal_classifier_loss(
                input_lengths, speakers, outputs["speaker_prediction"]
            )
        else:
            cls_loss = cosine_similarity_classifier_loss(
                input_lengths, speakers, outputs["speaker_prediction"],
                outputs["encoder_output"], classifier_kernel,
            )
        losses["lang_class"] = cls_loss * (
            hp.reversal_classifier_w / (hp.num_mels + 2)
        )

    if hp.guided_attention_loss:
        if isinstance(guided_att_active, (bool, int)) and not guided_att_active:
            # Static (Python) False: skip the [B, F, T] penalty entirely, like
            # the reference after guided_att_steps expire (tacotron2.py:444) —
            # XLA can then drop the alignment stacking from the train step.
            losses["guided_att"] = jnp.zeros(())
        else:
            ga = guided_attention_loss(
                outputs["alignment"], input_lengths, target_lengths,
                guided_att_variance,
            )
            losses["guided_att"] = ga * guided_att_active

    total = sum(losses.values())
    return total, losses
