"""Hyper-parameter system.

Feature-parity rebuild of the reference config layer
(``/root/reference/params/params.py:4-165``): ~90 hyper-parameters covering the
training loop, dataset selection, text alphabets, model shape variants and
audio DSP, with JSON overlay loading and a full ``state_dict`` round-trip that
is embedded into every checkpoint.

Unlike the reference (a mutated static class acting as a global singleton),
``HParams`` is an explicit instance passed to model/data constructors — the
functional-JAX equivalent of the same contract.  The JSON schema is identical,
so the reference's ``params/*.json`` experiment configs load verbatim.
"""

from __future__ import annotations

import copy
import json
from typing import Any, Dict, List, Optional

import numpy as np

# Default values mirror /root/reference/params/params.py:12-136 so that the
# reference's JSON overlays (which only specify diffs) resolve to the same
# effective configuration.
_DEFAULTS: Dict[str, Any] = {
    "version": "1.0",
    # ------------------------------------------------------------------
    # Training loop
    # ------------------------------------------------------------------
    "epochs": 300,
    "batch_size": 52,
    "learning_rate": 1e-3,
    "learning_rate_decay": 0.5,
    "learning_rate_decay_start": 15000,
    "learning_rate_decay_each": 15000,
    "learning_rate_encoder": 1e-3,
    "weight_decay": 1e-6,
    "encoder_optimizer": False,
    "max_output_length": 5000,
    "gradient_clipping": 0.25,
    "reversal_gradient_clipping": 0.25,
    "guided_attention_loss": True,
    "guided_attention_steps": 20000,
    "guided_attention_toleration": 0.25,
    "guided_attention_gain": 1.00025,
    "constant_teacher_forcing": True,
    "teacher_forcing": 1.0,
    "teacher_forcing_steps": 100000,
    "teacher_forcing_start_steps": 50000,
    "checkpoint_each_epochs": 10,
    "parallelization": True,
    # ------------------------------------------------------------------
    # Dataset
    # ------------------------------------------------------------------
    "dataset": "ljspeech",
    "cache_spectrograms": True,
    "languages": ["en-us"],
    "balanced_sampling": False,
    "perfect_sampling": False,
    # ------------------------------------------------------------------
    # Text
    # ------------------------------------------------------------------
    "characters": "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz ",
    "case_sensitive": True,
    "remove_multiple_wspaces": True,
    "use_punctuation": True,
    "punctuations_out": '、。，"(),.:;¿?¡!\\',
    "punctuations_in": "'-",
    "use_phonemes": False,
    "phonemes": "ɹɐpbtdkɡfvθðszʃʒhmnŋlrwjeəɪɒuːɛiaʌʊɑɜɔx ",
    # ------------------------------------------------------------------
    # Model
    # ------------------------------------------------------------------
    "embedding_dimension": 512,
    "encoder_type": "simple",
    "encoder_dimension": 512,
    "encoder_blocks": 3,
    "encoder_kernel_size": 5,
    "generator_dim": 8,
    "generator_bottleneck_dim": 4,
    "prenet_dimension": 256,
    "prenet_layers": 2,
    "attention_type": "location_sensitive",
    "attention_dimension": 128,
    "attention_kernel_size": 31,
    "attention_location_dimension": 32,
    "decoder_dimension": 1024,
    "decoder_regularization": "dropout",
    "zoneout_hidden": 0.1,
    "zoneout_cell": 0.1,
    "dropout_hidden": 0.1,
    "postnet_dimension": 512,
    "postnet_blocks": 5,
    "postnet_kernel_size": 5,
    "dropout": 0.5,
    "predict_linear": False,
    "cbhg_bank_kernels": 8,
    "cbhg_bank_dimension": 128,
    "cbhg_projection_kernel_size": 3,
    "cbhg_projection_dimension": 256,
    "cbhg_highway_dimension": 128,
    "cbhg_rnn_dim": 128,
    "cbhg_dropout": 0.0,
    "multi_speaker": False,
    "multi_language": False,
    "speaker_embedding_dimension": 32,
    "language_embedding_dimension": 4,
    "input_language_embedding": 4,
    "reversal_classifier": False,
    "reversal_classifier_type": "reversal",
    "reversal_classifier_dim": 256,
    "reversal_classifier_w": 1.0,
    "stop_frames": 5,
    "speaker_number": 0,
    "language_number": 0,
    # ------------------------------------------------------------------
    # Audio
    # ------------------------------------------------------------------
    "sample_rate": 22050,
    "num_fft": 1102,
    "num_mels": 80,
    "num_mfcc": 13,
    "stft_window_ms": 50,
    "stft_shift_ms": 12.5,
    "griffin_lim_iters": 60,
    "griffin_lim_power": 1.5,
    "normalize_spectrogram": True,
    "use_preemphasis": True,
    "preemphasis": 0.97,
    # ------------------------------------------------------------------
    # TPU-specific additions (no reference counterpart)
    # ------------------------------------------------------------------
    # Static-shape bucketing for XLA: batches are padded to the smallest
    # bucket boundary instead of the per-batch maximum.  Multiples chosen to
    # keep the attention alignment [frames x chars] MXU-tileable.
    "bucket_text_multiple": 32,
    "bucket_frame_multiple": 64,
    # Inference decode runs in chunks of this many frames inside a while
    # loop so synthesis can stop early at chunk granularity (XLA needs
    # static trip counts inside each compiled chunk).
    "decode_chunk_frames": 64,
    # Compute dtype for matmul-heavy paths ('bfloat16' or 'float32').
    # Parameters and loss accumulation stay float32.
    "compute_dtype": "bfloat16",
    # PRNG implementation for the training-time dropout mask stream
    # (encoder/postnet ConvBlocks; the fused decoder kernels derive their
    # masks from their own in-kernel counter hash and are unaffected).
    # 'rbg' lowers to the TPU-native RngBitGenerator; threefry arithmetic
    # otherwise costs real device time at flagship activation sizes (4.3 of
    # the postnet's 8.7 ms fwd+bwd at B=50/F=512 — see
    # tools/hw_results/postnet_microbench_2026-08-19.log). 'threefry' keeps
    # masks bit-stable across jax versions/backends at that cost.
    "dropout_rng_impl": "rbg",
    # Fused whole-chunk Pallas decoder for inference (ops/pallas_decoder.py):
    # the AR step loop runs inside one kernel with weights and attention
    # memory VMEM-resident. Used by the Synthesizer when the config is
    # supported (location-sensitive attention) and the backend is a TPU;
    # training and unsupported configs stay on the XLA scan.
    "use_pallas_decoder": True,
    # W8A8 int8 serving mode for the fused decoder's two LSTM gate matmuls
    # (per-output-column weight scales, dynamic per-row activation quant
    # inside the kernel). ~1.8x on the dominant MXU work of the serving
    # step. Default-on for serving: measured quality impact is 0.0007 dB
    # MCD on the trained fixture (demos/int8_quality_results.json) — two
    # orders of magnitude inside BASELINE.md's 0.1 dB criterion — and the
    # fused-vs-XLA crossover grid stays all-green with it on
    # (tools/hw_results/decode_crossover_2026-08-19b.log). Set False for
    # the exact-bf16 path (bench.py --no-int8 benches that).
    "pallas_decoder_int8": True,
    # int8 storage for the fused serving decoder's attention-memory and
    # memory-transform VMEM streams (per-channel / per-attention-dim dequant
    # scales). Halves the step's dominant operand traffic; None defers to the
    # MTTS_PALLAS_INT8_STREAMS env toggle (off until hardware-validated).
    "pallas_decoder_int8_streams": None,
    # Fused Pallas TRAINING decoder (ops/pallas_train_decoder.py): the
    # teacher-forced scan runs as chunked forward/backward kernels under a
    # custom VJP with weights and attention memory VMEM-resident. Applies on
    # TPU for supported configs (location-sensitive attention, batch<=128);
    # unsupported shapes/configs use the XLA scan.
    "use_pallas_train_decoder": True,
    # Device mesh axis sizes: data parallel x model (language-group) parallel.
    "mesh_data_parallel": -1,  # -1 = all devices
    "mesh_model_parallel": 1,
}

# Attributes that may appear at runtime (mirroring the reference's mutation of
# the Params class during training: train.py:239-250) and must survive the
# state_dict round-trip.
_RUNTIME_KEYS = (
    "unique_speakers",
    "mel_normalize_mean",
    "mel_normalize_variance",
    "lin_normalize_mean",
    "lin_normalize_variance",
)


def _to_jsonable(value: Any) -> Any:
    """Convert numpy containers to plain JSON-serializable python values."""
    if isinstance(value, np.ndarray):
        return value.tolist()
    if isinstance(value, (np.floating, np.integer)):
        return value.item()
    if isinstance(value, (list, tuple)):
        return [_to_jsonable(v) for v in value]
    if isinstance(value, dict):
        return {k: _to_jsonable(v) for k, v in value.items()}
    return value


class HParams:
    """Mutable hyper-parameter bag with JSON overlay + state_dict round-trip.

    Usage::

        hp = HParams()                  # reference defaults
        hp = HParams.from_json(path)    # defaults + JSON overlay
        hp.overlay(path)                # further overlay (fine-tuning)
        d = hp.state_dict()             # full dict (checkpoint embedding)
        hp2 = HParams.from_state_dict(d)
    """

    def __init__(self, **overrides: Any):
        for key, value in _DEFAULTS.items():
            setattr(self, key, copy.deepcopy(value))
        for key, value in overrides.items():
            setattr(self, key, value)

    # -- overlay / persistence -------------------------------------------------

    def load_state_dict(self, d: Dict[str, Any]) -> "HParams":
        for key, value in d.items():
            setattr(self, key, value)
        return self

    def state_dict(self) -> Dict[str, Any]:
        return {
            k: _to_jsonable(v)
            for k, v in vars(self).items()
            if not k.startswith("_")
        }

    @classmethod
    def from_state_dict(cls, d: Dict[str, Any]) -> "HParams":
        hp = cls()
        hp.load_state_dict(d)
        return hp

    def overlay(self, json_path: str) -> "HParams":
        with open(json_path, "r", encoding="utf-8") as f:
            self.load_state_dict(json.load(f))
        return self

    # Aliases matching the reference API surface (params/params.py:149-158).
    load = overlay

    @classmethod
    def from_json(cls, json_path: str) -> "HParams":
        return cls().overlay(json_path)

    def save(self, json_path: str) -> None:
        with open(json_path, "w", encoding="utf-8") as f:
            json.dump(self.state_dict(), f, indent=4, ensure_ascii=False)

    def copy(self) -> "HParams":
        return HParams.from_state_dict(copy.deepcopy(self.state_dict()))

    # -- derived quantities ----------------------------------------------------

    def symbols_count(self) -> int:
        """Size of the input alphabet (reference: params/params.py:160-165)."""
        count = len(self.phonemes if self.use_phonemes else self.characters)
        if self.use_punctuation:
            count += len(self.punctuations_out) + len(self.punctuations_in)
        return count

    def total_symbols(self) -> int:
        """Alphabet plus PAD/EOS/UNK (reference: modules/tacotron2.py:236)."""
        return self.symbols_count() + 3

    def stft_window_samples(self) -> int:
        return int(self.sample_rate * self.stft_window_ms / 1000)

    def stft_shift_samples(self) -> int:
        return int(self.sample_rate * self.stft_shift_ms / 1000)

    def linear_bins(self) -> int:
        return self.num_fft // 2 + 1

    def decoder_input_dimension(self) -> int:
        """Encoder output dim + optional speaker/language embedding dims
        (reference: modules/tacotron2.py:252-256)."""
        dim = self.encoder_dimension
        if self.multi_speaker:
            dim += self.speaker_embedding_dimension
        if self.multi_language:
            dim += self.language_embedding_dimension
        return dim

    # -- normalization constants -------------------------------------------

    def mel_normalization(self) -> Optional[tuple]:
        mean = getattr(self, "mel_normalize_mean", None)
        var = getattr(self, "mel_normalize_variance", None)
        if mean is None or var is None:
            return None
        return (np.asarray(mean, dtype=np.float32).reshape(-1, 1),
                np.asarray(var, dtype=np.float32).reshape(-1, 1))

    def lin_normalization(self) -> Optional[tuple]:
        mean = getattr(self, "lin_normalize_mean", None)
        var = getattr(self, "lin_normalize_variance", None)
        if mean is None or var is None:
            return None
        return (np.asarray(mean, dtype=np.float32).reshape(-1, 1),
                np.asarray(var, dtype=np.float32).reshape(-1, 1))

    def __repr__(self) -> str:  # pragma: no cover - debugging helper
        keys = ("version", "dataset", "encoder_type", "languages",
                "multi_speaker", "multi_language", "batch_size")
        inner = ", ".join(f"{k}={getattr(self, k, None)!r}" for k in keys)
        return f"HParams({inner})"


def default_hparams() -> HParams:
    return HParams()
