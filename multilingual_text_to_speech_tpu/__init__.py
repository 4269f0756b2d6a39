"""TPU-native multilingual Tacotron 2 framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Tomiinek/Multilingual_Text_to_Speech (multilingual Tacotron 2 with
meta-learning contextual parameter generation, adversarial speaker
classification, code-switching synthesis, Griffin-Lim vocoding and
GTA export) built TPU-first:

- pure-functional models (Flax linen) with ``lax.scan`` autoregressive
  decoding instead of Python frame loops,
- batched on-device audio DSP (STFT / mel / Griffin-Lim) instead of
  host-side librosa,
- SPMD data parallelism via ``jax.sharding`` meshes instead of
  ``torch.nn.DataParallel``,
- static-shape bucketed batching for XLA.
"""

__version__ = "0.1.0"

from multilingual_text_to_speech_tpu.config import HParams

__all__ = ["HParams", "__version__"]
