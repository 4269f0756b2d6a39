"""On-device signal-processing ops (XLA/Pallas).

The reference does all audio DSP on the host with librosa/scipy
(``/root/reference/utils/audio.py``).  Here the hot paths — STFT, mel
projection, Griffin-Lim — are batched jittable JAX ops so feature
extraction and vocoding run on the TPU.
"""

from multilingual_text_to_speech_tpu.ops import stft, mel, audio, io, dtw

__all__ = ["stft", "mel", "audio", "io", "dtw"]
