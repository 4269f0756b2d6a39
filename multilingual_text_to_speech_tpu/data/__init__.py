"""Data layer: corpus loaders, metafiles, sampling, static-shape batching.

Rebuild of the reference's ``dataset/`` + ``utils/samplers.py`` without any
torch dependency: plain-Python/numpy dataset objects, language-balanced and
"perfect" (language-interleaved) batch sampling, and an XLA-first collate
that pads to BUCKET boundaries so every compiled program sees a small, fixed
set of shapes.
"""

from multilingual_text_to_speech_tpu.data.dataset import (
    TextToSpeechDataset,
    TextToSpeechDatasetCollection,
    create_meta_file,
)
from multilingual_text_to_speech_tpu.data.batching import Batch, Collate
from multilingual_text_to_speech_tpu.data.sampling import (
    BalancedBatchSampler,
    PerfectBatchSampler,
    SimpleBatchSampler,
)

__all__ = [
    "TextToSpeechDataset", "TextToSpeechDatasetCollection", "create_meta_file",
    "Batch", "Collate",
    "BalancedBatchSampler", "PerfectBatchSampler", "SimpleBatchSampler",
]
