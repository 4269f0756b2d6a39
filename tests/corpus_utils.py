"""Shared test fixtures: synthetic CSS10-style corpora and tiny model configs."""

import os

import numpy as np

from multilingual_text_to_speech_tpu.config import HParams
from multilingual_text_to_speech_tpu.data import (
    TextToSpeechDataset,
    create_meta_file,
)
from multilingual_text_to_speech_tpu.ops.io import save_wav

TEXTS = ["hallo welt", "guten tag", "wie geht es", "danke sehr",
         "bitte schoen", "auf wiedersehen", "gute nacht", "viel glueck"]


def make_css10_corpus(root, languages=("german", "french"), n_per_lang=4,
                      sr=22050, seed=0):
    """Synthesize a tiny CSS10-layout corpus with real (noise+tone) wavs."""
    rng = np.random.RandomState(seed)
    for lang in languages:
        d = os.path.join(root, lang, "wavs")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(root, lang, "transcript.txt"), "w",
                  encoding="utf-8") as f:
            for i in range(n_per_lang):
                dur = 2000 + 500 * (i % 4)
                t = np.arange(dur) / sr
                wav = (
                    0.2 * np.sin(2 * np.pi * (200 + 50 * i) * t)
                    + rng.randn(dur) * 0.01
                ).astype(np.float32)
                rel = os.path.join("wavs", f"{i:03}.wav")
                save_wav(wav, os.path.join(root, lang, rel), sr)
                print(f"{rel}|x|{TEXTS[i % len(TEXTS)]} {lang}", file=f)
    return root


def build_corpus_with_metafiles(root, hp, languages=("german", "french"),
                                n_per_lang=4, val_every=4):
    """Corpus + metafile + train/val split + normalization constants in hp."""
    make_css10_corpus(root, languages, n_per_lang)
    create_meta_file(
        "css10", root, "all.txt", hp,
        audio_sample_rate=hp.sample_rate, num_fft_freqs=hp.num_fft,
        spectrograms=True, phonemes=False,
    )
    lines = open(os.path.join(root, "all.txt"), encoding="utf-8").read().splitlines()
    train = [l for i, l in enumerate(lines) if i % val_every != val_every - 1]
    val = [l for i, l in enumerate(lines) if i % val_every == val_every - 1]
    open(os.path.join(root, "train.txt"), "w", encoding="utf-8").write(
        "\n".join(train) + "\n")
    open(os.path.join(root, "val.txt"), "w", encoding="utf-8").write(
        "\n".join(val) + "\n")
    return root


def tiny_model_hp(**over) -> HParams:
    """Laptop-sized model dims, real topology."""
    hp = HParams()
    hp.embedding_dimension = 16
    hp.encoder_dimension = 16
    hp.encoder_blocks = 2
    hp.encoder_kernel_size = 3
    hp.prenet_dimension = 8
    hp.attention_dimension = 8
    hp.attention_kernel_size = 5
    hp.attention_location_dimension = 4
    hp.decoder_dimension = 16
    hp.postnet_dimension = 8
    hp.postnet_blocks = 2
    hp.num_mels = 20
    hp.generator_dim = 4
    hp.generator_bottleneck_dim = 2
    hp.bucket_text_multiple = 8
    hp.bucket_frame_multiple = 16
    for k, v in over.items():
        setattr(hp, k, v)
    return hp
