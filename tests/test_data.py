"""Data layer tests: loaders, metafile ingestion, samplers, bucketed collate."""

import os

import numpy as np
import pytest

from multilingual_text_to_speech_tpu.config import HParams
from multilingual_text_to_speech_tpu.data import (
    BalancedBatchSampler,
    Collate,
    PerfectBatchSampler,
    SimpleBatchSampler,
    TextToSpeechDataset,
    TextToSpeechDatasetCollection,
    create_meta_file,
)
from multilingual_text_to_speech_tpu.data.batching import batch_iterator
from multilingual_text_to_speech_tpu.ops.io import save_wav


def make_css10_corpus(root, languages=("german", "french"), n_per_lang=4,
                      sr=22050):
    """Synthesize a tiny CSS10-layout corpus with real wav files."""
    rng = np.random.RandomState(0)
    texts = ["hallo welt", "guten tag", "wie geht es", "danke sehr"]
    for lang in languages:
        d = os.path.join(root, lang, "wavs")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(root, lang, "transcript.txt"), "w",
                  encoding="utf-8") as f:
            for i in range(n_per_lang):
                dur = 2000 + 500 * i
                wav = (rng.randn(dur) * 0.1).astype(np.float32)
                rel = os.path.join("wavs", f"{i:03}.wav")
                save_wav(wav, os.path.join(root, lang, rel), sr)
                print(f"{rel}|x|{texts[i % len(texts)]} {lang}", file=f)
    return root


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("css10"))
    make_css10_corpus(root)

    hp = HParams()
    hp.languages = ["german", "french"]
    hp.multi_language = True
    hp.case_sensitive = False

    create_meta_file(
        "css10", root, "all.txt", hp,
        audio_sample_rate=22050, num_fft_freqs=1102,
        spectrograms=True, phonemes=False,
    )
    # split into train/val
    lines = open(os.path.join(root, "all.txt"), encoding="utf-8").read().splitlines()
    train = [l for i, l in enumerate(lines) if i % 4 != 3]
    val = [l for i, l in enumerate(lines) if i % 4 == 3]
    open(os.path.join(root, "train.txt"), "w", encoding="utf-8").write("\n".join(train) + "\n")
    open(os.path.join(root, "val.txt"), "w", encoding="utf-8").write("\n".join(val) + "\n")

    # compute normalization constants like the trainer does (train.py:246-250)
    hp_raw = hp.copy()
    hp_raw.normalize_spectrogram = False
    ds = TextToSpeechDataset(os.path.join(root, "train.txt"), root, hp_raw)
    hp.mel_normalize_mean, hp.mel_normalize_variance = (
        ds.get_normalization_constants(True)
    )
    return root, hp


def test_create_meta_file_and_cache(corpus):
    root, hp = corpus
    lines = open(os.path.join(root, "all.txt"), encoding="utf-8").read().splitlines()
    assert len(lines) == 8
    fields = lines[0].split("|")
    assert len(fields) == 8
    mel = np.load(os.path.join(root, fields[4]))
    lin = np.load(os.path.join(root, fields[5]))
    assert mel.shape[0] == 80 and lin.shape[0] == 552
    assert mel.shape[1] == lin.shape[1]


def test_dataset_collection(corpus):
    root, hp = corpus
    col = TextToSpeechDatasetCollection(root, hp)
    assert len(col.train) == 6 and len(col.dev) == 2
    assert col.train.get_num_languages() == 2
    # speakers = languages for css10, first-seen order (french sorts first)
    assert sorted(col.train.unique_speakers) == ["french", "german"]

    speaker, language, seq, mel, linear = col.train[0]
    assert isinstance(seq, list) and seq[-1] == 1  # EOS
    assert mel.shape[1] == 80  # channels-last
    assert linear is None


def test_normalization_constants(corpus):
    root, hp = corpus
    hp2 = hp.copy()
    hp2.normalize_spectrogram = False
    ds = TextToSpeechDataset(os.path.join(root, "train.txt"), root, hp2)
    mean, std = ds.get_normalization_constants(True)
    assert mean.shape == (80, 1) and std.shape == (80, 1)
    assert np.isfinite(mean).all() and (std > 0).all()


def test_dataset_normalizes_when_configured(corpus):
    root, hp = corpus
    hp2 = hp.copy()
    hp2.normalize_spectrogram = False
    ds_raw = TextToSpeechDataset(os.path.join(root, "train.txt"), root, hp2)
    mean, std = ds_raw.get_normalization_constants(True)

    hp3 = hp.copy()
    hp3.normalize_spectrogram = True
    hp3.mel_normalize_mean = mean
    hp3.mel_normalize_variance = std
    ds = TextToSpeechDataset(os.path.join(root, "train.txt"), root, hp3)
    _, _, _, mel, _ = ds[0]
    _, _, _, mel_raw, _ = ds_raw[0]
    np.testing.assert_allclose(
        mel, (mel_raw - mean.T) / std.T, atol=1e-4
    )


def test_simple_sampler():
    s = SimpleBatchSampler(10, 4, shuffle=False, drop_last=True)
    batches = list(s)
    assert batches == [[0, 1, 2, 3], [4, 5, 6, 7]]
    s2 = SimpleBatchSampler(10, 4, shuffle=True, drop_last=False, seed=1)
    got = sorted(i for b in s2 for i in b)
    assert got == list(range(10))


def test_balanced_sampler_equalizes_languages():
    # language 0 has 90 items, language 1 has 10 -> balanced draws ~50/50
    langs = [0] * 90 + [1] * 10
    s = BalancedBatchSampler(langs, batch_size=20, seed=0)
    drawn = [i for b in s for i in b]
    frac_lang1 = np.mean([langs[i] for i in drawn])
    assert 0.3 < frac_lang1 < 0.7


def test_perfect_sampler_interleaves():
    langs = [0] * 10 + [1] * 10 + [2] * 10
    s = PerfectBatchSampler(langs, num_languages=3, batch_size=6,
                            shuffle=True, drop_last=True)
    batches = list(s)
    assert all(len(b) == 6 for b in batches)
    for b in batches:
        got_langs = [langs[i] for i in b]
        assert got_langs == [0, 1, 2, 0, 1, 2]


def test_perfect_sampler_divisibility_assert():
    with pytest.raises(AssertionError):
        PerfectBatchSampler([0, 1], num_languages=2, batch_size=5)


def test_perfect_sampler_tail_truncation():
    # 5 items of each of 2 langs, batch 8, dp=2: tail has 1 group -> dropped
    langs = [0] * 5 + [1] * 5
    s = PerfectBatchSampler(langs, 2, 8, data_parallel_shards=2,
                            shuffle=False, drop_last=False)
    batches = list(s)
    assert len(batches[0]) == 8
    assert len(batches) == 1  # tail (1 group of 2) not divisible by dp -> gone


def test_collate_bucketing(corpus):
    root, hp = corpus
    hp2 = hp.copy()
    hp2.normalize_spectrogram = False
    hp2.bucket_text_multiple = 16
    hp2.bucket_frame_multiple = 32
    ds = TextToSpeechDataset(os.path.join(root, "train.txt"), root, hp2)
    collate = Collate(hp2)
    batch = collate([ds[i] for i in range(4)])

    assert batch.utterances.shape[1] % 16 == 0
    assert batch.mel_spectrograms.shape[1] % 32 == 0
    assert batch.mel_spectrograms.shape[2] == 80
    assert batch.stop_tokens.shape == batch.mel_spectrograms.shape[:2]
    assert batch.languages is not None and batch.speakers is None

    # stop targets: zero before len-stop_frames, one after (incl. padding)
    i = 0
    f = int(batch.spectrogram_lengths[i])
    assert batch.stop_tokens[i, : f - hp2.stop_frames].sum() == 0
    assert (batch.stop_tokens[i, f - hp2.stop_frames :] == 1).all()

    # mel padding is zero
    assert np.allclose(batch.mel_spectrograms[i, f:], 0.0)


def test_batch_iterator(corpus):
    root, hp = corpus
    hp2 = hp.copy()
    hp2.normalize_spectrogram = False
    ds = TextToSpeechDataset(os.path.join(root, "train.txt"), root, hp2)
    sampler = PerfectBatchSampler(
        [ds.items[i]["language"] for i in range(len(ds))], 2, 2,
        shuffle=False, drop_last=True,
    )
    batches = list(batch_iterator(ds, sampler, Collate(hp2)))
    assert len(batches) == 3
    for b in batches:
        assert list(b.languages) == [0, 1]  # interleaved


def test_uncached_spectrogram_computation(corpus):
    """cache_spectrograms=False computes spectrograms from audio on the fly
    (reference: dataset/dataset.py:145-152)."""
    root, hp = corpus
    hp2 = hp.copy()
    hp2.normalize_spectrogram = False
    hp2.cache_spectrograms = False
    ds = TextToSpeechDataset(os.path.join(root, "train.txt"), root, hp2)
    _, _, _, mel_live, _ = ds[0]
    hp3 = hp.copy()
    hp3.normalize_spectrogram = False
    ds_cached = TextToSpeechDataset(os.path.join(root, "train.txt"), root, hp3)
    _, _, _, mel_cached, _ = ds_cached[0]
    assert mel_live.shape == mel_cached.shape
    np.testing.assert_allclose(mel_live, mel_cached, atol=1e-3)
