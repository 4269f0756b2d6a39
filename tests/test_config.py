"""Config system tests: defaults, JSON overlay, state_dict round-trip."""

import json
import os

import numpy as np
import pytest

from multilingual_text_to_speech_tpu.config import HParams

PARAMS_DIR = os.path.join(
    os.path.dirname(__file__), "..", "multilingual_text_to_speech_tpu", "params"
)


def test_defaults_match_reference_contract():
    hp = HParams()
    assert hp.batch_size == 52
    assert hp.encoder_type == "simple"
    assert hp.num_fft == 1102
    assert hp.num_mels == 80
    assert hp.sample_rate == 22050
    assert hp.languages == ["en-us"]
    assert hp.guided_attention_gain == 1.00025


def test_symbols_count():
    hp = HParams()
    # characters (53) + punctuations_out (16) + punctuations_in (2)
    expected = len(hp.characters) + len(hp.punctuations_out) + len(hp.punctuations_in)
    assert hp.symbols_count() == expected
    assert hp.total_symbols() == expected + 3
    hp.use_phonemes = True
    assert hp.symbols_count() == (
        len(hp.phonemes) + len(hp.punctuations_out) + len(hp.punctuations_in)
    )
    hp.use_punctuation = False
    assert hp.symbols_count() == len(hp.phonemes)


def test_frame_sizes():
    hp = HParams()
    assert hp.stft_window_samples() == 1102
    assert hp.stft_shift_samples() == 275
    assert hp.linear_bins() == 552


def test_json_overlay():
    path = os.path.join(PARAMS_DIR, "generated_training.json")
    hp = HParams.from_json(path)
    assert hp.encoder_type == "generated"
    assert hp.generator_dim == 20
    assert hp.generator_bottleneck_dim == 8
    assert hp.perfect_sampling is True
    assert len(hp.languages) == 10
    # non-overridden defaults survive
    assert hp.decoder_dimension == 1024
    assert hp.attention_kernel_size == 31


def test_all_bundled_configs_load():
    for root, _, files in os.walk(PARAMS_DIR):
        for f in files:
            if f.endswith(".json"):
                hp = HParams.from_json(os.path.join(root, f))
                assert hp.symbols_count() > 0


def test_state_dict_roundtrip(tmp_path):
    hp = HParams()
    hp.overlay(os.path.join(PARAMS_DIR, "generated_switching.json"))
    hp.speaker_number = 85
    hp.language_number = 5
    hp.unique_speakers = ["00-de", "01-fr"]
    hp.mel_normalize_mean = np.random.randn(80, 1).astype(np.float32)
    hp.mel_normalize_variance = np.abs(np.random.randn(80, 1)).astype(np.float32)

    d = hp.state_dict()
    # must be JSON-serializable (checkpoints embed it)
    blob = json.dumps(d)
    hp2 = HParams.from_state_dict(json.loads(blob))

    assert hp2.speaker_number == 85
    assert hp2.unique_speakers == ["00-de", "01-fr"]
    assert hp2.reversal_classifier_w == 0.125
    mean, var = hp2.mel_normalization()
    np.testing.assert_allclose(mean, hp.mel_normalize_mean, rtol=1e-6)
    assert mean.shape == (80, 1)


def test_decoder_input_dimension():
    hp = HParams()
    assert hp.decoder_input_dimension() == 512
    hp.multi_speaker = True
    hp.multi_language = True
    assert hp.decoder_input_dimension() == 512 + 32 + 4


def test_save_and_reload(tmp_path):
    hp = HParams(batch_size=7)
    p = str(tmp_path / "hp.json")
    hp.save(p)
    hp2 = HParams.from_json(p)
    assert hp2.batch_size == 7


def test_copy_is_independent():
    hp = HParams()
    hp2 = hp.copy()
    hp2.batch_size = 999
    hp2.languages.append("xx")
    assert hp.batch_size == 52
    assert "xx" not in hp.languages
