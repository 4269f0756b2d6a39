"""Evaluation harness tests: Levenshtein/CER, CIs, MCD pipeline, ASR plumbing."""

import json
import os

import numpy as np
import pytest

from multilingual_text_to_speech_tpu.evaluation import cer as cer_mod
from multilingual_text_to_speech_tpu.evaluation import mcd as mcd_mod
from multilingual_text_to_speech_tpu.evaluation.asr import transcribe_language
from multilingual_text_to_speech_tpu.evaluation.cer import (
    clean,
    confidence_interval,
    levenshtein,
    sample_cer,
)
from multilingual_text_to_speech_tpu.evaluation.mcd import (
    mel_cepstral_distortion_specs,
)


def test_levenshtein_counts():
    dist, (s, d, i) = levenshtein("kitten", "sitting")
    assert dist == 3
    assert s + d + i == 3
    assert s == 2 and i == 1  # k->s, e->i substitutions; +g insertion


def test_levenshtein_identical():
    dist, ops = levenshtein("abc", "abc")
    assert dist == 0 and ops == (0, 0, 0)


def test_sample_cer():
    assert sample_cer("abcd", "abcd") == 0.0
    assert sample_cer("abcd", "abce") == 0.25
    assert sample_cer("ab", "abcd") == 1.0  # 2 insertions / 2 ref chars


def test_clean():
    assert clean("  Hello,   World! ", False, False) == "hello world"
    assert clean("Hello, World!", True, True) == "Hello, World!"


def test_confidence_interval():
    data = [0.1, 0.2, 0.15, 0.12, 0.18]
    lo, hi = confidence_interval(data)
    m = np.mean(data)
    assert lo < m < hi


def test_mcd_specs_zero_for_identical():
    S = np.random.RandomState(0).randn(80, 40).astype(np.float32)
    assert mel_cepstral_distortion_specs(S, S) == pytest.approx(0.0, abs=1e-4)


def _make_eval_tree(root, language="german", model="mymodel"):
    os.makedirs(os.path.join(root, "all_meta_files"), exist_ok=True)
    with open(os.path.join(root, "all_meta_files", f"{language}.txt"), "w",
              encoding="utf-8") as f:
        print("000001|hallo welt|", file=f)
        print("000002|guten tag|", file=f)
    return root


def test_cer_pipeline(tmp_path):
    root = _make_eval_tree(str(tmp_path))
    asr_dir = os.path.join(root, "mymodel", "asr", "german")
    os.makedirs(asr_dir)
    json.dump([{"alternatives": [{"transcript": "hallo welt"}]}],
              open(os.path.join(asr_dir, "000001.json"), "w"))
    json.dump([{"alternatives": [{"transcript": "guten takk"}]}],
              open(os.path.join(asr_dir, "000002.json"), "w"))

    cers = cer_mod.evaluate_language("german", "mymodel", root)
    assert len(cers) == 2
    assert cers[0][1] == 0.0
    assert cers[1][1] > 0.0

    out = os.path.join(root, "mymodel", "cer", "german.txt")
    cer_mod.write_report(cers, out, "CER")
    content = open(out).read()
    assert "Total mean CER" in content and "Conf. interval" in content


def test_mcd_pipeline(tmp_path):
    root = _make_eval_tree(str(tmp_path))
    rng = np.random.RandomState(0)
    gt_dir = os.path.join(root, "ground-truth", "spectrograms")
    gen_dir = os.path.join(root, "mymodel", "spectrograms", "german")
    os.makedirs(gt_dir)
    os.makedirs(gen_dir)
    for idx in ("000001", "000002"):
        ref = rng.randn(80, 30).astype(np.float32)
        np.save(os.path.join(gt_dir, f"{idx}.npy"), ref)
        np.save(os.path.join(gen_dir, f"{idx}.npy"),
                ref + rng.randn(80, 30).astype(np.float32) * 0.1)

    mcds = mcd_mod.evaluate_language("german", "mymodel", root)
    assert len(mcds) == 2
    assert all(0 < v < 5 for _, v in mcds)


def test_asr_plumbing_with_fake_recognizer(tmp_path):
    root = _make_eval_tree(str(tmp_path))
    wav_dir = os.path.join(root, "mymodel", "audios", "german")
    os.makedirs(wav_dir)
    from multilingual_text_to_speech_tpu.ops.io import save_wav

    save_wav(np.zeros(1000, np.float32), os.path.join(wav_dir, "000001.wav"),
             22050)

    def fake_recognize(path, code, sr):
        assert code == "de-DE" and sr == 22050
        return [{"alternatives": [{"transcript": "hallo welt"}]}]

    n = transcribe_language("german", "mymodel", root,
                            recognize_fn=fake_recognize)
    assert n == 1
    saved = json.load(open(
        os.path.join(root, "mymodel", "asr", "german", "000001.json")
    ))
    assert saved[0]["alternatives"][0]["transcript"] == "hallo welt"
    # the CER scorer consumes what the ASR step wrote
    cers = cer_mod.evaluate_language("german", "mymodel", root)
    assert cers == [("000001", 0.0)]
