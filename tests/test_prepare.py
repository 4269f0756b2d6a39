"""Dataset preparation utility tests: normalization, CV filtering, trimming."""

import csv
import os

import numpy as np
import pytest

from multilingual_text_to_speech_tpu.dataset_prepare.common_voice import (
    filter_language,
)
from multilingual_text_to_speech_tpu.dataset_prepare.normalize import (
    normalize_css10_text,
    normalize_css10_transcript,
    normalize_mailabs_metadata,
    normalize_mailabs_text,
)
from multilingual_text_to_speech_tpu.dataset_prepare.trim import trim_tree


def test_css10_char_substitutions():
    assert normalize_css10_text("cœur—æther") == "coeur-aether"
    # fullwidth punctuation mapped to ASCII; punctuation-only strips to empty
    assert normalize_css10_text("ja！so？") == "ja!so?"
    assert normalize_css10_text("！：；？") == ""
    assert normalize_css10_text("l’été") == "l'été"


def test_css10_punctuation_cleanup():
    assert normalize_css10_text("hallo , welt !!") == "hallo, welt!"
    assert normalize_css10_text("... leading dots") == "leading dots"
    assert normalize_css10_text("end.  -  dash") == "end. dash"


def test_css10_transcript_file(tmp_path):
    p = tmp_path / "transcript.txt"
    p.write_text(
        "a.wav|x|hallo , welt !!|3.2\n"
        "b.wav|x|...|1.0\n"           # punctuation-only -> dropped
        "c.wav|x|guten tag|2.0\n",
        encoding="utf-8",
    )
    kept = normalize_css10_transcript(str(p))
    lines = p.read_text(encoding="utf-8").splitlines()
    assert kept == 2
    assert lines[0] == "a.wav|x|hallo, welt!"
    assert lines[1] == "c.wav|x|guten tag"


def test_mailabs_text():
    assert normalize_mailabs_text(".. hello ..") == "hello."
    assert normalize_mailabs_text("- (quoted) -") == "quoted"
    assert normalize_mailabs_text("wait... what") == "wait- what"


def test_mailabs_metadata_filters(tmp_path):
    p = tmp_path / "metadata.csv"
    p.write_text(
        "a|a|Hello there.\n"
        "b|b|IV.\n"              # chapter number -> dropped
        "c|c|Chapter 12 begins\n"  # contains digits -> dropped
        "d|d|Good night\n",
        encoding="utf-8",
    )
    kept = normalize_mailabs_metadata(str(p))
    assert kept == 2
    lines = p.read_text(encoding="utf-8").splitlines()
    assert lines == ["a|a|Hello there.", "d|d|Good night"]


def test_common_voice_filter(tmp_path):
    lang = tmp_path / "xx"
    clips = lang / "clips"
    clips.mkdir(parents=True)
    for name in ("k1.mp3", "k2.mp3", "bad.mp3"):
        (clips / name).write_bytes(b"\0")
    header = ["client_id", "path", "sentence", "up_votes", "down_votes"]
    rows = [
        ["s1", "k1.mp3", "hello", "2", "0"],
        ["s2", "k2.mp3", "world", "1", "0"],
        ["s3", "bad.mp3", "noisy", "0", "2"],
    ]
    with open(lang / "validated.tsv", "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(header)
        w.writerows(rows)
    with open(lang / "other.tsv", "w", encoding="utf-8") as f:
        f.write("junk\n")

    kept = filter_language(str(lang))
    assert kept == 2
    assert sorted(os.listdir(clips)) == ["k1.mp3", "k2.mp3"]
    assert not (lang / "other.tsv").exists()


def test_trim_tree(tmp_path):
    from multilingual_text_to_speech_tpu.ops.io import load_wav, save_wav

    sr = 22050
    pad = np.zeros(sr // 2, np.float32)
    tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    save_wav(np.concatenate([pad, tone, pad]), str(wav_dir / "a.wav"), sr)

    n = trim_tree(str(tmp_path), sample_rate=sr)
    assert n == 1
    trimmed = load_wav(str(wav_dir / "a.wav"))
    assert len(trimmed) < len(pad) * 2 + len(tone)
    assert len(trimmed) >= len(tone) * 0.9


def test_trim_tree_preserves_sample_rate(tmp_path):
    """Files at any rate keep their own rate (like the reference's sox
    pipeline); an explicit --sample_rate mismatch fails loudly instead of
    silently relabeling the audio."""
    import pytest

    from multilingual_text_to_speech_tpu.ops.io import load_wav_with_rate, save_wav

    sr = 48000
    pad = np.zeros(sr // 2, np.float32)
    tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(np.float32)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    save_wav(np.concatenate([pad, tone, pad]), str(wav_dir / "a.wav"), sr)

    n = trim_tree(str(tmp_path))
    assert n == 1
    trimmed, rate = load_wav_with_rate(str(wav_dir / "a.wav"))
    assert rate == sr  # NOT rewritten at some default rate
    assert len(tone) * 0.9 <= len(trimmed) < len(pad) * 2 + len(tone)

    with pytest.raises(ValueError, match="sample rate"):
        trim_tree(str(tmp_path), sample_rate=22050)


def test_romanize_fake_backends(monkeypatch, capsys):
    """Romanizer line filters with fake jieba/pinyin/MeCab/romkan modules
    (the real backends are optional host deps, absent here — same gating
    pattern as the phonemizer; reference dataset_prepare/
    pinyin_convertor.py and mecab_convertor.py)."""
    import sys
    import types

    from multilingual_text_to_speech_tpu.dataset_prepare import romanize

    fake_jieba = types.SimpleNamespace(cut=lambda s: s.split())
    fake_pinyin = types.SimpleNamespace(get=lambda w: f"p({w})")
    monkeypatch.setitem(sys.modules, "jieba", fake_jieba)
    monkeypatch.setitem(sys.modules, "pinyin", fake_pinyin)
    assert romanize.to_pinyin("ni hao\n") == "p(ni) p(hao)"

    class FakeTagger:
        def __init__(self, mode):
            self.mode = mode

        def parse(self, s):
            return s.strip() + {"-Owakati": " W", "-Oyomi": " Y"}[self.mode]

    fake_mecab = types.SimpleNamespace(Tagger=FakeTagger)
    fake_romkan = types.SimpleNamespace(to_roma=lambda s: f"r[{s}]")
    monkeypatch.setitem(sys.modules, "MeCab", fake_mecab)
    monkeypatch.setitem(sys.modules, "romkan", fake_romkan)
    assert romanize.to_romaji("konnichiwa") == "r[konnichiwa W Y]"

    # the CLI main(): stdin lines -> converted stdout lines
    monkeypatch.setattr(sys, "stdin", iter(["ni hao\n"]))
    romanize.main(["--lang", "zh"])
    assert capsys.readouterr().out == "p(ni) p(hao)\n"
