"""End-to-end CLI chain test: the reference's actual user workflow, driven
through the argparse surfaces in sequence.

    synthetic wavs -> cli/prepare (metafile + spectrogram caches)
                   -> cli/train   (2 epochs, tiny model, checkpoint)
                   -> cli/synthesize (code-switched spec via stdin)
                   -> evaluation/mcd (DTW-MCD vs ground truth)

Mirrors /root/reference: dataset/dataset.py:192-259 -> train.py:182 ->
synthesize.py:87 -> evaluation/mcd_request.py:27-40.  Every hop consumes
ONLY what the previous CLI wrote to disk, so the test fails if any CLI
contract (metafile columns, params JSON resolution, checkpoint layout,
stdin mini-language, .npy spectrogram layout) drifts.
"""

import io
import os

import numpy as np
import pytest

from corpus_utils import make_css10_corpus, tiny_model_hp


def test_cli_full_chain(tmp_path, monkeypatch):
    base = tmp_path / "run"
    data_root = tmp_path / "data"
    corpus_root = data_root / "css10"
    os.makedirs(base / "params", exist_ok=True)

    # hp JSON shared by prepare and train, written where cli/train resolves
    # named params files (base_directory/params/<name>.json)
    hp = tiny_model_hp(
        languages=["german", "french"],
        multi_language=True,
        case_sensitive=False,
        dataset="css10",
        batch_size=4,
        checkpoint_each_epochs=1,
        parallelization=False,      # reference train.py:255-256 semantics
        balanced_sampling=False,
        perfect_sampling=False,
        guided_attention_steps=10,
        learning_rate=1e-3,
        max_output_length=40,
        griffin_lim_iters=3,
    )
    params_json = str(base / "params" / "tiny_chain.json")
    hp.save(params_json)

    # -- 1. corpus + cli/prepare --------------------------------------------
    make_css10_corpus(str(corpus_root), languages=("german", "french"),
                      n_per_lang=8)
    from multilingual_text_to_speech_tpu.cli import prepare as cli_prepare

    cli_prepare.main([
        "--dataset", "css10", "--root", str(corpus_root),
        "--output", "all.txt", "--no_phonemes",
        "--hyper_parameters", params_json,
    ])
    all_txt = corpus_root / "all.txt"
    lines = all_txt.read_text(encoding="utf-8").splitlines()
    assert len(lines) == 16 and len(lines[0].split("|")) == 8

    # train/val split (the reference user does this by hand too)
    train = [l for i, l in enumerate(lines) if i % 4 != 3]
    val = [l for i, l in enumerate(lines) if i % 4 == 3]
    (corpus_root / "train.txt").write_text("\n".join(train) + "\n",
                                           encoding="utf-8")
    (corpus_root / "val.txt").write_text("\n".join(val) + "\n",
                                         encoding="utf-8")

    # -- 2. cli/train ---------------------------------------------------------
    from multilingual_text_to_speech_tpu.cli import train as cli_train

    cli_train.main([
        "--base_directory", str(base), "--data_root", str(data_root),
        "--hyper_parameters", "tiny_chain", "--epochs", "2",
    ])
    ckpt_dir = base / "checkpoints"
    ckpts = sorted(os.listdir(ckpt_dir))
    assert len(ckpts) == 2, ckpts    # checkpoint_each_epochs=1 x 2 epochs
    ckpt = str(ckpt_dir / ckpts[-1])

    # -- 3. cli/synthesize (stdin mini-language, code-switched line) ---------
    from multilingual_text_to_speech_tpu.cli import synthesize as cli_syn

    out = str(base / "synth_out")
    monkeypatch.setattr("sys.stdin", io.StringIO(
        "c1|hallo welt|german|german\n"
        "c2|guten tag welt|french|german-8,french\n"))
    cli_syn.main(["--checkpoint", ckpt, "--output", out, "--save_spec",
                  "--ignore_wav"])
    spec = np.load(os.path.join(out, "c1.npy"))
    assert spec.shape[0] == hp.num_mels and spec.shape[1] >= 1
    assert np.isfinite(spec).all()
    assert os.path.exists(os.path.join(out, "c2.npy"))

    # -- 4. evaluation/mcd vs the ground-truth cache cli/prepare wrote -------
    from multilingual_text_to_speech_tpu.evaluation.mcd import (
        mel_cepstral_distortion_specs,
    )

    # metafile layout: id|speaker|language|audio|mel|linear|raw_text|phonemes
    gt_row = next(l for l in lines if "hallo welt" in l.split("|")[6])
    gt = np.load(str(corpus_root / gt_row.split("|")[4]))
    mcd = mel_cepstral_distortion_specs(gt, spec)
    assert np.isfinite(mcd) and mcd > 0.0
