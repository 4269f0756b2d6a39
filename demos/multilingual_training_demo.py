"""Multilingual training walkthrough (end-to-end, self-contained).

Script equivalent of the reference's ``notebooks/multi_training_demo.ipynb``:
builds a tiny 2-language CSS10-style corpus from synthesized audio, prepares
metafiles + spectrogram caches, trains a generated-encoder multilingual
model with perfect (language-interleaved) sampling for a few epochs through
the REAL CLIs, and synthesizes a code-switched sentence from the resulting
checkpoint.

Usage:
    python demos/multilingual_training_demo.py [--workdir DIR] [--epochs 2]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import tempfile


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from multilingual_text_to_speech_tpu.ops.io import save_wav

    work = args.workdir or tempfile.mkdtemp(prefix="multi_demo_")
    root = os.path.join(work, "data", "css10")
    os.makedirs(root, exist_ok=True)
    print(f"== workdir: {work}")

    # -- 1. a tiny synthetic 2-language corpus in CSS10 layout ---------------
    rng = np.random.RandomState(0)
    texts = ["hallo welt", "guten tag", "wie geht es", "danke sehr"]
    sr = 22050
    for lang in ("german", "french"):
        os.makedirs(os.path.join(root, lang, "wavs"), exist_ok=True)
        with open(os.path.join(root, lang, "transcript.txt"), "w",
                  encoding="utf-8") as f:
            for i in range(4):
                dur = 2000 + 500 * i
                t = np.arange(dur) / sr
                wav = (0.2 * np.sin(2 * np.pi * (200 + 40 * i) * t)
                       + 0.01 * rng.randn(dur)).astype(np.float32)
                rel = os.path.join("wavs", f"{i:03}.wav")
                save_wav(wav, os.path.join(root, lang, rel), sr)
                print(f"{rel}|x|{texts[i]} {lang}", file=f)
    print("== corpus built")

    # -- 2. metafile + spectrogram caches via the prepare CLI ----------------
    from multilingual_text_to_speech_tpu.cli.prepare import main as prepare

    prepare(["--dataset", "css10", "--root", root, "--output", "all.txt",
             "--no_phonemes"])
    lines = open(os.path.join(root, "all.txt"), encoding="utf-8").read().splitlines()
    train = [l for i, l in enumerate(lines) if i % 4 != 3]
    val = [l for i, l in enumerate(lines) if i % 4 == 3]
    open(os.path.join(root, "train.txt"), "w", encoding="utf-8").write(
        "\n".join(train) + "\n")
    open(os.path.join(root, "val.txt"), "w", encoding="utf-8").write(
        "\n".join(val) + "\n")
    print(f"== metafiles: {len(train)} train / {len(val)} val")

    # -- 3. a multilingual experiment config ---------------------------------
    os.makedirs(os.path.join(work, "params"), exist_ok=True)
    cfg = {
        "version": "MULTI-DEMO", "dataset": "css10", "epochs": args.epochs,
        "languages": ["german", "french"], "multi_language": True,
        "encoder_type": "generated", "balanced_sampling": True,
        "perfect_sampling": True, "batch_size": 4, "case_sensitive": False,
        "embedding_dimension": 16, "encoder_dimension": 16,
        "encoder_blocks": 2, "encoder_kernel_size": 3,
        "prenet_dimension": 8, "attention_dimension": 8,
        "attention_kernel_size": 5, "attention_location_dimension": 4,
        "decoder_dimension": 16, "postnet_dimension": 8, "postnet_blocks": 2,
        "generator_dim": 4, "generator_bottleneck_dim": 2,
        "bucket_text_multiple": 8, "bucket_frame_multiple": 16,
        "checkpoint_each_epochs": args.epochs, "decode_chunk_frames": 16,
        "max_output_length": 64, "mesh_data_parallel": 1,
    }
    json.dump(cfg, open(os.path.join(work, "params", "multi_demo.json"), "w"),
              indent=2)

    # -- 4. train through the CLI --------------------------------------------
    from multilingual_text_to_speech_tpu.cli.train import main as train_cli

    train_cli(["--hyper_parameters", "multi_demo",
               "--data_root", os.path.join(work, "data"),
               "--base_directory", work, "--epochs", str(args.epochs)])
    ckpts = sorted(os.listdir(os.path.join(work, "checkpoints")))
    assert ckpts, "training produced no checkpoint"
    ckpt = os.path.join(work, "checkpoints", ckpts[-1])
    print(f"== trained: {ckpt}")

    # -- 5. code-switched synthesis from the checkpoint ----------------------
    import io

    from multilingual_text_to_speech_tpu.cli.synthesize import main as synth_cli

    stdin, sys.stdin = sys.stdin, io.StringIO(
        "demo|hallo welt guten tag|german|german-6,french*0.5:german*0.5\n"
    )
    try:
        synth_cli(["--checkpoint", ckpt,
                   "--output", os.path.join(work, "out"), "--save_spec"])
    finally:
        sys.stdin = stdin

    spec = np.load(os.path.join(work, "out", "demo.npy"))
    print(f"== synthesized code-switched sample: spectrogram {spec.shape}, "
          f"wav at {os.path.join(work, 'out', 'demo.wav')}")
    print("MULTILINGUAL TRAINING DEMO PASSED")


if __name__ == "__main__":
    main()
