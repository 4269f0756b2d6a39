"""Training CLI (reference: /root/reference/train.py:182-310).

Usage:
    python -m multilingual_text_to_speech_tpu.cli.train \
        --hyper_parameters generated_training --data_root data
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--base_directory", type=str, default=".",
                        help="Base directory of the project.")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="Name of the initial checkpoint.")
    parser.add_argument("--resume", action="store_true",
                        help="Auto-resume from the newest checkpoint in the "
                             "checkpoint directory (crash recovery).")
    parser.add_argument("--checkpoint_root", type=str, default="checkpoints",
                        help="Base directory of checkpoints.")
    parser.add_argument("--data_root", type=str, default="data",
                        help="Base directory of datasets.")
    parser.add_argument("--flush_seconds", type=int, default=60,
                        help="TensorBoard flush interval.")
    parser.add_argument("--hyper_parameters", type=str, default=None,
                        help="Name of the hyperparameters file (in params/).")
    parser.add_argument("--logging_start", type=int, default=1,
                        help="First epoch to be logged.")
    parser.add_argument("--epochs", type=int, default=None,
                        help="Override hp.epochs.")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--distributed", action="store_true",
                        help="Multi-host training: initialize the JAX "
                             "distributed runtime (DCN across slices; set "
                             "COORDINATOR_ADDRESS / process env as usual).")
    parser.add_argument("--profile_steps", type=int, default=0,
                        help="Trace this many steps of the first epoch with "
                             "jax.profiler.")
    args = parser.parse_args(argv)

    if args.distributed:
        import jax

        jax.distributed.initialize()

    from multilingual_text_to_speech_tpu.config import HParams
    from multilingual_text_to_speech_tpu.data import TextToSpeechDatasetCollection
    from multilingual_text_to_speech_tpu.training import Trainer
    from multilingual_text_to_speech_tpu.training.checkpoint import load_checkpoint

    checkpoint_dir = os.path.join(args.base_directory, args.checkpoint_root)
    os.makedirs(checkpoint_dir, exist_ok=True)

    # hp resolution order matches the reference (train.py:211-220):
    # checkpoint hp first, then optional JSON overlay for fine-tuning
    hp = HParams()
    checkpoint_path = None
    if args.resume and not args.checkpoint:
        from multilingual_text_to_speech_tpu.training.checkpoint import (
            find_latest_checkpoint,
        )

        checkpoint_path = find_latest_checkpoint(checkpoint_dir)
        if checkpoint_path:
            print(f"Resuming from {checkpoint_path}")
            hp = load_checkpoint(checkpoint_path)["hp"]
    elif args.checkpoint:
        checkpoint_path = os.path.join(checkpoint_dir, args.checkpoint)
        hp = load_checkpoint(checkpoint_path)["hp"]
    if args.hyper_parameters is not None:
        pkg_params = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "params",
        )
        candidates = [
            os.path.join(args.base_directory, "params",
                         f"{args.hyper_parameters}.json"),
            os.path.join(pkg_params, f"{args.hyper_parameters}.json"),
            os.path.join(pkg_params, "singles", f"{args.hyper_parameters}.json"),
        ]
        for cand in candidates:
            if os.path.exists(cand):
                hp.overlay(cand)
                break
        else:
            raise FileNotFoundError(
                f"hyper-parameter file '{args.hyper_parameters}' not found in "
                f"{candidates}"
            )

    data = TextToSpeechDatasetCollection(
        os.path.join(args.data_root, hp.dataset), hp
    )

    trainer = Trainer(
        hp, data,
        base_directory=args.base_directory,
        checkpoint_dir=checkpoint_dir,
        log_dir=os.path.join(args.base_directory, "logs"),
        seed=args.seed,
        from_checkpoint=checkpoint_path,
        flush_seconds=args.flush_seconds,
    )
    if args.profile_steps:
        trainer.train_epoch(args.logging_start,
                            profile_steps=args.profile_steps)
        trainer.epoch += 1
    trainer.fit(epochs=args.epochs, logging_start_epoch=args.logging_start)


if __name__ == "__main__":
    main()
