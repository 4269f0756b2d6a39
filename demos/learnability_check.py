"""End-to-end learning-dynamics check: does attention become diagonal?

The reference's de-facto integration test is TensorBoard inspection —
"alignment becomes diagonal, audible output" (SURVEY.md §4).  This script
makes that check automatic and fast: it builds a synthetic copy-task corpus
(each symbol deterministically maps to a fixed 3-frame mel pattern), trains
for a few epochs, and reports:

- teacher-forced mel loss trajectory (must drop hard: the task is learnable)
- free-running alignment diagonality (mean attention mass near the diagonal)

Usage:
    python demos/learnability_check.py [--epochs 30] [--cpu]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os
import tempfile


def build_copy_task_corpus(root: str, hp, n_items: int = 64,
                           n_symbols: int = 12, frames_per_symbol: int = 3,
                           seed: int = 0):
    """Metafile + cached mel 'spectrograms' where audio is a deterministic
    per-symbol spectral pattern — a perfectly learnable TTS toy problem."""
    import numpy as np

    rng = np.random.RandomState(seed)
    alphabet = "abcdefghijklmnopqrstuvwxyz"[:n_symbols]
    # one distinct random (but fixed) mel pattern per symbol
    patterns = rng.randn(n_symbols, frames_per_symbol, hp.num_mels).astype(
        np.float32)

    os.makedirs(os.path.join(root, "spectrograms"), exist_ok=True)
    lines = []
    for i in range(n_items):
        length = rng.randint(8, 16)
        sym_ids = rng.randint(0, n_symbols, length)
        text = "".join(alphabet[s] for s in sym_ids)
        mel = np.concatenate([patterns[s] for s in sym_ids], axis=0)  # [F, M]
        spec_rel = os.path.join("spectrograms", f"{i:06}.npy")
        np.save(os.path.join(root, spec_rel), mel.T)  # [bins, frames] layout
        lines.append(f"{i:06}|spk|synth||{spec_rel}||{text}|")

    split = max(n_items - 8, 1)
    with open(os.path.join(root, "train.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines[:split]) + "\n")
    with open(os.path.join(root, "val.txt"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines[split:]) + "\n")


def alignment_diagonality(alignment, text_len: int, frames: int) -> float:
    """Mean attention mass within a +-15% band around the ideal diagonal."""
    import numpy as np

    a = np.asarray(alignment)[:frames, :text_len]  # [F, T]
    f_idx = np.arange(frames)[:, None] / max(frames, 1)
    t_idx = np.arange(text_len)[None, :] / max(text_len, 1)
    band = np.abs(t_idx - f_idx) <= 0.15
    return float((a * band).sum() / max(a.sum(), 1e-8))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=30)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--root", default=None)
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from multilingual_text_to_speech_tpu.config import HParams
    from multilingual_text_to_speech_tpu.data import TextToSpeechDatasetCollection
    from multilingual_text_to_speech_tpu.parallel import make_mesh
    from multilingual_text_to_speech_tpu.training import Trainer

    hp = HParams()
    hp.languages = ["synth"]
    hp.characters = "abcdefghijklmnopqrstuvwxyz "
    hp.case_sensitive = False
    hp.num_mels = 20
    hp.embedding_dimension = 64
    hp.encoder_dimension = 64
    hp.encoder_blocks = 2
    hp.encoder_kernel_size = 5
    hp.prenet_dimension = 32
    hp.attention_dimension = 32
    hp.attention_kernel_size = 15
    hp.attention_location_dimension = 16
    hp.decoder_dimension = 128
    hp.postnet_dimension = 32
    hp.postnet_blocks = 3
    hp.batch_size = 16
    hp.bucket_text_multiple = 16
    hp.bucket_frame_multiple = 48
    hp.guided_attention_steps = 500
    hp.learning_rate = 2e-3
    hp.learning_rate_decay_start = 10_000
    hp.normalize_spectrogram = False
    hp.stop_frames = 2
    hp.decoder_regularization = "zoneout"
    hp.dropout = 0.1

    root = args.root or tempfile.mkdtemp(prefix="copytask_")
    build_copy_task_corpus(root, hp)
    data = TextToSpeechDatasetCollection(root, hp)
    mesh = make_mesh(devices=jax.devices()[:1])
    trainer = Trainer(hp, data, mesh=mesh, seed=0)

    def eval_diagonality() -> float:
        batch = next(iter(trainer._eval_batches()))
        from multilingual_text_to_speech_tpu.parallel import shard_batch
        import jax.numpy as jnp

        sharded = shard_batch(batch, mesh)
        out_free, _, _ = trainer._eval_step(
            trainer.state, sharded, jnp.float32(0.0), jnp.float32(0.25),
            jax.random.PRNGKey(0),
        )
        scores = [
            alignment_diagonality(
                out_free["alignment"][j],
                int(batch.utterance_lengths[j]),
                int(batch.spectrogram_lengths[j]),
            )
            for j in range(out_free["alignment"].shape[0])
        ]
        return float(np.mean(scores))

    diag0 = eval_diagonality()
    loss0 = trainer.evaluate()
    print(f"before training: eval loss {loss0:.3f}, diagonality {diag0:.3f}")

    for epoch in range(args.epochs):
        trainer.train_epoch()
        trainer.epoch += 1
        if (epoch + 1) % max(args.epochs // 5, 1) == 0:
            d = eval_diagonality()
            l = trainer.evaluate()
            print(f"epoch {epoch + 1:3d}: eval loss {l:.3f}, diagonality {d:.3f}")

    diag1 = eval_diagonality()
    loss1 = trainer.evaluate()
    print(f"after training:  eval loss {loss1:.3f}, diagonality {diag1:.3f}")

    ok_loss = loss1 < loss0 * 0.5
    ok_diag = diag1 > max(2 * diag0, 0.5)
    print(f"loss dropped >2x: {ok_loss}; alignment diagonal: {ok_diag}")
    if not (ok_loss and ok_diag):
        raise SystemExit("LEARNABILITY CHECK FAILED")
    print("LEARNABILITY CHECK PASSED")


if __name__ == "__main__":
    main()
