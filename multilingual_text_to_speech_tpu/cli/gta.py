"""GTA (ground-truth-aligned) spectrogram export for vocoder training.

Rebuild of ``/root/reference/gta.py:32-89``: loads a checkpoint, filters the
TRAIN set to requested speakers, runs the teacher-forced forward pass
(tf=1.0) and saves denormalized mels as ``{serial:05}-{speaker}.npy`` in the
reference's [bins, frames] layout (inputs for e.g. WaveRNN training).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--output", type=str, default="gta")
    parser.add_argument("--data_root", type=str, default="data")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--speakers", type=str, nargs="+", default=None,
                        help="Speaker IDs to export (default: all).")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from multilingual_text_to_speech_tpu.data import (
        Collate,
        PerfectBatchSampler,
        SimpleBatchSampler,
        TextToSpeechDataset,
    )
    from multilingual_text_to_speech_tpu.data.batching import batch_iterator
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron
    from multilingual_text_to_speech_tpu.ops import audio as audio_ops
    from multilingual_text_to_speech_tpu.synthesis import Synthesizer

    synth = Synthesizer.from_checkpoint(args.checkpoint)
    hp = synth.hp
    model = synth.model
    variables = synth.variables

    root = os.path.join(args.data_root, hp.dataset)
    dataset = TextToSpeechDataset(os.path.join(root, "train.txt"), root, hp)

    if args.speakers:
        wanted = {
            list(hp.unique_speakers).index(s) for s in args.speakers
        } if hp.multi_speaker else set()
        dataset.items = [
            it for it in dataset.items
            if not hp.multi_speaker or it["speaker"] in wanted
        ]

    # grouped encoders need language-interleaved batches divisible by L
    # (reference: gta.py:64-70 uses the perfect sampler too)
    if hp.multi_language and hp.encoder_type in ("convolutional", "generated"):
        n_langs = len(hp.languages)
        batch = max(args.batch_size // n_langs, 1) * n_langs
        sampler = PerfectBatchSampler(
            [it["language"] for it in dataset.items], n_langs, batch,
            shuffle=False, drop_last=False,
        )
    else:
        sampler = SimpleBatchSampler(len(dataset), args.batch_size,
                                     shuffle=False, drop_last=False)
    collate = Collate(hp)

    forward = jax.jit(model.apply)
    os.makedirs(args.output, exist_ok=True)

    serial = 0
    for batch in batch_iterator(dataset, sampler, collate):
        out = forward(
            variables, batch.utterances, batch.utterance_lengths,
            batch.mel_spectrograms, batch.spectrogram_lengths,
            batch.speakers, batch.languages, 1.0, jax.random.PRNGKey(serial),
        )
        post = np.asarray(out["post_prediction"])
        for j in range(post.shape[0]):
            f = int(batch.spectrogram_lengths[j])
            mel = post[j, :f].T  # [bins, F], reference layout
            if hp.normalize_spectrogram:
                mel = audio_ops.denormalize_spectrogram(
                    mel, hp, not hp.predict_linear
                )
            speaker = (
                hp.unique_speakers[int(batch.speakers[j])]
                if hp.multi_speaker else "0"
            )
            np.save(os.path.join(args.output, f"{serial:05}-{speaker}.npy"),
                    mel)
            serial += 1
        print(f"Exported {serial} GTA spectrograms", file=sys.stderr)


if __name__ == "__main__":
    main()
