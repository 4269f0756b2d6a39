"""Synthesis CLI: stdin lines -> spectrograms (.npy) and Griffin-Lim wavs.

Rebuild of ``/root/reference/synthesize.py:87-133``.  Input line formats
(reference: synthesize.py:15-38):

    MONO-lingual single-speaker:   id|utterance
    otherwise:                     id|utterance|speaker|language
    per-character language:        id|utterance|speaker|de-10,fr-9,de
    accent control:                id|utterance|speaker|de-10,fr*0.75:de*0.25-9,de

Saved .npy spectrograms use the reference layout [bins, frames].
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Model checkpoint.")
    parser.add_argument("--output", type=str, default=".",
                        help="Output directory.")
    parser.add_argument("--seed", type=int, default=0,
                        help="PRNG seed (prenet dropout, Griffin-Lim phase).")
    parser.add_argument("--cpu", action="store_true",
                        help="Force CPU execution.")
    parser.add_argument("--save_spec", action="store_true",
                        help="Also save spectrograms as .npy.")
    parser.add_argument("--ignore_wav", action="store_true",
                        help="Skip Griffin-Lim waveform rendering.")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from multilingual_text_to_speech_tpu.ops.io import save_wav
    from multilingual_text_to_speech_tpu.synthesis import Synthesizer

    print("Building model ...", file=sys.stderr)
    synth = Synthesizer.from_checkpoint(args.checkpoint)

    inputs = [line.rstrip() for line in sys.stdin.readlines() if line.strip()]
    os.makedirs(args.output, exist_ok=True)

    for i, item in enumerate(inputs):
        item_id = item.split("|")[0] or str(i)
        print(f"Synthesizing {i + 1}/{len(inputs)}: {item!r}", file=sys.stderr)
        spec = synth.synthesize_line(item, seed=args.seed + i)

        if args.save_spec:
            np.save(os.path.join(args.output, f"{item_id}.npy"), spec)
        if not args.ignore_wav:
            wav = synth.vocode(spec, seed=args.seed + i)
            save_wav(wav, os.path.join(args.output, f"{item_id}.wav"),
                     synth.hp.sample_rate)


if __name__ == "__main__":
    main()
