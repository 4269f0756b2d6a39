"""Code-switching / accent-blending synthesis demo.

Script equivalent of the reference's demo notebooks
(``/root/reference/notebooks/*.ipynb``): loads a checkpoint and renders a
ladder of accent blends between two languages for the same sentence, plus a
code-switched sentence, writing wavs + spectrogram plots.

Usage:
    python demos/synthesis_demo.py --checkpoint CKPT --output demo_out \
        --text "guten tag jean-paul" --speaker 00-de --lang_a de --lang_b fr
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output", default="demo_out")
    parser.add_argument("--text", default="guten tag jean-paul")
    parser.add_argument("--speaker", default=None)
    parser.add_argument("--lang_a", default=None)
    parser.add_argument("--lang_b", default=None)
    parser.add_argument("--steps", type=int, default=5,
                        help="Number of accent-blend steps from lang_a to lang_b.")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from multilingual_text_to_speech_tpu.ops.io import save_wav
    from multilingual_text_to_speech_tpu.synthesis import Synthesizer

    synth = Synthesizer.from_checkpoint(args.checkpoint)
    hp = synth.hp
    os.makedirs(args.output, exist_ok=True)

    lang_a = args.lang_a or hp.languages[0]
    lang_b = args.lang_b or (hp.languages[1] if len(hp.languages) > 1 else lang_a)
    speaker = args.speaker or (
        hp.unique_speakers[0] if hp.multi_speaker else ""
    )

    lines = []
    # accent ladder: pure A -> blends -> pure B
    for i in range(args.steps):
        w = i / max(args.steps - 1, 1)
        if w == 0.0:
            spec = lang_a
        elif w == 1.0:
            spec = lang_b
        else:
            spec = f"{lang_a}*{1-w:.2f}:{lang_b}*{w:.2f}"
        lines.append((f"accent_{i}", f"accent_{i}|{args.text}|{speaker}|{spec}"))

    # code-switched: first half A, second half B
    half = len(args.text) // 2
    lines.append((
        "switched",
        f"switched|{args.text}|{speaker}|{lang_a}-{half},{lang_b}",
    ))

    # cross-lingual voice cloning: the same text + language rendered in every
    # speaker's voice (the paper's voice-cloning synthesis use case)
    if hp.multi_speaker:
        for spk in hp.unique_speakers:
            lines.append((
                f"voice_{spk}",
                f"voice_{spk}|{args.text}|{spk}|{lang_a}",
            ))

    for name, line in lines:
        print(f"Rendering {name}: {line}")
        if hp.multi_language:
            spec_db = synth.synthesize_line(line)
        else:
            spec_db = synth.synthesize_line(f"{name}|{args.text}")
        wav = synth.vocode(spec_db)
        save_wav(wav, os.path.join(args.output, f"{name}.wav"), hp.sample_rate)
        np.save(os.path.join(args.output, f"{name}.npy"), spec_db)

        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(10, 4))
            ax.imshow(spec_db, aspect="auto", origin="lower")
            ax.set_title(name)
            fig.savefig(os.path.join(args.output, f"{name}.png"), dpi=100)
            plt.close(fig)
        except Exception:
            pass
    print(f"Wrote {len(lines)} samples to {args.output}")


if __name__ == "__main__":
    main()
