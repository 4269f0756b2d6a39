"""Language-embedding analysis of a trained generated-encoder model.

Script equivalent of the reference's ``notebooks/encoder_analyze.ipynb``:
cosine similarities between the contextual generator's language embeddings,
both raw and after the first bottleneck projection (the notebook's
``model._encoder._layers[2]._convolution._bottleneck.weight`` analysis).

Usage:
    python demos/encoder_analysis.py --checkpoint CKPT [--output enc.png]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse


def cosine_matrix(vectors):
    import numpy as np

    v = np.asarray(vectors, dtype=np.float64)
    norm = np.linalg.norm(v, axis=1, keepdims=True)
    v = v / np.maximum(norm, 1e-12)
    return v @ v.T


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output", default=None, help="Optional heatmap PNG.")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from multilingual_text_to_speech_tpu.synthesis import Synthesizer

    synth = Synthesizer.from_checkpoint(args.checkpoint)
    hp = synth.hp
    assert hp.encoder_type == "generated", (
        "embedding analysis requires a generated-encoder checkpoint"
    )
    params = synth.variables["params"]["encoder"]

    emb = np.asarray(params["generator_embedding"]["embedding"])  # [L, E]
    print(f"generator embeddings: {emb.shape} for languages {hp.languages}")
    raw = cosine_matrix(emb)

    # first highway layer's conv bottleneck projection (notebook parity)
    bott = params["stack"]["layer2"]["ConvBlockGenerated_0"][
        "Conv1dGenerated_0"]["bottleneck"]["kernel"]
    projected = cosine_matrix(emb @ np.asarray(bott))

    langs = hp.languages
    for title, mat in (("raw", raw), ("bottleneck-projected", projected)):
        print(f"\ncosine similarity ({title}):")
        header = "        " + " ".join(f"{l[:6]:>7}" for l in langs)
        print(header)
        for i, l in enumerate(langs):
            row = " ".join(f"{mat[i, j]:+.3f} " for j in range(len(langs)))
            print(f"{l[:6]:>7} {row}")

    if args.output:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(12, 5))
        for ax, (title, mat) in zip(axes, (("raw", raw),
                                           ("projected", projected))):
            im = ax.imshow(mat, vmin=-1, vmax=1, cmap="RdBu_r")
            ax.set_xticks(range(len(langs)))
            ax.set_yticks(range(len(langs)))
            ax.set_xticklabels(langs, rotation=45)
            ax.set_yticklabels(langs)
            ax.set_title(f"language embedding cosine ({title})")
            fig.colorbar(im, ax=ax)
        fig.tight_layout()
        fig.savefig(args.output, dpi=100)
        print(f"\nWrote {args.output}")


if __name__ == "__main__":
    main()
