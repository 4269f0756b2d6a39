"""Corpus preparation CLI: build metafiles + spectrogram caches.

Covers the reference's ``TextToSpeechDataset.create_meta_file``
(dataset/dataset.py:192-259) and ``data/prepare_css_spectrograms.py``.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True,
                        help="Loader name: css10, ljspeech, vctk, mailabs, "
                             "my_blizzard, my_common_voice.")
    parser.add_argument("--root", type=str, required=True,
                        help="Dataset root directory.")
    parser.add_argument("--output", type=str, default="all.txt",
                        help="Output metafile name.")
    parser.add_argument("--hyper_parameters", type=str, default=None,
                        help="Optional hp JSON (languages, DSP settings).")
    parser.add_argument("--sample_rate", type=int, default=22050)
    parser.add_argument("--num_fft", type=int, default=1102)
    parser.add_argument("--no_spectrograms", action="store_true")
    parser.add_argument("--no_phonemes", action="store_true")
    args = parser.parse_args(argv)

    from multilingual_text_to_speech_tpu.config import HParams
    from multilingual_text_to_speech_tpu.data import create_meta_file
    from multilingual_text_to_speech_tpu.training.logging import MetricsLogger

    hp = HParams()
    if args.hyper_parameters:
        hp.overlay(args.hyper_parameters)

    path = create_meta_file(
        args.dataset, args.root, args.output, hp,
        audio_sample_rate=args.sample_rate,
        num_fft_freqs=args.num_fft,
        spectrograms=not args.no_spectrograms,
        phonemes=not args.no_phonemes,
        progress=lambda f: MetricsLogger.progress(f, "Building metafile:"),
    )
    print(f"Wrote {path}")


if __name__ == "__main__":
    main()
