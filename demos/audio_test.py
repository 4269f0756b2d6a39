"""DSP round-trip demo: wav -> spectrogram -> Griffin-Lim -> wav.

Script equivalent of the reference's ``notebooks/audio_test.ipynb``: loads a
waveform (or synthesizes a test signal), computes mel + linear spectrograms,
inverts both through Griffin-Lim, and reports the reconstruction MCD.

Usage:
    python demos/audio_test.py [--wav input.wav] [--output demo_audio]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--wav", default=None,
                        help="Input wav (default: synthesized chirp).")
    parser.add_argument("--output", default="demo_audio")
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from multilingual_text_to_speech_tpu.config import HParams
    from multilingual_text_to_speech_tpu.ops import audio
    from multilingual_text_to_speech_tpu.ops.io import load_wav, save_wav

    hp = HParams()
    os.makedirs(args.output, exist_ok=True)

    if args.wav:
        y = load_wav(args.wav, hp.sample_rate)
    else:
        sr = hp.sample_rate
        t = np.arange(2 * sr) / sr
        # chirp 200 -> 1000 Hz
        y = (0.5 * np.sin(2 * np.pi * (200 + 200 * t) * t)).astype(np.float32)
        save_wav(y, os.path.join(args.output, "input.wav"), sr)

    print(f"input: {len(y)} samples ({audio.duration(y, hp):.2f}s)")

    mel = audio.spectrogram(y, hp, mel=True)
    lin = audio.spectrogram(y, hp, mel=False)
    print(f"mel {mel.shape}, linear {lin.shape}")

    rec_lin = audio.inverse_spectrogram(lin, hp, mel=False)
    rec_mel = audio.inverse_mel_spectrogram(mel, hp)
    save_wav(rec_lin, os.path.join(args.output, "rec_linear_gl.wav"),
             hp.sample_rate)
    save_wav(rec_mel, os.path.join(args.output, "rec_mel_gl.wav"),
             hp.sample_rate)

    for name, rec in (("linear-GL", rec_lin), ("mel-GL", rec_mel)):
        mel2 = audio.spectrogram(np.asarray(rec, np.float32), hp, mel=True)
        mcd = audio.mel_cepstral_distortion(mel, mel2, hp, "dtw")
        print(f"{name} reconstruction MCD: {mcd:.3f} dB")
    print(f"wavs in {args.output}/")


if __name__ == "__main__":
    main()
