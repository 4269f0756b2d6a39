"""Batch silence trimming of wav trees (sox-free).

Rebuild of ``/root/reference/data/comvoi_clean/silence.sh`` (sox
``silence 1 0.05 0`` front+back trimming) using this framework's own
energy-based trimmer — no sox dependency, runs anywhere.

Usage:
    python -m multilingual_text_to_speech_tpu.dataset_prepare.trim \
        --root /data/comvoi --top_db 50
"""

from __future__ import annotations

import os
from glob import glob


def trim_tree(root: str, top_db: float = 50.0, window_ms: float = 25.0,
              hop_ms: float = 10.0, sample_rate: int = 22050,
              suffix: str = ".wav") -> int:
    from multilingual_text_to_speech_tpu.config import HParams
    from multilingual_text_to_speech_tpu.ops.audio import trim_silence
    from multilingual_text_to_speech_tpu.ops.io import load_wav, save_wav

    hp = HParams()
    hp.sample_rate = sample_rate

    count = 0
    for path in glob(os.path.join(root, "**", f"*{suffix}"), recursive=True):
        data = load_wav(path)
        trimmed, (start, end) = trim_silence(
            data, window_ms, hop_ms, hp, top_db=top_db
        )
        if len(trimmed) and len(trimmed) < len(data):
            save_wav(trimmed, path, sample_rate)
            count += 1
    return count


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("--root", type=str, required=True)
    parser.add_argument("--top_db", type=float, default=50.0)
    parser.add_argument("--sample_rate", type=int, default=22050)
    args = parser.parse_args(argv)

    n = trim_tree(args.root, args.top_db, sample_rate=args.sample_rate)
    print(f"Trimmed {n} files")


if __name__ == "__main__":
    main()
