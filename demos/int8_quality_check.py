"""Quality check for the W8A8 int8 serving mode of the fused decoder.

The int8 path (ops/pallas_decoder.py, ``hp.pallas_decoder_int8``) quantizes
the two LSTM gate matmuls — per-output-column weight scales plus dynamic
per-row activation quantization — for ~1.8x on the serving step's dominant
MXU work.  It is lossy by construction, so this script quantifies the loss
the way the reference project quantifies synthesis quality (MCD,
evaluation/mcd_request.py): train the flagship-shaped tiny model of the
quality-parity study (demos/quality_parity_study.py) on the synthetic copy
task, then free-run held-out texts through

- the XLA scan decode (exact f32 baseline),
- the fused Pallas decoder (f32 compute, interpreter on CPU),
- the fused Pallas decoder in int8 mode,

and report per-path DTW-MCD against ground truth plus the int8-vs-f32 MCD
delta.  The acceptance bar mirrors BASELINE.md's cross-framework criterion:
|delta MCD| well under 0.1 dB.

Usage:
    python demos/int8_quality_check.py [--steps 600] [--report PARITY-note]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demos.quality_parity_study import (  # noqa: E402
    build_dataset,
    build_hp,
    make_batches,
    train_jax,
)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=600)
    parser.add_argument("--log_every", type=int, default=40)
    parser.add_argument("--eval_items", type=int, default=8)
    parser.add_argument("--json", default=None)
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from multilingual_text_to_speech_tpu.ops.audio import (
        mel_cepstral_distortion,
    )
    from multilingual_text_to_speech_tpu.synthesis import Synthesizer

    hp = build_hp()
    items = build_dataset(n_items=64, seed=0)
    train_items, eval_items = items[:-args.eval_items], items[-args.eval_items:]
    batches = make_batches(train_items, hp, seed=1)
    print(f"dataset: {len(train_items)} train / {len(eval_items)} eval; "
          f"training {args.steps} steps ...")
    variables, curve = train_jax(hp, batches, args.steps, args.log_every,
                                 torch_init_state=None)
    print(f"final training loss: {curve[-1][1]:.4f}")

    # deterministic synthesis comparison: same weights, dropout off, so the
    # ONLY difference between paths is the decode implementation
    hp.dropout = 0.0

    def free_run(use_fused: bool, use_int8: bool, use_streams: bool = False):
        hp.use_pallas_decoder = use_fused
        hp.pallas_decoder_int8 = use_int8
        os.environ["MTTS_PALLAS_DECODER"] = "interpret" if use_fused else "off"
        # int8 memory/memory-transform streams (round 3): the interpreter
        # runs the exact quantization math, so the MCD number here equals
        # the on-hardware quality of the streams mode
        os.environ["MTTS_PALLAS_INT8_STREAMS"] = "1" if use_streams else "0"
        synth = Synthesizer(hp, variables)
        out = [synth.spectrogram_from_ids(np.asarray(list(ids)))
               for ids, _ in eval_items]
        os.environ.pop("MTTS_PALLAS_INT8_STREAMS", None)
        return out

    class _McdHp:  # mel_cepstral_distortion only reads num_mfcc
        num_mfcc = 13

    paths = {
        "xla_f32": free_run(False, False),
        "fused_f32": free_run(True, False),
        "fused_int8": free_run(True, True),
        "fused_int8_streams": free_run(True, True, use_streams=True),
    }
    results = {"steps": args.steps, "final_loss": curve[-1][1]}
    for name, specs in paths.items():
        mcds = [mel_cepstral_distortion(mel.T, s, _McdHp, mode="dtw")
                for (ids, mel), s in zip(eval_items, specs)]
        results[f"{name}_mcd_dtw"] = float(np.mean(mcds))
    # int8 loss measured directly against the exact same-fused f32 decode
    cross = [mel_cepstral_distortion(a, b, _McdHp, mode="dtw")
             for a, b in zip(paths["fused_f32"], paths["fused_int8"])]
    results["int8_vs_f32_mcd"] = float(np.mean(cross))
    results["abs_mcd_delta"] = abs(
        results["fused_int8_mcd_dtw"] - results["fused_f32_mcd_dtw"])
    cross_s = [mel_cepstral_distortion(a, b, _McdHp, mode="dtw")
               for a, b in zip(paths["fused_f32"],
                               paths["fused_int8_streams"])]
    results["int8_streams_vs_f32_mcd"] = float(np.mean(cross_s))
    results["abs_mcd_delta_streams"] = abs(
        results["fused_int8_streams_mcd_dtw"]
        - results["fused_f32_mcd_dtw"])

    print(json.dumps(results, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    bar = 0.1
    ok = (results["abs_mcd_delta"] < bar
          and results["int8_vs_f32_mcd"] < bar
          and results["abs_mcd_delta_streams"] < bar
          and results["int8_streams_vs_f32_mcd"] < bar)
    print(f"|dMCD(int8 - f32)| = {results['abs_mcd_delta']:.4f}, "
          f"|dMCD(int8+streams - f32)| = "
          f"{results['abs_mcd_delta_streams']:.4f} "
          f"(bar {bar}): {'PASS' if ok else 'FAIL'}")
    if not ok:
        raise SystemExit(1)
    return results


if __name__ == "__main__":
    main()
