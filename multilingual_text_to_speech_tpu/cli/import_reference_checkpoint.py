"""Convert a PyTorch reference checkpoint into this framework's format.

The reference ships pretrained checkpoints and rebuilds models from them
(``utils/__init__.py:29-37``: ``torch.load`` -> strip DataParallel prefixes
-> ``Params.load_state_dict(state['parameters'])`` -> ``load_state_dict``).
This CLI ports such a file into this framework's msgpack checkpoint so the
pretrained models drive ``cli/synthesize.py``, ``cli/gta.py`` or fine-tuning
with ``cli/train.py --checkpoint`` directly::

    python -m multilingual_text_to_speech_tpu.cli.import_reference_checkpoint \
        generated_switching_loss-111-0.122 -o checkpoints/imported.msgpack

Ported: model weights (all layouts translated, batch-norm running stats
included), hyper-parameters, guided-attention criterion state, epoch.
Not ported: torch Adam/scheduler state (fine-tuning restarts the optimizer
— the same partial-restore semantics the reference itself applies when
fine-tuning, train.py:276-281).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert a reference (PyTorch) checkpoint into this "
        "framework's checkpoint format.")
    parser.add_argument("checkpoint", type=str,
                        help="Path to the torch checkpoint file.")
    parser.add_argument("-o", "--output", type=str, default=None,
                        help="Output path (default: <checkpoint>.msgpack).")
    parser.add_argument("--hyper_parameters", type=str, default=None,
                        help="Optional JSON overlay applied AFTER the "
                        "checkpoint's own parameters (fine-tuning order, "
                        "reference train.py:211-219).")
    args = parser.parse_args(argv)

    try:
        import torch  # noqa: F401
    except ImportError:
        print("error: importing a reference checkpoint requires torch",
              file=sys.stderr)
        return 2

    from multilingual_text_to_speech_tpu.interop import (
        import_reference_checkpoint,
    )
    from multilingual_text_to_speech_tpu.training.checkpoint import (
        save_checkpoint,
    )

    hp, variables, criterion_state, meta = import_reference_checkpoint(
        args.checkpoint)
    if args.hyper_parameters:
        hp.overlay(args.hyper_parameters)

    out = args.output or args.checkpoint + ".msgpack"
    out_dir = os.path.dirname(out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    save_checkpoint(
        out,
        epoch=meta["epoch"],
        step=0,  # the reference checkpoint does not record a global step
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state={},
        hp=hp,
        criterion_state=criterion_state,
    )
    n_params = _count(variables["params"])
    print(f"imported {args.checkpoint} -> {out}")
    print(f"  encoder_type={hp.encoder_type}  epoch={meta['epoch']}  "
          f"parameters={n_params:,}")
    return 0


def _count(tree) -> int:
    import numpy as np

    if isinstance(tree, dict):
        return sum(_count(v) for v in tree.values())
    return int(np.size(tree))


if __name__ == "__main__":
    sys.exit(main())
