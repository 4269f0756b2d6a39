"""Single-file checkpoints carrying the full five-section training state.

Rebuild of the reference checkpoint contract (train.py:276-286,299-310):
``{epoch, model, optimizer, scheduler, parameters (full hp), criterion
(guided-attention state)}`` in one file, with support for PARTIAL loading
(only matching keys) for fine-tuning (train.py:277-281).  The embedded hp
makes synthesis self-contained (utils/__init__.py:29-37).

Format: msgpack of flax state-dicts + a JSON hp blob.  No torch pickle, no
directory trees — one portable file.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import serialization

from multilingual_text_to_speech_tpu.config import HParams


def save_checkpoint(
    path: str,
    *,
    epoch: int,
    step: int,
    params,
    batch_stats,
    opt_state,
    hp,
    criterion_state: Dict[str, Any],
) -> None:
    payload = {
        "epoch": np.int64(epoch),
        "step": np.int64(step),
        "model": {
            "params": serialization.to_state_dict(params),
            "batch_stats": serialization.to_state_dict(batch_stats),
        },
        "optimizer": serialization.to_state_dict(opt_state),
        "parameters": json.dumps(hp.state_dict(), ensure_ascii=False),
        "criterion": {k: np.float64(v) for k, v in criterion_state.items()},
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def _merge_matching(template, loaded):
    """Fine-tuning partial restore: use the loaded value wherever the key
    path exists in BOTH trees with matching shapes; keep the template value
    otherwise (reference: train.py:277-281)."""
    if isinstance(template, dict) and isinstance(loaded, dict):
        out = {}
        for k, tv in template.items():
            if k in loaded:
                out[k] = _merge_matching(tv, loaded[k])
            else:
                out[k] = tv
        return out
    t_shape = getattr(template, "shape", None)
    l_shape = getattr(loaded, "shape", None)
    if t_shape is not None and l_shape is not None and t_shape != l_shape:
        return template
    return loaded


def _is_checkpoint_file(path: str) -> bool:
    """Cheap validity probe: the payload is a msgpack map whose first key is
    one of the five sections — a stray file in the directory must not be
    picked up as 'the checkpoint' (it would fail much later with an opaque
    msgpack error)."""
    try:
        with open(path, "rb") as f:
            head = f.read(64)
    except OSError:
        return False
    if not head or not (0x80 <= head[0] <= 0x8F or head[0] in (0xDE, 0xDF)):
        return False  # not a msgpack map (fixmap/map16/map32)
    # msgpack sorts keys: "criterion" leads in this format's payloads
    return any(k in head for k in (b"criterion", b"epoch", b"model"))


def find_latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    """Newest checkpoint file in a directory (automatic crash recovery —
    the reference requires naming the file manually, README.md:125-131).
    Non-checkpoint files (logs, temp files) are skipped."""
    if not os.path.isdir(checkpoint_dir):
        return None
    candidates = [
        os.path.join(checkpoint_dir, f)
        for f in os.listdir(checkpoint_dir)
        if not f.endswith(".tmp") and
        os.path.isfile(os.path.join(checkpoint_dir, f)) and
        _is_checkpoint_file(os.path.join(checkpoint_dir, f))
    ]
    if not candidates:
        return None
    return max(candidates, key=os.path.getmtime)


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Read the raw checkpoint payload (hp decoded into an HParams)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    payload["hp"] = HParams.from_state_dict(json.loads(payload["parameters"]))
    return payload


def restore_into(
    payload: Dict[str, Any],
    *,
    params=None,
    batch_stats=None,
    opt_state=None,
    partial: bool = False,
):
    """Restore checkpoint sections into concrete pytrees.

    With ``partial=True`` only matching keys are taken from the checkpoint
    (fine-tuning a changed architecture)."""
    out = {}
    if params is not None:
        loaded = payload["model"]["params"]
        if partial:
            loaded = _merge_matching(serialization.to_state_dict(params), loaded)
        out["params"] = serialization.from_state_dict(params, loaded)
    if batch_stats is not None:
        loaded = payload["model"]["batch_stats"]
        if partial:
            loaded = _merge_matching(
                serialization.to_state_dict(batch_stats), loaded
            )
        out["batch_stats"] = serialization.from_state_dict(batch_stats, loaded)
    if opt_state is not None:
        out["opt_state"] = serialization.from_state_dict(
            opt_state, payload["optimizer"]
        )
    return out
