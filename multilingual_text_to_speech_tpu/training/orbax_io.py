"""Optional Orbax checkpoint backend for multi-host / sharded state.

The default single-file msgpack checkpoint (checkpoint.py) matches the
reference's one-file-per-checkpoint contract and is ideal for single-host
training and self-contained synthesis.  For multi-host SPMD training
(sharded parameters, process-parallel writes), Orbax writes each shard from
its owning host; this wrapper stores the same five logical sections with hp
as a JSON sidecar.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np

from multilingual_text_to_speech_tpu.config import HParams


def save_checkpoint_orbax(path: str, *, epoch: int, step: int, params,
                          batch_stats, opt_state, hp,
                          criterion_state: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                "params": params,
                "batch_stats": batch_stats,
                "opt_state": opt_state,
            },
            force=True,
        )
    meta = {
        "epoch": epoch,
        "step": step,
        "parameters": hp.state_dict(),
        "criterion": {k: float(v) for k, v in criterion_state.items()},
    }
    with open(os.path.join(path, "meta.json"), "w", encoding="utf-8") as f:
        json.dump(meta, f, ensure_ascii=False)


def load_checkpoint_orbax(path: str, *, params, batch_stats, opt_state):
    """Restore into template pytrees; returns (state_dict, meta)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            path,
            {
                "params": params,
                "batch_stats": batch_stats,
                "opt_state": opt_state,
            },
        )
    with open(os.path.join(path, "meta.json"), "r", encoding="utf-8") as f:
        meta = json.load(f)
    meta["hp"] = HParams.from_state_dict(meta["parameters"])
    return restored, meta
