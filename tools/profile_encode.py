"""Profile encode_for_inference at bench shapes on the real chip.

Dumps the top device-side ops by summed duration from a jax.profiler trace.
"""
import glob
import gzip
import json
import sys
import tempfile
from collections import defaultdict

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # tunnel probe
    print("probe:", float(jax.jit(lambda x: x + 1)(jnp.float32(1))), flush=True)
    print("platform:", jax.devices()[0].platform, flush=True)

    from __graft_entry__ import _flagship_hp
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron

    hp = _flagship_hp()
    hp.decode_chunk_frames = 128
    compute_dtype = jnp.bfloat16 if hp.compute_dtype == "bfloat16" else jnp.float32
    model = Tacotron(hp, train=False, dtype=compute_dtype)

    n_langs = len(hp.languages)
    batch = 48 * n_langs
    text_len = 128

    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(3, hp.total_symbols(), (batch, text_len)), jnp.int32)
    text_lengths = jnp.full((batch,), text_len, jnp.int32)
    speakers = jnp.asarray(rng.randint(0, hp.speaker_number, batch), jnp.int32)
    languages = jnp.asarray(np.arange(batch) // (batch // n_langs), jnp.int32)
    group_langs = jnp.arange(n_langs, dtype=jnp.int32)

    key = jax.random.PRNGKey(0)
    dummy_target = jnp.zeros((batch, 64, hp.num_mels), jnp.float32)
    variables = jax.jit(model.init)(
        key, text, text_lengths, dummy_target,
        jnp.full((batch,), 64, jnp.int32), speakers, languages, 0.0, key,
    )

    encode = jax.jit(lambda v, t, tl, s, l: model.apply(
        v, t, tl, s, l, group_langs=group_langs,
        method=Tacotron.encode_for_inference))

    out = encode(variables, text, text_lengths, speakers, languages)
    jax.block_until_ready(out)
    print("warmed", flush=True)

    trace_dir = tempfile.mkdtemp(prefix="enc_trace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        out = encode(variables, text, text_lengths, speakers, languages)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    tf = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))[-1]
    data = json.load(gzip.open(tf))
    events = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}

    # total jit_ device time
    total_us = sum(e.get("dur", 0) for e in events
                   if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), "")
                   and e.get("name", "").startswith("jit_"))
    print(f"total encode device time: {total_us/3:.0f} us/call (3 calls)")

    # per-op breakdown: XLA op events live on the TPU pid non-step tracks
    by_op = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid"), ""):
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            continue
        by_op[name] += e.get("dur", 0)
    top = sorted(by_op.items(), key=lambda kv: -kv[1])[:40]
    for name, us in top:
        print(f"{us/3:10.1f} us  {name[:140]}")


if __name__ == "__main__":
    main()
