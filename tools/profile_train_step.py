"""Profile the flagship train step; bucket device time by source op.

Groups XLA op events by the op_name metadata prefix (module path) to show
where the 60 ms goes beyond the fused decoder kernels.
"""
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    print("probe:", float(jax.jit(lambda x: x + 1)(jnp.float32(1))), flush=True)

    from __graft_entry__ import _flagship_hp, _make_batch
    from multilingual_text_to_speech_tpu.models.tacotron import (
        Tacotron, tacotron_loss)
    from multilingual_text_to_speech_tpu.training.trainer import (
        dropout_stream_key, make_optimizer)

    import sys

    hp = _flagship_hp()
    model = Tacotron(hp, train=True, dtype=jnp.bfloat16)
    # optional: text_len [batch] positional overrides, e.g.
    #   python tools/profile_train_step.py 256        (T-blocked fold)
    batch, text_len, frames = 50, 128, 512
    argv = [a for a in sys.argv[1:] if not a.startswith("-")]
    if argv:
        text_len = int(argv[0])
    if len(argv) > 1:
        batch = int(argv[1])
    print(f"profiling batch={batch} text_len={text_len} frames={frames}",
          flush=True)
    arrays = _make_batch(hp, batch, text_len, frames)
    (text, text_lengths, target, target_lengths, stop,
     speakers, languages) = arrays

    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        key, text, text_lengths, target, target_lengths, speakers, languages,
        1.0, key)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(hp)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, rng):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                text, text_lengths, target, target_lengths,
                speakers, languages, 1.0, rng,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_stream_key(hp, rng)})
            total, _ = tacotron_loss(
                out, hp=hp, input_lengths=text_lengths,
                target_lengths=target_lengths, pre_target=target,
                post_target=target, stop_target=stop, speakers=speakers,
                guided_att_variance=0.25)
            return total, mut
        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (loss, optax.apply_updates(params, updates),
                mut.get("batch_stats", batch_stats), new_opt)

    loss, params, batch_stats, opt_state = train_step(
        params, batch_stats, opt_state, key)
    print("warm loss:", float(loss), flush=True)

    trace_dir = tempfile.mkdtemp(prefix="train_trace_")
    jax.profiler.start_trace(trace_dir)
    loss, params, batch_stats, opt_state = train_step(
        params, batch_stats, opt_state, jax.random.PRNGKey(1))
    float(loss)
    jax.profiler.stop_trace()

    tf = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))[-1]
    data = json.load(gzip.open(tf))
    events = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    total = 0.0
    by_op = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid"), ""):
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            total += e.get("dur", 0)
            continue
        by_op[name] += e.get("dur", 0)
    print(f"total step device time: {total/1000:.1f} ms")
    for name, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{us:10.1f} us  {name[:120]}")


if __name__ == "__main__":
    main()
