"""Serving throughput vs batch width on one chip.

bench.py quotes mel frames/s/chip at B=240 (48 streams x 5 languages, the
grouped-encoder-divisible pick from round 1).  The serving roofline table
(PARITY.md) says the 61 us/step at B=240/T=128 is ~2.3x above the int8-dot
floor with the remainder traffic-bound, and that "further gains need less
traffic or bigger batches" — this script measures the bigger-batch branch:
int8 gates, T=128, B in {240, 480, 960}, profiled device us/step and the
implied frames/s/chip.  Per-row math is block-partition-invariant, so wider
batches are the same model quality, just more concurrent streams.

Run (one TPU process at a time):
  timeout 3600 python tools/hw_batch_scaling.py 2>&1 | tee \
      tools/hw_results/batch_scaling_2026-08-19.log
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tools.trace_util import device_us  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    print("probe:", float(jax.jit(lambda x: x + 1)(jnp.float32(1))),
          flush=True)
    assert jax.devices()[0].platform == "tpu", jax.devices()

    from __graft_entry__ import _flagship_hp
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron
    from multilingual_text_to_speech_tpu.ops import pallas_decoder as pd

    chunk = 128
    text_len = 128
    decode_frames = 512
    hp = _flagship_hp()
    hp.decode_chunk_frames = chunk
    hp.pallas_decoder_int8 = True
    n_langs = len(hp.languages)

    model = Tacotron(hp, train=False, dtype=jnp.bfloat16)
    results = []
    for batch in (240, 480, 960):
        rng = np.random.RandomState(0)
        text = jnp.asarray(rng.randint(3, hp.total_symbols(),
                                       (batch, text_len)), jnp.int32)
        lengths = jnp.full((batch,), text_len, jnp.int32)
        speakers = jnp.asarray(rng.randint(0, hp.speaker_number, batch),
                               jnp.int32)
        languages = jnp.asarray(
            np.arange(batch) // (batch // n_langs), jnp.int32)
        group_langs = jnp.arange(n_langs, dtype=jnp.int32)
        key = jax.random.PRNGKey(0)
        variables = jax.jit(model.init)(
            key, text, lengths, jnp.zeros((batch, 32, hp.num_mels)),
            jnp.full((batch,), 32, jnp.int32), speakers, languages, 0.0, key)
        encode = jax.jit(lambda v, t, tl, s, l: model.apply(
            v, t, tl, s, l, group_langs=group_langs,
            method=Tacotron.encode_for_inference))
        fused = pd.make_decode_fn(hp, variables, jnp.bfloat16)
        step = jax.jit(lambda c, m, t_, k_, r: fused(c, m, t_, k_, r))

        n_chunks = decode_frames // chunk

        def run(seed):
            memory, mt, mask, carry = encode(
                variables, text, lengths, speakers, languages)
            k = jax.random.PRNGKey(seed)
            acc = None
            for _ in range(n_chunks):
                k, sub = jax.random.split(k)
                carry, (spec, stop) = step(carry, memory, mt, mask, sub)
                s = spec[0, -1, 0]
                acc = s if acc is None else acc + s
            return float(acc)

        run(0)  # warmup + compile (OOM would fire here)
        us = device_us(lambda: run(1))
        # end-to-end definition (encode + all decode chunks), identical
        # to bench.py's — the ratios compare like with like; encode is
        # ~3% of the total and also scales per-row
        fps = batch * decode_frames / (us / 1e6)
        per_step = us / decode_frames
        results.append((batch, per_step, fps))
        print(f"B={batch}: {per_step:.1f} us/frame-step end-to-end | "
              f"{fps/1e6:.2f}M frames/s/chip "
              f"({fps / results[0][2]:.3f}x of B=240)", flush=True)

    best = max(results, key=lambda r: r[2])
    print(f"BEST: B={best[0]} at {best[2]/1e6:.2f}M frames/s/chip", flush=True)
    print("BATCH SCALING DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
