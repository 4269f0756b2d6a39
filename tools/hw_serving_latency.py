"""Interactive-serving latency on one chip: few-stream real-time factor
and time-to-first-audio.

bench.py quotes bulk throughput (B=240, chunk 128). Interactive use cares
about the other end: how fast ONE utterance decodes (real-time factor per
stream) and how quickly the first audible chunk is ready. This script
measures the fused serving decoder at B in {1, 8, 16} with the
interactive chunk size (64 frames = 0.8 s of audio at the 12.5 ms hop):

  * device us per decoded frame-step (profiler, not wall clock);
  * per-stream real-time factor = 12.5 ms hop / us-per-step;
  * time-to-first-audio = encode + one 64-frame chunk (device time).

The reference synthesizes batch-1 with a Python frame loop
(synthesize.py:42-85, modules/tacotron2.py:419-480); this measures the
same workload shape on the fused kernel.

Run (one TPU process at a time):
  timeout 3600 python tools/hw_serving_latency.py 2>&1 | tee \
      tools/hw_results/serving_latency_2026-08-19.log
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

    chunk = 64                     # interactive default (synthesis.py)
    text_len = 128
    hop_ms = 12.5                  # 80 frames/s real time
    hp = _flagship_hp()
    hp.decode_chunk_frames = chunk
    hp.pallas_decoder_int8 = True
    n_langs = len(hp.languages)

    model = Tacotron(hp, train=False, dtype=jnp.bfloat16)
    # params are batch-independent: init ONCE at a language-divisible
    # batch (the grouped encoder's training forward needs B % L == 0),
    # then serve any batch via the row-group encode path
    rng = np.random.RandomState(0)
    init_b = n_langs
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        key,
        jnp.asarray(rng.randint(3, hp.total_symbols(),
                                (init_b, text_len)), jnp.int32),
        jnp.full((init_b,), text_len, jnp.int32),
        jnp.zeros((init_b, 32, hp.num_mels)),
        jnp.full((init_b,), 32, jnp.int32),
        jnp.zeros((init_b,), jnp.int32),
        jnp.arange(init_b, dtype=jnp.int32) % n_langs,
        0.0, key)
    fused = pd.make_decode_fn(hp, variables, jnp.bfloat16)

    for batch in (1, 8, 16):
        text = jnp.asarray(rng.randint(3, hp.total_symbols(),
                                       (batch, text_len)), jnp.int32)
        lengths = jnp.full((batch,), text_len, jnp.int32)
        speakers = jnp.asarray(rng.randint(0, hp.speaker_number, batch),
                               jnp.int32)
        # interactive case: one language; a single row group spans the batch
        languages = jnp.zeros((batch,), jnp.int32)
        group_langs = jnp.zeros((1,), jnp.int32)
        encode = jax.jit(lambda v, t, tl, s, l: model.apply(
            v, t, tl, s, l, group_langs=group_langs,
            method=Tacotron.encode_for_inference))
        step = jax.jit(lambda c, m, t_, k_, r: fused(c, m, t_, k_, r))

        def first_chunk(seed):
            memory, mt, mask, carry = encode(
                variables, text, lengths, speakers, languages)
            k = jax.random.PRNGKey(seed)
            carry, (spec, stop) = step(carry, memory, mt, mask, k)
            return float(spec[0, -1, 0])

        def eight_chunks(seed):
            memory, mt, mask, carry = encode(
                variables, text, lengths, speakers, languages)
            k = jax.random.PRNGKey(seed)
            acc = None
            for _ in range(8):
                k, sub = jax.random.split(k)
                carry, (spec, stop) = step(carry, memory, mt, mask, sub)
                s = spec[0, -1, 0]
                acc = s if acc is None else acc + s
            return float(acc)

        first_chunk(0)  # warmup + compile
        tta_us = device_us(lambda: first_chunk(1))
        # separate the encode pass so the per-frame number is decode-only
        # (a run_us/(8*chunk) quotient would smear amortized encode time
        # into the frame steps — ~4% at B=1)
        enc_us = device_us(lambda: float(np.asarray(encode(
            variables, text, lengths, speakers, languages)[0])[0, 0, 0]))
        run_us = device_us(lambda: eight_chunks(2))
        per_step = (run_us - enc_us) / (8 * chunk)
        rtf = hop_ms * 1e3 / per_step
        print(f"B={batch}: decode {per_step:.1f} us/frame-step "
              f"(encode {enc_us/1e3:.2f} ms separate) | per-stream "
              f"real-time factor {rtf:.0f}x | time-to-first-audio "
              f"(encode + {chunk} frames = 0.8 s) {tta_us/1e3:.2f} ms "
              f"device", flush=True)

    print("SERVING LATENCY DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
