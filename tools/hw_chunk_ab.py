"""A/B the serving decode chunk size at the bench configuration.

bench.py decodes 512 frames as 4 chunks of 128. Fewer, larger chunks
amortize per-dispatch fixed cost (weight DMA into VMEM, kernel launch)
over more frames; the VMEM byte model says chunk 256 still runs a single
240-row block while chunk 512 must split into 120-row blocks. Measures
full-run device time (encode + all chunks, same shape as bench.py) at
chunk in {128, 256, 512}, B=240, T=128, int8 gates.

Run (one TPU process at a time):
  timeout 3600 python tools/hw_chunk_ab.py 2>&1 | tee \
      tools/hw_results/chunk_ab_2026-08-19.log
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

    text_len = 128
    decode_frames = 512
    base_hp = _flagship_hp()
    n_langs = len(base_hp.languages)
    batch = 48 * n_langs

    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(3, base_hp.total_symbols(),
                                   (batch, text_len)), jnp.int32)
    lengths = jnp.full((batch,), text_len, jnp.int32)
    speakers = jnp.asarray(rng.randint(0, base_hp.speaker_number, batch),
                           jnp.int32)
    languages = jnp.asarray(np.arange(batch) // (batch // n_langs),
                            jnp.int32)
    group_langs = jnp.arange(n_langs, dtype=jnp.int32)

    model = Tacotron(base_hp, train=False, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        key, text, lengths, jnp.zeros((batch, 32, base_hp.num_mels)),
        jnp.full((batch,), 32, jnp.int32), speakers, languages, 0.0, key)
    encode = jax.jit(lambda v, t, tl, s, l: model.apply(
        v, t, tl, s, l, group_langs=group_langs,
        method=Tacotron.encode_for_inference))

    results = []
    for chunk in (128, 256, 512):
        hp = _flagship_hp()
        hp.decode_chunk_frames = chunk
        hp.pallas_decoder_int8 = True
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

        run(0)  # warmup + compile
        us = device_us(lambda: run(1))
        fps = batch * decode_frames / (us / 1e6)
        results.append((chunk, fps))
        print(f"chunk={chunk}: {us / decode_frames:.1f} us/frame-step | "
              f"{fps/1e6:.3f}M frames/s/chip "
              f"({fps / results[0][1]:.3f}x of chunk 128)", flush=True)

    best = max(results, key=lambda r: r[1])
    print(f"BEST: chunk={best[0]} at {best[1]/1e6:.3f}M frames/s/chip",
          flush=True)
    print("CHUNK AB DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
