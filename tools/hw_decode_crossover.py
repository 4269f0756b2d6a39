"""Measure the fused-Pallas vs XLA-scan serving crossover over (batch, T).

Round-3 left one known regression: at batch 40 / T=512 the fused serving
kernel measured ~0.9x the XLA scan (PARITY.md), yet the Synthesizer always
preferred the fused path.  This tool measures device us/step for BOTH paths
across a (batch, text-length) grid at the bench serving config (flagship ls
attention, bf16, int8 memory weights) and prints a JSON table that
`synthesis._prefer_fused_shape` routes on.

One process, one TPU session.  Run:
  timeout 3600 python tools/hw_decode_crossover.py
"""
import functools
import json
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
    from multilingual_text_to_speech_tpu.ops import pallas_decoder

    hp = _flagship_hp()
    hp.pallas_decoder_int8 = True      # bench serving mode
    compute_dtype = jnp.bfloat16
    n_langs = len(hp.languages)
    rng = np.random.RandomState(0)
    chunk = 64

    results = {}
    for batch in (8, 40, 120, 240):
        b = -(-batch // n_langs) * n_langs  # language-complete groups
        model = Tacotron(hp, train=False, dtype=compute_dtype)
        for text_len in (128, 256, 512):
            hp.decode_chunk_frames = chunk
            text = jnp.asarray(
                rng.randint(3, hp.total_symbols(), (b, text_len)), jnp.int32)
            lengths = jnp.full((b,), text_len, jnp.int32)
            speakers = jnp.asarray(
                rng.randint(0, hp.speaker_number, b), jnp.int32)
            languages = jnp.asarray(np.arange(b) % n_langs, jnp.int32)
            key = jax.random.PRNGKey(0)
            variables = jax.jit(model.init)(
                key, text, lengths, jnp.zeros((b, 32, hp.num_mels)),
                jnp.full((b,), 32, jnp.int32), speakers, languages, 0.0, key)
            memory, mt, mask, carry = jax.jit(functools.partial(
                model.apply, method=Tacotron.encode_for_inference))(
                variables, text, lengths, speakers, languages)

            if not pallas_decoder.fits_vmem(
                    text_len, memory.shape[-1], mt.shape[-1],
                    carry["h_att"].shape[-1], carry["frame"].shape[-1],
                    int(hp.prenet_dimension), chunk, compute_dtype,
                    quantized=True,
                    att_kind=pallas_decoder.att_kind_of(hp),
                    n_prenet=int(hp.prenet_layers)):
                print(f"B={b} T={text_len}: fused no-fit, skipping",
                      flush=True)
                continue

            fused = pallas_decoder.make_decode_fn(hp, variables,
                                                  compute_dtype)
            d_f = jax.jit(lambda c, m, t_, k_, r: fused(c, m, t_, k_, r))
            d_x = jax.jit(functools.partial(
                model.apply, method=Tacotron.decode_chunk),
                static_argnames=("chunk_frames",))
            k = jax.random.PRNGKey(7)
            # compile + sanity
            _, (s_f, _) = d_f(carry, memory, mt, mask, k)
            _, (s_x, _) = d_x(variables, carry, memory, mt, mask, k,
                              chunk_frames=chunk)
            assert np.isfinite(np.asarray(s_f)).all()
            us_f = device_us(lambda: np.asarray(
                d_f(carry, memory, mt, mask, k)[1][0])) / chunk
            us_x = device_us(lambda: np.asarray(
                d_x(variables, carry, memory, mt, mask, k,
                    chunk_frames=chunk)[1][0])) / chunk
            results[f"{b}x{text_len}"] = {
                "fused_us": round(us_f, 1), "xla_us": round(us_x, 1),
                "speedup": round(us_x / us_f, 3)}
            print(f"B={b} T={text_len}: fused {us_f:.1f} us/step  "
                  f"xla {us_x:.1f}  ({us_x / us_f:.2f}x)", flush=True)

    print(json.dumps(results))
    print("CROSSOVER DONE", flush=True)


if __name__ == "__main__":
    sys.exit(main())
