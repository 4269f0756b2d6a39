"""Off-device replica of hw_validate_int8_streams' 8-step parity gate.

The 2026-08-19 hardware run measured rel(streams-on, streams-off) = 0.105
over 8 AR steps at flagship serving dims — above the 0.03 gate. This
script runs the IDENTICAL comparison through the Pallas interpreter on
CPU (exact kernel math, no Mosaic): if the interpreter reproduces ~0.1,
the gate was miscalibrated for a random-init net and the Mosaic kernel is
faithful; if the interpreter is orders smaller, Mosaic lowering diverges
from the spec and there is a real bug.

Run:  timeout 3600 python tools/diag_int8_streams_gate.py [batch]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_hp
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron
    from multilingual_text_to_speech_tpu.ops import pallas_decoder

    hp = _flagship_hp()
    hp.pallas_decoder_int8 = True
    compute_dtype = jnp.bfloat16

    model = Tacotron(hp, train=False, dtype=compute_dtype)
    n_langs = len(hp.languages)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2 * n_langs
    rng = np.random.RandomState(0)
    text_len = 128

    text = jnp.asarray(
        rng.randint(3, hp.total_symbols(), (batch, text_len)), jnp.int32)
    text_lengths = jnp.full((batch,), text_len, jnp.int32)
    speakers = jnp.asarray(
        rng.randint(0, hp.speaker_number, batch), jnp.int32)
    languages = jnp.asarray(
        np.arange(batch) // (batch // n_langs), jnp.int32)
    group_langs = jnp.arange(n_langs, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)
    dummy_target = jnp.zeros((batch, 64, hp.num_mels), jnp.float32)
    variables = jax.jit(model.init)(
        key, text, text_lengths, dummy_target,
        jnp.full((batch,), 64, jnp.int32), speakers, languages, 0.0, key)
    memory, mt, mask, carry = jax.jit(
        lambda v: model.apply(
            v, text, text_lengths, speakers, languages,
            group_langs=group_langs,
            method=Tacotron.encode_for_inference))(variables)

    def decode_fn(streams, chunk):
        hp.decode_chunk_frames = chunk
        hp.pallas_decoder_int8_streams = streams
        fused = pallas_decoder.make_decode_fn(hp, variables, compute_dtype,
                                              interpret=True)
        return jax.jit(lambda carry, m, mt, mask, r: fused(carry, m, mt,
                                                           mask, r))

    k = jax.random.PRNGKey(7)
    d_off8 = decode_fn(False, 8)
    d_on8 = decode_fn(True, 8)
    _, (g_off, _) = d_off8(carry, memory, mt, mask, k)
    _, (g_on, _) = d_on8(carry, memory, mt, mask, k)
    g_off, g_on = map(np.asarray, (g_off, g_on))
    rel = np.linalg.norm(g_on - g_off) / max(np.linalg.norm(g_off), 1e-9)
    print(f"interpret 8-step rel(on,off) = {rel:.4e}  (hw measured 0.105)",
          flush=True)
    # per-step divergence profile: where does the error take off?
    for s in range(8):
        r = (np.linalg.norm(g_on[:, s] - g_off[:, s])
             / max(np.linalg.norm(g_off[:, s]), 1e-9))
        print(f"  step {s}: rel {r:.3e}", flush=True)
    print("DIAG DONE", flush=True)


if __name__ == "__main__":
    sys.exit(main())
