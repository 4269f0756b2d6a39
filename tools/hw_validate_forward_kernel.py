"""Hardware validation for the forward-attention serving kernels
(round 3: ops/pallas_decoder.py att_kind "fwd"/"fwd_trans").

One process, one TPU session: Mosaic-compiles both forward-family kernel
variants at flagship-ish dims (plus prenet depth 3 and the T-blocked
layout), checks parity vs the XLA scan on-device, and measures device
us/step vs the scan.

Run:  timeout 1200 python tools/hw_validate_forward_kernel.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


from tools.trace_util import device_us  # noqa: E402


def main():
    import functools

    import jax
    import jax.numpy as jnp

    print("probe:", float(jax.jit(lambda x: x + 1)(jnp.float32(1))),
          flush=True)
    assert jax.devices()[0].platform == "tpu", jax.devices()

    from __graft_entry__ import _flagship_hp
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron
    from multilingual_text_to_speech_tpu.ops import pallas_decoder

    jax.config.update("jax_default_matmul_precision", "float32")

    cases = [
        ("forward", 128, 2, {}),
        ("forward_transition_agent", 128, 2, {}),
        ("forward", 384, 2, {}),                 # T-blocked layout
        ("location_sensitive", 128, 3, {}),      # prenet depth 3
    ]
    rng_np = np.random.RandomState(0)
    for att_type, text_len, n_prenet, over in cases:
        hp = _flagship_hp()
        hp.attention_type = att_type
        hp.prenet_layers = n_prenet
        hp.decode_chunk_frames = 64
        for k, v in over.items():
            setattr(hp, k, v)
        assert pallas_decoder.supports(hp)
        model = Tacotron(hp, train=False, dtype=jnp.float32)

        batch = 40
        text = jnp.asarray(rng_np.randint(
            3, hp.total_symbols(), (batch, text_len)), jnp.int32)
        lengths = jnp.full((batch,), text_len, jnp.int32)
        speakers = jnp.asarray(
            rng_np.randint(0, hp.speaker_number, batch), jnp.int32)
        languages = jnp.asarray(
            np.arange(batch) % len(hp.languages), jnp.int32)
        key = jax.random.PRNGKey(0)
        variables = jax.jit(model.init)(
            key, text, lengths, jnp.zeros((batch, 32, hp.num_mels)),
            jnp.full((batch,), 32, jnp.int32), speakers, languages, 0.0,
            key)
        encode = jax.jit(functools.partial(
            model.apply, method=Tacotron.encode_for_inference))
        memory, mt, mask, carry = encode(variables, text, lengths,
                                         speakers, languages)

        hp.dropout = 0.0
        fused = pallas_decoder.make_decode_fn(hp, variables, jnp.float32)
        d_fused = jax.jit(lambda c, m, t, k_, r: fused(c, m, t, k_, r))
        d_xla = jax.jit(functools.partial(
            model.apply, method=Tacotron.decode_chunk),
            static_argnames=("chunk_frames",))

        k = jax.random.PRNGKey(3)
        c_f, (s_f, _) = d_fused(carry, memory, mt, mask, k)   # Mosaic compile
        c_x, (s_x, _) = d_xla(variables, carry, memory, mt, mask, k,
                              chunk_frames=64)
        s_f, s_x = np.asarray(s_f), np.asarray(s_x)
        rel = np.linalg.norm(s_f - s_x) / max(np.linalg.norm(s_x), 1e-9)
        wsum = np.asarray(c_f["att_state"]["weights"]).sum(-1)
        print(f"{att_type} T={text_len} prenet={n_prenet}: "
              f"rel={rel:.2e} wsum[{wsum.min():.4f},{wsum.max():.4f}]",
              flush=True)
        assert np.isfinite(s_f).all()
        assert rel < 1e-3, rel

        us_f = device_us(lambda: np.asarray(
            d_fused(carry, memory, mt, mask, k)[1][0])) / 64
        us_x = device_us(lambda: np.asarray(
            d_xla(variables, carry, memory, mt, mask, k,
                  chunk_frames=64)[1][0])) / 64
        print(f"  fused {us_f:.1f} us/step vs XLA {us_x:.1f} "
              f"({us_x / us_f:.2f}x)", flush=True)

    print("FORWARD-KERNEL HW VALIDATION OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())
