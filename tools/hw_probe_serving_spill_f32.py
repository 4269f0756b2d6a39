"""Empirical check of the serving VMEM byte model's f32 spill charge.

The per-row Mosaic spill allowance in `pallas_decoder._auto_block_cap`
(`esize*at_b + 24*1024`) was calibrated from ONE bf16/int8-gates OOM dump
(B=240, T=256; tools/hw_results/decode_crossover_2026-08-19.log). For f32
the charge doubles via `esize` with no measurement behind it. The comment
attributes the spill to the live `[BB, A*Tb]` energy row (compute dtype,
so esize scaling IS the natural model) plus f32 gate rows (dtype-
independent) — this probe decides between those by measuring the real
hardware block-size ceiling for an f32 serving decode near the cap
boundary and comparing it against the model's pick.

Interpretation:
  hw max bb == model cap      -> charge exact at f32 (model calibrated)
  hw max bb >  model cap      -> f32 charge conservative: lost throughput,
                                 recalibrate (dtype-independent part bigger)
  model cap fails to compile  -> model UNDER-charges f32: must fix

One process, one TPU session.  Run:
  timeout 3600 python tools/hw_probe_serving_spill_f32.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    print("probe:", float(jax.jit(lambda x: x + 1)(jnp.float32(1))),
          flush=True)
    assert jax.devices()[0].platform == "tpu", jax.devices()

    from __graft_entry__ import _flagship_hp
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron
    from multilingual_text_to_speech_tpu.ops import pallas_decoder as pd

    # flagship serving in FULL f32 (the exact-math serving path), int8 off
    hp = _flagship_hp()
    hp.compute_dtype = "float32"
    hp.pallas_decoder_int8 = False
    hp.decode_chunk_frames = 128
    hp.dropout = 0.0

    n_langs = len(hp.languages)
    batch, text_len = 240, 256   # the bf16 calibration point's (B, T)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(3, hp.total_symbols(), (batch, text_len)),
                       jnp.int32)
    text_lengths = jnp.full((batch,), text_len, jnp.int32)
    speakers = jnp.asarray(rng.randint(0, hp.speaker_number, batch),
                           jnp.int32)
    languages = jnp.asarray(np.arange(batch) // (batch // n_langs),
                            jnp.int32)
    group_langs = jnp.arange(n_langs, dtype=jnp.int32)

    model = Tacotron(hp, train=False, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    dummy_target = jnp.zeros((batch, 64, hp.num_mels), jnp.float32)
    variables = jax.jit(model.init)(
        key, text, text_lengths, dummy_target,
        jnp.full((batch,), 64, jnp.int32), speakers, languages, 0.0, key)
    encode = jax.jit(lambda v, t, tl, s, l: model.apply(
        v, t, tl, s, l, group_langs=group_langs,
        method=Tacotron.encode_for_inference))
    memory, mt, mask, carry = encode(
        variables, text, text_lengths, speakers, languages)
    mem_dim, att_dim = memory.shape[-1], mt.shape[-1]
    hidden = carry["h_att"].shape[-1]

    model_cap = pd._auto_block_cap(
        pd._padded_t(text_len), mem_dim, att_dim, hidden, hp.num_mels,
        hp.prenet_dimension, hp.decode_chunk_frames, jnp.float32,
        quantized=False, att_kind=pd.att_kind_of(hp),
        n_prenet=int(hp.prenet_layers))
    print(f"dims: mem={mem_dim} att={att_dim} hidden={hidden} "
          f"T={text_len} f32; byte-model block cap = {model_cap}",
          flush=True)

    def try_block(cap):
        os.environ["MTTS_PALLAS_BLOCK_CAP"] = str(cap)
        try:
            fused = pd.make_decode_fn(hp, variables, jnp.float32)
            step = jax.jit(lambda c, m, t_, k, r: fused(c, m, t_, k, r))
            c2, (spec, stop) = step(carry, memory, mt, mask,
                                    jax.random.PRNGKey(1))
            jax.block_until_ready(spec)
            return True, float(jnp.mean(spec))
        except Exception as e:  # noqa: BLE001 - want the OOM text
            msg = str(e)
            if "vmem" not in msg.lower() and "memory" not in msg.lower():
                raise
            used = [ln for ln in msg.splitlines() if "Used" in ln][:1]
            return False, (used[0].strip() if used else "OOM")
        finally:
            os.environ.pop("MTTS_PALLAS_BLOCK_CAP", None)

    # divisors of 240 around the boundary, ascending from the model's pick
    divisors = [d for d in (8, 10, 12, 15, 16, 20, 24, 30, 40, 48, 60, 80,
                            120, 240)]
    bb_model = max(d for d in divisors if d <= max(model_cap, 8))
    candidates = [bb_model] + [d for d in divisors if d > bb_model]
    hw_max = 0
    for bb in candidates:
        ok, info = try_block(bb)
        print(f"  block={bb}: {'OK mean=' + repr(info) if ok else info}",
              flush=True)
        if ok:
            hw_max = bb
        else:
            break
    print(f"=> hardware max block {hw_max} vs byte-model cap {model_cap} "
          f"(model bb pick {bb_model})", flush=True)
    if hw_max > bb_model:
        print("   f32 spill charge is CONSERVATIVE at this point "
              "(esize-scaling overstates f32 spill); recalibration would "
              "buy throughput, correctness unaffected.", flush=True)
    elif hw_max == bb_model:
        print("   f32 spill charge confirmed at the boundary.", flush=True)
    else:
        print("   MODEL UNDER-CHARGES f32 — fix _auto_block_cap!",
              flush=True)
    print("SERVING F32 SPILL PROBE DONE", flush=True)


if __name__ == "__main__":
    sys.exit(main())
