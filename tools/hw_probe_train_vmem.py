"""Empirical VMEM calibration probe for the fused train decoder.

For each probed (attention, dtype, batch, T, mem_dim) shape this FORCES a
backward-chunk size S (bypassing the `_vmem_chunk` byte model), attempts a
real Mosaic compile of the fused fwd+bwd step on the TPU, and reports the
largest S that actually fits the chip's 128M VMEM.  The results calibrate
the byte model's spill allowance (`_vmem_chunk`) and pin what
`tests/test_pallas_train_decoder.py::test_blocked_vmem_ceiling` may claim.

One process, one TPU session.  Run:
  timeout 3600 python tools/hw_probe_train_vmem.py
"""
import json
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
    from multilingual_text_to_speech_tpu.models.attention import (
        init_attention_state,
    )
    from multilingual_text_to_speech_tpu.models.decoder import DecoderCell
    from multilingual_text_to_speech_tpu.ops import pallas_train_decoder as ptd

    # force the requested chunk: the byte model only CAPS here, probing
    # must be able to exceed it
    orig_vmem_chunk = ptd._vmem_chunk
    ptd._vmem_chunk = lambda cfg, b, cap, backward, **k: cap

    def build(att, npre, dtype, b, t_len, mem_dim, att_dim):
        hp = _flagship_hp()
        hp.attention_type = att
        hp.prenet_layers = npre
        hp.dropout = 0.0
        hp.zoneout_hidden = 0.0
        hp.zoneout_cell = 0.0
        hp.dropout_hidden = 0.0
        rng = np.random.RandomState(0)
        memory = jnp.asarray(rng.randn(b, t_len, mem_dim) * 0.1, jnp.float32)
        mt = jnp.asarray(rng.randn(b, t_len, att_dim) * 0.1, jnp.float32)
        mask = jnp.ones((b, t_len), bool)
        frames = 128
        shifted = jnp.asarray(rng.randn(b, frames, hp.num_mels) * 0.1,
                              jnp.float32)
        teacher = jnp.ones((frames,), bool)
        cell = DecoderCell(hp, train=True, dtype=dtype)
        carry = {
            "h_att": jnp.zeros((b, hp.decoder_dimension)),
            "c_att": jnp.zeros((b, hp.decoder_dimension)),
            "h_gen": jnp.zeros((b, hp.decoder_dimension)),
            "c_gen": jnp.zeros((b, hp.decoder_dimension)),
            "context": jnp.zeros((b, mem_dim)),
            "frame": jnp.zeros((b, hp.num_mels)),
            "att_state": init_attention_state(att, b, t_len),
        }
        key = jax.random.PRNGKey(0)
        cell_params = cell.init(
            key, carry, jnp.asarray(True), shifted[:, 0], key, memory, mt,
            mask)["params"]
        return hp, cell_params, memory, mt, mask, shifted, teacher

    def try_compile(hp, dtype, args, fwd_chunk, bwd_chunk, with_grad):
        cell_params, memory, mt, mask, shifted, teacher = args
        decode = ptd.make_train_decode_fn(
            hp, dtype=dtype, fwd_chunk=fwd_chunk, bwd_chunk=bwd_chunk)

        def loss(p):
            spec, stop, w = decode(p, memory, mt, mask, shifted, teacher,
                                   jax.random.PRNGKey(3))
            return (jnp.mean(spec ** 2) + 0.1 * jnp.mean(stop ** 2)
                    + 0.05 * jnp.mean(w ** 2))

        try:
            if with_grad:
                l, g = jax.jit(jax.value_and_grad(loss))(cell_params)
                jax.block_until_ready(g)
            else:
                l = jax.jit(loss)(cell_params)
                jax.block_until_ready(l)
            return True, float(l)
        except Exception as e:  # noqa: BLE001 - want the OOM text
            msg = str(e)
            if "vmem" not in msg.lower() and "memory" not in msg.lower():
                raise
            used = [ln for ln in msg.splitlines() if "Used" in ln][:1]
            return False, (used[0].strip() if used else "OOM")

    cases = [
        # (tag, att, npre, dtype, b, T, mem, att_dim, start_S)
        # known from the validation harness: f32 T=128 b=20 fits at S=4
        # and f32 T=192 b=20 OOMs at S=4 (spill 41.3M with the 3-block
        # fold); map the rest of the boundary
        ("ls_f32_T192_b8", "location_sensitive", 2, jnp.float32, 8, 192, 292, 128, 8),
        ("ls_bf16_T128_b48", "location_sensitive", 2, jnp.bfloat16, 48, 128, 292, 128, 16),
        ("ls_bf16_T256_b50", "location_sensitive", 2, jnp.bfloat16, 50, 256, 528, 128, 8),
        ("ls_bf16_T256_b16", "location_sensitive", 2, jnp.bfloat16, 16, 256, 528, 128, 8),
        ("ls_bf16_T512_b16", "location_sensitive", 2, jnp.bfloat16, 16, 512, 528, 128, 4),
        ("fwd_bf16_T512_b16", "forward", 2, jnp.bfloat16, 16, 512, 528, 128, 16),
    ]
    results = {}
    for tag, att, npre, dtype, b, t_len, mem, a, start_s in cases:
        hp, *args = build(att, npre, dtype, b, t_len, mem, a)
        t_pad = ptd.padded_t_len(t_len, att)
        cfg = ptd._make_cfg(hp, t_len=t_pad, mem_dim=mem, att_dim=a,
                            dtype=dtype, train=True)
        model_f = orig_vmem_chunk(cfg, b, 64, False)
        model_s = orig_vmem_chunk(cfg, b, 32, True)
        print(f"--- {tag} (padded T {t_pad}, model picks fwd={model_f} "
              f"bwd={model_s}) ---", flush=True)
        # phase A: forward kernel alone (value only; residual streams on);
        # try the byte model's own pick FIRST — confirming the unforced
        # pick compiles is the point of the calibration
        best_f = 0
        tried = set()
        for s in (model_f, 64, 32, 16, 8, 4, 2, 1):
            if s < 1 or s in tried or (s != model_f
                                       and s > max(start_s * 4, 16)):
                continue
            tried.add(s)
            ok, info = try_compile(hp, dtype, args, fwd_chunk=s,
                                   bwd_chunk=1, with_grad=False)
            print(f"  fwd_chunk={s}: "
                  f"{'OK loss=' + repr(info) if ok else info}", flush=True)
            if ok:
                best_f = s
                break
        best = 0
        if best_f:
            # phase B: with the forward fixed, step the backward chunk
            tried = set()
            for s in (model_s, 32, 16, 8, 4, 2, 1):
                if s < 1 or s in tried or (s != model_s and s > start_s):
                    continue
                tried.add(s)
                ok, info = try_compile(hp, dtype, args, fwd_chunk=best_f,
                                       bwd_chunk=s, with_grad=True)
                print(f"  fwd={best_f} bwd_chunk={s}: "
                      f"{'OK loss=' + repr(info) if ok else info}",
                      flush=True)
                if ok:
                    best = s
                    break
        print(f"  => hardware max fwd={best_f} bwd={best}, "
              f"byte model fwd={model_f} bwd={model_s}", flush=True)
        results[tag] = {
            "hw_max_fwd_chunk": best_f, "hw_max_bwd_chunk": best,
            "model_fwd_chunk": model_f, "model_bwd_chunk": model_s,
            "model_pick_compiles": (best_f == model_f or model_f == 0)
            and (best == model_s or model_s == 0)}

    print(json.dumps(results))
    print("VMEM PROBE DONE", flush=True)


if __name__ == "__main__":
    sys.exit(main())
