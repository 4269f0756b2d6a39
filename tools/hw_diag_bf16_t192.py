"""Diagnose the bf16 T=192 grad mismatch from hw_validate_train_forward_family.

The harness compared fused-bf16 grads against XLA-scan-bf16 grads and found
13% relative error on one encoder bias leaf.  Both sides run in bf16 with
different (but equally valid) accumulation orders, so neither is ground
truth.  This script computes XLA-scan grads in FLOAT32 as truth and reports,
for the worst leaves, how far EACH bf16 path sits from truth.  If the fused
kernel's distance is comparable to the XLA-bf16 distance, the mismatch is
bf16 scatter, not a kernel bug.

Run:  timeout 1800 python tools/hw_diag_bf16_t192.py
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
    from multilingual_text_to_speech_tpu.ops import pallas_train_decoder

    jax.config.update("jax_default_matmul_precision", "float32")

    rng_np = np.random.RandomState(0)
    batch, frames, text_len = 20, 128, 192
    hp = _flagship_hp()
    hp.attention_type = "location_sensitive"
    hp.prenet_layers = 2
    hp.dropout = 0.0
    hp.zoneout_hidden = 0.0
    hp.zoneout_cell = 0.0
    hp.dropout_hidden = 0.0

    text = jnp.asarray(rng_np.randint(
        3, hp.total_symbols(), (batch, text_len)), jnp.int32)
    lengths = jnp.full((batch,), text_len, jnp.int32)
    target = jnp.asarray(
        rng_np.randn(batch, frames, hp.num_mels) * 0.1, jnp.float32)
    tlen = jnp.full((batch,), frames, jnp.int32)
    speakers = jnp.asarray(
        rng_np.randint(0, hp.speaker_number, batch), jnp.int32)
    languages = jnp.asarray(
        np.arange(batch) % len(hp.languages), jnp.int32)
    key = jax.random.PRNGKey(0)

    def grads_for(case_dtype, mode):
        os.environ["MTTS_PALLAS_TRAIN_DECODER"] = mode
        model = Tacotron(hp, train=True, dtype=case_dtype)
        variables = jax.jit(model.init)(
            key, text, lengths, target, tlen, speakers, languages, 1.0, key)
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, **rest}, text, lengths, target, tlen,
                speakers, languages, 1.0, key, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(key, 1)})
            return (jnp.mean((out["pre_prediction"] - target) ** 2)
                    + 0.1 * jnp.mean(out["stop_token"] ** 2)
                    + 0.05 * jnp.mean(out["alignment"] ** 2))

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        jax.block_until_ready(grads)
        return float(loss), grads

    l_truth, g_truth = grads_for(jnp.float32, "off")
    print(f"xla f32 (truth): loss={l_truth:.6f}", flush=True)
    l_xb, g_xb = grads_for(jnp.bfloat16, "off")
    print(f"xla bf16: loss={l_xb:.6f}", flush=True)
    l_fb, g_fb = grads_for(jnp.bfloat16, "")
    print(f"fused bf16: loss={l_fb:.6f}", flush=True)

    rows = []
    for (pth, t), (_, xb), (_, fb) in zip(
            jax.tree_util.tree_leaves_with_path(g_truth),
            jax.tree_util.tree_leaves_with_path(g_xb),
            jax.tree_util.tree_leaves_with_path(g_fb)):
        t = np.asarray(t, np.float64)
        xb = np.asarray(xb, np.float64)
        fb = np.asarray(fb, np.float64)
        den = np.abs(t).max() + 1e-12
        e_x = np.abs(xb - t).max() / den
        e_f = np.abs(fb - t).max() / den
        e_ff = np.abs(fb - xb).max() / (np.abs(xb).max() + 1e-12)
        rows.append((e_ff, e_f, e_x, jax.tree_util.keystr(pth)))
    rows.sort(reverse=True)
    print("worst leaves by fused-vs-xla(bf16) rel error:")
    print(f"{'fused~xla_bf16':>15} {'fused~f32':>12} {'xla_bf16~f32':>13}  leaf")
    for e_ff, e_f, e_x, k in rows[:12]:
        print(f"{e_ff:15.3e} {e_f:12.3e} {e_x:13.3e}  {k}", flush=True)
    # verdict: fused path no farther from f32 truth than the XLA bf16 path
    worst_ratio = max((e_f + 1e-9) / (e_x + 1e-9) for _, e_f, e_x, _ in rows)
    med_f = float(np.median([e_f for _, e_f, _, _ in rows]))
    med_x = float(np.median([e_x for _, _, e_x, _ in rows]))
    print(f"median err-to-truth: fused {med_f:.3e}  xla {med_x:.3e}  "
          f"worst per-leaf ratio fused/xla {worst_ratio:.2f}", flush=True)
    print("DIAG DONE", flush=True)


if __name__ == "__main__":
    sys.exit(main())
