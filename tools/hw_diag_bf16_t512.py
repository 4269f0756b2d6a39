"""Mechanistic diagnosis of the forward T=512 bf16 grad-gate failure
(tools/hw_results/train_forward_family_2026-08-19b.log).

Facts so far: the SAME kernel at T=512 in f32 matches XLA grads to
4.73e-6 on every leaf (hw_results/train_forward_family_2026-08-19c.log),
so the kernel math is exact; only the bf16 run trips the per-leaf
``fused <= 2x xla-bf16 + 5e-3`` gate — on ENCODER leaves, 3.4x the XLA
bf16 scan's distance-to-truth.

Hypothesis: the fused kernel's responsibility ends at its custom-VJP
boundary — the decoder-side parameter grads it computes directly, plus
the ``d_encoded`` cotangent it hands to the (identical XLA) encoder
backward.  If both are as close to f32 truth as the XLA-bf16 scan's,
then the encoder-leaf scatter is DOWNSTREAM AMPLIFICATION of equal-
quality cotangent noise by the deep generated-encoder backprop (bias
grads sum ~B*T near-cancelling terms -> small denominators), and no
fixed per-leaf ratio gate on encoder leaves can be meaningful.

Method: split the model at ``encoded`` (models/tacotron.py:190 casts it
to f32, so the cotangent lives in f32 regardless of compute dtype):

  enc:  params -> encoded                       (pure XLA, both paths)
  dec:  (params, encoded) -> loss               (fused kernel vs XLA scan)

For truth (xla f32), xla-bf16 and fused-bf16 compute
  (1) decoder-side param grads  = d loss / d params  through ``dec``
  (2) the cotangent             = d loss / d encoded
then push EACH path's cotangent through the SAME exact f32 encoder VJP.
The resulting encoder-leaf errors isolate what the cotangent difference
alone explains.  Amplification = leaf err / cotangent err.

Run:  timeout 2400 python tools/hw_diag_bf16_t512.py
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
    from multilingual_text_to_speech_tpu.models import tacotron as tac
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron

    jax.config.update("jax_default_matmul_precision", "float32")

    # exactly the failing case: forward attention, prenet=2, T=512, bf16
    # (case index 6 of hw_validate_train_forward_family, seed 100+6)
    batch, frames, text_len = 20, 128, 512
    hp = _flagship_hp()
    hp.attention_type = "forward"
    hp.prenet_layers = 2
    hp.dropout = 0.0
    hp.zoneout_hidden = 0.0
    hp.zoneout_cell = 0.0
    hp.dropout_hidden = 0.0

    rng_np = np.random.RandomState(106)
    text = jnp.asarray(rng_np.randint(
        3, hp.total_symbols(), (batch, text_len)), jnp.int32)
    lengths = jnp.full((batch,), text_len, jnp.int32)
    target = jnp.asarray(
        rng_np.randn(batch, frames, hp.num_mels) * 0.1, jnp.float32)
    tlen = jnp.full((batch,), frames, jnp.int32)
    speakers = jnp.asarray(
        rng_np.randint(0, hp.speaker_number, batch), jnp.int32)
    languages = jnp.asarray(np.arange(batch) % len(hp.languages), jnp.int32)
    key = jax.random.PRNGKey(0)

    langs_w = tac._languages_to_weights(
        languages, batch, text_len, hp.language_number)
    lang_idx = jnp.argmax(langs_w, axis=2)
    target_mask = tac.lengths_to_mask(tlen, frames)

    def enc_method(mdl, text, lengths, languages):
        encoded, _ = mdl._encode(text, lengths, languages,
                                 mix_languages=False)
        return encoded

    def dec_method(mdl, encoded, lengths, target, tlen, speakers,
                   lang_idx, rng):
        pre, stop, alignment = mdl.decoder(
            encoded, lengths, target, 1.0, speakers, lang_idx, rng)
        stop = jnp.where(target_mask, stop, 1000.0)
        pre = pre * target_mask[..., None]
        return (jnp.mean((pre - target) ** 2)
                + 0.1 * jnp.mean(stop ** 2)
                + 0.05 * jnp.mean(alignment ** 2))

    def run(case_dtype, mode):
        """(loss, d_encoded [B,T,E] f32, decoder-side param grads)."""
        os.environ["MTTS_PALLAS_TRAIN_DECODER"] = mode
        model = Tacotron(hp, train=True, dtype=case_dtype)
        variables = jax.jit(model.init)(
            key, text, lengths, target, tlen, speakers, languages, 1.0, key)
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def enc_fn(p):
            out, _ = model.apply(
                {"params": p, **rest}, text, lengths, languages,
                method=enc_method, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(key, 1)})
            return out

        def dec_loss(p, encoded):
            out, _ = model.apply(
                {"params": p, **rest}, encoded, lengths, target, tlen,
                speakers, lang_idx, key,
                method=dec_method, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(key, 1)})
            return out

        encoded = jax.jit(enc_fn)(params)
        loss, (dparams, dmem) = jax.jit(jax.value_and_grad(
            dec_loss, argnums=(0, 1)))(params, encoded)
        jax.block_until_ready((dparams, dmem))
        return (float(loss), np.asarray(dmem, np.float64), dparams,
                params, rest, model)

    f32, bf16 = jnp.float32, jnp.bfloat16
    lt, dmem_t, dpar_t, params_t, rest_t, model_t = run(f32, "off")
    print(f"xla f32 (truth): dec-split loss={lt:.6f}", flush=True)
    lx, dmem_x, dpar_x, *_ = run(bf16, "off")
    print(f"xla bf16: loss={lx:.6f}", flush=True)
    lf, dmem_f, dpar_f, *_ = run(bf16, "")
    print(f"fused bf16: loss={lf:.6f}", flush=True)

    # ---- (1) the cotangent at the custom-VJP boundary -------------------
    den = np.abs(dmem_t).max() + 1e-12
    e_x = np.abs(dmem_x - dmem_t).max() / den
    e_f = np.abs(dmem_f - dmem_t).max() / den
    e_x_med = np.median(np.abs(dmem_x - dmem_t)) / den
    e_f_med = np.median(np.abs(dmem_f - dmem_t)) / den
    print(f"\nd_encoded cotangent err-to-truth (rel to max|truth|):")
    print(f"  xla-bf16  max {e_x:.3e}  med {e_x_med:.3e}")
    print(f"  fused     max {e_f:.3e}  med {e_f_med:.3e}  "
          f"(ratio {e_f / max(e_x, 1e-300):.2f})", flush=True)

    # ---- (2) decoder-side param grads (the kernel's direct outputs) -----
    print(f"\ndecoder-side param grads err-to-truth, worst leaves:")
    rows = []
    for (pth, t), (_, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(dpar_t),
            jax.tree_util.tree_leaves_with_path(dpar_f),
            jax.tree_util.tree_leaves_with_path(dpar_x)):
        t = np.asarray(t, np.float64)
        d = np.abs(t).max() + 1e-12
        if np.abs(t).max() == 0:      # untouched leaves (classifier etc.)
            continue
        ef = np.abs(np.asarray(a, np.float64) - t).max() / d
        ex = np.abs(np.asarray(b, np.float64) - t).max() / d
        k = jax.tree_util.keystr(pth)
        if "encoder" in k or "embedding" in k:
            continue                   # those flow via the cotangent
        rows.append((ef, ex, k))
    rows.sort(reverse=True)
    for ef, ex, k in rows[:8]:
        print(f"  fused {ef:9.3e}  xla-bf16 {ex:9.3e}  {k}", flush=True)
    worst_ratio = max((ef + 1e-9) / (ex + 1e-9) for ef, ex, _ in rows)
    print(f"  worst fused/xla ratio over {len(rows)} decoder-side leaves: "
          f"{worst_ratio:.2f}", flush=True)

    # ---- (3) push each cotangent through the SAME exact f32 encoder VJP -
    def enc_fn_truth(p):
        out, _ = model_t.apply(
            {"params": p, **rest_t}, text, lengths, languages,
            method=enc_method, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(key, 1)})
        return out

    @jax.jit
    def enc_grads(cot):
        _, vjp = jax.vjp(enc_fn_truth, params_t)
        return vjp(cot.astype(jnp.float32))[0]

    g_true = enc_grads(jnp.asarray(dmem_t))
    g_from_x = enc_grads(jnp.asarray(dmem_x))
    g_from_f = enc_grads(jnp.asarray(dmem_f))
    jax.block_until_ready((g_true, g_from_x, g_from_f))

    print(f"\nencoder-leaf errs when ONLY the cotangent differs "
          f"(exact f32 encoder VJP):")
    amp_rows = []
    for (pth, t), (_, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_true),
            jax.tree_util.tree_leaves_with_path(g_from_f),
            jax.tree_util.tree_leaves_with_path(g_from_x)):
        k = jax.tree_util.keystr(pth)
        if "encoder" not in k and "embedding" not in k:
            continue
        t = np.asarray(t, np.float64)
        d = np.abs(t).max() + 1e-12
        ef = np.abs(np.asarray(a, np.float64) - t).max() / d
        ex = np.abs(np.asarray(b, np.float64) - t).max() / d
        amp_rows.append((ef, ex, k))
    amp_rows.sort(reverse=True)
    for ef, ex, k in amp_rows[:8]:
        print(f"  from-fused-cot {ef:9.3e}  from-xla-cot {ex:9.3e}  "
              f"amp(fused) {ef / max(e_f, 1e-300):7.1f}x  {k}", flush=True)
    med_amp_f = float(np.median(
        [ef / max(e_f, 1e-300) for ef, _, _ in amp_rows]))
    med_amp_x = float(np.median(
        [ex / max(e_x, 1e-300) for _, ex, _ in amp_rows]))
    print(f"  median amplification: fused-cot {med_amp_f:.1f}x  "
          f"xla-cot {med_amp_x:.1f}x", flush=True)
    print("\nDIAG T512 DONE", flush=True)


if __name__ == "__main__":
    sys.exit(main())
