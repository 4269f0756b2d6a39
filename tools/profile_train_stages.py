"""Per-stage device timing of the flagship train step (round-4 verdict #5 /
round-5 #3): split the ~60 ms step into encoder fwd+bwd, fused decoder
fwd+bwd, postnet fwd+bwd, loss, classifier and Adam, by compiling each
stage as its own jitted value_and_grad and summing profiler device time.

Unlike trace-name bucketing (tools/profile_train_step.py), each stage is
measured as a standalone compiled program, so attribution is exact; the
cross-check is that the stages must roughly sum to the full step (XLA
fuses across stage boundaries in the full graph, so the sum is an upper
bound within ~10-20%).

Run:  timeout 2400 python tools/profile_train_stages.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


from tools.trace_util import device_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import optax

    print("probe:", float(jax.jit(lambda x: x + 1)(jnp.float32(1))),
          flush=True)
    assert jax.devices()[0].platform == "tpu", jax.devices()

    from __graft_entry__ import _flagship_hp, _make_batch
    from multilingual_text_to_speech_tpu.models import tacotron as tac
    from multilingual_text_to_speech_tpu.models.tacotron import (
        Tacotron, tacotron_loss)
    from multilingual_text_to_speech_tpu.training.trainer import (
        dropout_stream_key, make_optimizer)

    hp = _flagship_hp()
    model = Tacotron(hp, train=True, dtype=jnp.bfloat16)
    batch, text_len, frames = 50, 128, 512
    (text, text_lengths, target, target_lengths, stop,
     speakers, languages) = _make_batch(hp, batch, text_len, frames)

    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        key, text, text_lengths, target, target_lengths, speakers,
        languages, 1.0, key)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    rest = {"batch_stats": batch_stats}
    tx = make_optimizer(hp)
    opt_state = tx.init(params)

    langs_w = tac._languages_to_weights(
        languages, batch, text_len, hp.language_number)
    lang_idx = jnp.argmax(langs_w, axis=2)
    target_mask = tac.lengths_to_mask(target_lengths, frames)

    def apply_m(method, *args):
        out, _ = model.apply(
            {"params": params, **rest}, *args, method=method,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_stream_key(hp, key)})
        return out

    # ---- full step (the bench.py --train measurement) -------------------
    @jax.jit
    def full_step(params, opt_state, rng):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, **rest}, text, text_lengths, target,
                target_lengths, speakers, languages, 1.0, rng,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_stream_key(hp, rng)})
            total, _ = tacotron_loss(
                out, hp=hp, input_lengths=text_lengths,
                target_lengths=target_lengths, pre_target=target,
                post_target=target, stop_target=stop, speakers=speakers,
                guided_att_variance=0.25)
            return total, mut
        (loss, mut), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return loss, optax.apply_updates(params, updates), new_opt

    loss, p2, o2 = full_step(params, opt_state, key)
    print("warm full-step loss:", float(loss), flush=True)
    t_full = device_ms(lambda: jax.block_until_ready(
        full_step(params, opt_state, jax.random.PRNGKey(1))))

    # ---- stage: encoder fwd+bwd -----------------------------------------
    def enc_method(mdl, text, lengths, languages):
        enc, _ = mdl._encode(text, lengths, languages, mix_languages=False)
        return enc

    @jax.jit
    def enc_stage(params, cot):
        def f(p):
            out, _ = model.apply(
                {"params": p, **rest}, text, text_lengths, languages,
                method=enc_method, mutable=["batch_stats"],
                rngs={"dropout": dropout_stream_key(hp, key)})
            return out
        enc, vjp = jax.vjp(f, params)
        return enc, vjp(cot)[0]

    enc_shape = (batch, text_len, hp.encoder_dimension)
    cot = jnp.ones(enc_shape, jnp.float32)
    enc_out, _ = enc_stage(params, cot)
    t_enc = device_ms(lambda: jax.block_until_ready(enc_stage(params, cot)))

    # ---- stage: decoder fwd+bwd (fused kernel boundary) ------------------
    def dec_method(mdl, encoded, rng):
        pre, stop_l, ali = mdl.decoder(
            encoded, text_lengths, target, 1.0, speakers, lang_idx, rng)
        return pre, stop_l, ali

    @jax.jit
    def dec_stage(params, encoded, rng):
        def f(p, e):
            out, _ = model.apply(
                {"params": p, **rest}, e, rng,
                method=dec_method, mutable=["batch_stats"],
                rngs={"dropout": dropout_stream_key(hp, rng)})
            pre, stop_l, ali = out
            return (jnp.mean(pre ** 2) + jnp.mean(stop_l ** 2)
                    + jnp.mean(ali ** 2))
        return jax.value_and_grad(f, argnums=(0, 1))(params, encoded)

    dec_stage(params, enc_out, key)
    t_dec = device_ms(lambda: jax.block_until_ready(
        dec_stage(params, enc_out, jax.random.PRNGKey(1))))

    # ---- stage: postnet fwd+bwd ------------------------------------------
    pre_fake = jnp.asarray(
        np.random.RandomState(0).randn(batch, frames, hp.num_mels) * 0.1,
        jnp.float32)

    @jax.jit
    def post_stage(params, pre):
        def f(p, x):
            out, _ = model.apply(
                {"params": p, **rest}, x, target_lengths,
                method=Tacotron.apply_postnet, mutable=["batch_stats"],
                rngs={"dropout": dropout_stream_key(hp, key)})
            return jnp.mean(out ** 2)
        return jax.value_and_grad(f, argnums=(0, 1))(params, pre)

    post_stage(params, pre_fake)
    t_post = device_ms(lambda: jax.block_until_ready(
        post_stage(params, pre_fake)))

    # ---- stage: classifier fwd+bwd ---------------------------------------
    t_cls = 0.0
    if hp.reversal_classifier:
        @jax.jit
        def cls_stage(params, enc):
            def f(p, e):
                out, _ = model.apply(
                    {"params": p, **rest}, e,
                    method=lambda m, x: m.classifier(x),
                    mutable=["batch_stats"],
                    rngs={"dropout": dropout_stream_key(hp, key)})
                return jnp.mean(out ** 2)
            return jax.value_and_grad(f, argnums=(0, 1))(params, enc)

        cls_stage(params, enc_out)
        t_cls = device_ms(lambda: jax.block_until_ready(
            cls_stage(params, enc_out)))

    # ---- stage: composite loss fwd+bwd (on fake outputs) ------------------
    ali_fake = jnp.ones((batch, frames, text_len), jnp.float32) / text_len
    stop_fake = jnp.zeros((batch, frames), jnp.float32)
    out_fake = {
        "pre_prediction": pre_fake, "post_prediction": pre_fake,
        "stop_token": stop_fake, "alignment": ali_fake,
        "speaker_prediction": (
            jnp.zeros((batch, text_len, hp.speaker_number), jnp.float32)
            if hp.reversal_classifier else None),
        "encoder_output": enc_out,
    }

    @jax.jit
    def loss_stage(out):
        def f(o):
            total, _ = tacotron_loss(
                o, hp=hp, input_lengths=text_lengths,
                target_lengths=target_lengths, pre_target=target,
                post_target=target, stop_target=stop, speakers=speakers,
                guided_att_variance=0.25)
            return total
        return jax.value_and_grad(f)(out)

    loss_stage(out_fake)
    t_loss = device_ms(lambda: jax.block_until_ready(loss_stage(out_fake)))

    # ---- stage: optimizer (clip + Adam + apply) ---------------------------
    grads_like = jax.tree_util.tree_map(jnp.ones_like, params)

    @jax.jit
    def opt_stage(grads, opt_state, params):
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    opt_stage(grads_like, opt_state, params)
    t_opt = device_ms(lambda: jax.block_until_ready(
        opt_stage(grads_like, opt_state, params)))

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    print(f"\nflagship train step, batch={batch} T={text_len} F={frames} "
          f"bf16, {n_params / 1e6:.1f}M params")
    print(f"{'full step':24s} {t_full:8.1f} ms")
    rows = [("encoder fwd+bwd", t_enc), ("decoder fwd+bwd (fused)", t_dec),
            ("postnet fwd+bwd", t_post), ("classifier fwd+bwd", t_cls),
            ("composite loss f+b", t_loss), ("clip+Adam+apply", t_opt)]
    for name, t in rows:
        print(f"{name:24s} {t:8.1f} ms  ({100 * t / max(t_full, 1e-9):.0f}%"
              f" of full)")
    print(f"{'stage sum':24s} {sum(t for _, t in rows):8.1f} ms")
    print("STAGE PROFILE DONE", flush=True)


if __name__ == "__main__":
    sys.exit(main())
