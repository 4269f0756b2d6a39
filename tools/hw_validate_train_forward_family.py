"""Hardware validation for the round-3 TRAIN-kernel generalizations
(ops/pallas_train_decoder.py): forward-attention family and prenet
depths != 2.

One process, one TPU session (the tunnel wedges between processes):
  1. trivial-op probe (fails fast if the tunnel is down),
  2. Mosaic compile of the fwd+bwd train kernels per case,
  3. loss + gradient parity vs the XLA scan on-device
     (forced-f32 matmul precision, relative error),
  4. profiled device ms/step fused vs XLA scan.

Run:  timeout 1800 python tools/hw_validate_train_forward_family.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


from tools.trace_util import device_us  # noqa: E402


def main():
    # --cpu-smoke: flow check off-device (tiny dims, interpret-mode
    # kernels, no timing assertions) so the script itself is validated
    # before a tunnel session is spent on it
    cpu_smoke = "--cpu-smoke" in sys.argv
    if cpu_smoke:
        import jax
        jax.config.update("jax_platforms", "cpu")
        os.environ["MTTS_PALLAS_TRAIN_DECODER_SMOKE"] = "1"
    import jax
    import jax.numpy as jnp

    print("probe:", float(jax.jit(lambda x: x + 1)(jnp.float32(1))),
          flush=True)
    if not cpu_smoke:
        assert jax.devices()[0].platform == "tpu", jax.devices()

    from __graft_entry__ import _flagship_hp
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron
    from multilingual_text_to_speech_tpu.ops import pallas_train_decoder

    jax.config.update("jax_default_matmul_precision", "float32")

    # (attention, prenet depth, text_len, dtype, loss_tol, grad_tol,
    # expect_fallback); deterministic regularization so the XLA scan and
    # the kernel draw no PRNG (stochastic parity is covered by the
    # interpret-mode replica tests).  T=192 exercises the T-blocked train
    # fold (3 x 64 blocks) at flagship dims: in bf16 (the production
    # training dtype) it must Mosaic-compile and match the XLA scan; in
    # f32 the blocked fold's per-block Mosaic spill slots bust the 128M
    # chip (144.6M measured 2026-08-18 at S=4) so the byte model MUST
    # route it to the XLA scan — expect_fallback asserts that routing
    # instead of compiling the kernel.
    f32, bf16 = jnp.float32, jnp.bfloat16
    cases = [
        ("forward", 2, 128, f32, 1e-4, 1e-3, False),
        ("forward_transition_agent", 2, 128, f32, 1e-4, 1e-3, False),
        ("location_sensitive", 3, 128, f32, 1e-4, 1e-3, False),
        ("location_sensitive", 1, 128, f32, 1e-4, 1e-3, False),
        ("location_sensitive", 2, 192, bf16, 5e-3, 5e-2, False),
        ("location_sensitive", 2, 192, f32, 1e-4, 1e-3, True),
        # forward-family long-text ceiling: the family keeps the SINGLE
        # fold at every T (its operands are linear in T — no [A*T] band),
        # and the calibrated byte model says flagship bf16 fits at T=512
        # even at batch 50; this cell is the hardware proof that the
        # single fold Mosaic-compiles at the 512-symbol serving bound
        # (round-3 verdict item #7: "train-side T-blocked fold for the
        # forward family, or prove it unnecessary").
        ("forward", 2, 512, bf16, 5e-3, 5e-2, False),
        # f32 at the same length decides bug-vs-scatter for the bf16
        # cell above: same kernel, same 512-symbol recurrence, but exact
        # leafwise grad comparison applies (batch 15 = the largest
        # 5-language-divisible batch the byte model fits in f32).
        ("forward", 2, 512, f32, 1e-4, 1e-3, False, 15),
    ]
    rng_np = np.random.RandomState(0)
    # batch must divide by the 5 languages (generated encoder grouping)
    batch_default, frames = 20, 128
    if cpu_smoke:
        batch_default, frames = 5, 16
        cases = [(a, n, 24, f32, 1e-4, 1e-3, False) for a, n, *_ in cases[:2]]
    # --cases 4,5 reruns a subset (indices into the list above) without
    # paying the Mosaic compiles of already-validated cases
    only = None
    if "--cases" in sys.argv:
        only = {int(i) for i in
                sys.argv[sys.argv.index("--cases") + 1].split(",")}
    for case_i, case in enumerate(cases):
        (att_type, n_prenet, text_len, case_dtype, loss_tol,
         grad_tol, expect_fallback) = case[:7]
        batch = case[7] if len(case) > 7 else batch_default
        if only is not None and case_i not in only:
            continue
        hp = _flagship_hp(tiny=cpu_smoke)
        hp.attention_type = att_type
        hp.prenet_layers = n_prenet
        hp.dropout = 0.0
        hp.zoneout_hidden = 0.0
        hp.zoneout_cell = 0.0
        hp.dropout_hidden = 0.0
        assert pallas_train_decoder.supports(hp)
        # per-case seed so --cases subsets see the same data as full runs
        rng_np = np.random.RandomState(100 + case_i)

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

        fused_mode = "interpret" if cpu_smoke else ""

        def run(mode, dtype):
            """loss+grads+device us for one (decoder path, compute dtype).

            Builds its own model/params: initializer draws are dtype-
            independent (param dtype stays f32), so every run starts from
            identical weights."""
            os.environ["MTTS_PALLAS_TRAIN_DECODER"] = mode
            model = Tacotron(hp, train=True, dtype=dtype)
            variables = jax.jit(model.init)(
                key, text, lengths, target, tlen, speakers, languages,
                1.0, key)
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

            # count factory invocations at trace time to prove the fused
            # path engaged (a silent XLA fallback would make the parity
            # check vacuous)
            calls = {"n": 0}
            orig = pallas_train_decoder.make_train_decode_fn
            if mode == fused_mode:
                def counted(*a, _orig=orig, **k):
                    calls["n"] += 1
                    return _orig(*a, **k)
                pallas_train_decoder.make_train_decode_fn = counted
            try:
                step = jax.jit(jax.value_and_grad(loss_fn))
                loss, grads = step(params)        # Mosaic compile here
                loss = float(loss)
                jax.block_until_ready(grads)
            finally:
                pallas_train_decoder.make_train_decode_fn = orig
            if mode == fused_mode:
                if expect_fallback:
                    # the VMEM byte model must route this shape to the
                    # XLA scan instead of letting Mosaic OOM at compile
                    assert calls["n"] == 0, (
                        "byte model let a known-OOM shape through")
                else:
                    assert calls["n"] >= 1, (
                        "fused train decoder did not engage")
            us = 0.0
            if not cpu_smoke:
                us = device_us(
                    lambda s=step: jax.block_until_ready(s(params)))
            return loss, grads, us

        lf, gf, uf = run(fused_mode, case_dtype)
        lx, gx, ux = run("off", case_dtype)
        assert np.isfinite(lf), lf
        name = jnp.dtype(case_dtype).name
        if expect_fallback:
            print(f"{att_type} prenet={n_prenet} T={text_len} {name}: "
                  f"correctly routed to the XLA scan (no-fit), "
                  f"loss={lf:.6f} ({uf / 1e3:.1f} ms/step)", flush=True)
            continue
        assert abs(lf - lx) / max(abs(lx), 1e-9) < loss_tol, (lf, lx)
        print(f"{att_type} prenet={n_prenet} T={text_len} {name}: "
              f"loss fused={lf:.6f} xla={lx:.6f}", flush=True)
        print(f"  fused {uf / 1e3:.1f} ms/step vs XLA {ux / 1e3:.1f} "
              f"({ux / max(uf, 1):.2f}x)", flush=True)
        if case_dtype == f32:
            # same dtype, same math: direct leafwise comparison
            worst, worst_k = 0.0, None
            for (pth, a), (_, b) in zip(
                    jax.tree_util.tree_leaves_with_path(gf),
                    jax.tree_util.tree_leaves_with_path(gx)):
                a, b = np.asarray(a), np.asarray(b)
                rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-8)
                if rel > worst:
                    worst, worst_k = rel, jax.tree_util.keystr(pth)
            print(f"  grad worst-rel={worst:.2e} ({worst_k})", flush=True)
            assert worst < grad_tol, (worst, worst_k)
        else:
            # bf16: the XLA scan is NOT ground truth — both paths carry
            # bf16 scatter from different (equally valid) accumulation
            # orders. Judge each bf16 path by its distance to an f32 XLA
            # truth run, and gate PER-LEAF only on the leaves the kernel
            # computes directly (decoder/attention/prenet params).
            #
            # Encoder-side leaves (encoder, embedding) receive their
            # grads through the d_encoded cotangent via an XLA encoder
            # backward that is IDENTICAL in both paths. The boundary
            # decomposition in tools/hw_diag_bf16_t512.py (log:
            # hw_results/diag_bf16_t512_2026-08-19.log) shows the fused
            # cotangent sits CLOSER to f32 truth than the XLA-bf16
            # scan's (max 2.07e-2 vs 3.33e-2, ratio 0.62), yet pushing
            # each cotangent through the SAME exact f32 encoder VJP
            # scatters per-leaf errors to 4-9e-2 in path-dependent
            # leaves (bias/bottleneck grads sum ~B*T near-cancelling
            # terms, so max|truth| denominators are small). A per-leaf
            # ratio there measures where the rounding landed, not kernel
            # quality — so encoder-side leaves are gated in AGGREGATE
            # (median err-to-truth) and reported informationally.
            _, gt, _ = run("off", f32)
            errs_f, errs_x, enc_f, enc_x = [], [], [], []
            for (pth, t), (_, a), (_, b) in zip(
                    jax.tree_util.tree_leaves_with_path(gt),
                    jax.tree_util.tree_leaves_with_path(gf),
                    jax.tree_util.tree_leaves_with_path(gx)):
                t = np.asarray(t, np.float64)
                den = np.abs(t).max() + 1e-12
                e_f = np.abs(np.asarray(a, np.float64) - t).max() / den
                e_x = np.abs(np.asarray(b, np.float64) - t).max() / den
                k = jax.tree_util.keystr(pth)
                if "encoder" in k or "embedding" in k:
                    enc_f.append(e_f)
                    enc_x.append(e_x)
                    continue
                errs_f.append(e_f)
                errs_x.append(e_x)
                assert e_f <= 2.0 * e_x + 5e-3, (k, e_f, e_x)
            assert np.median(enc_f) <= 2.0 * np.median(enc_x) + 1e-3, (
                "encoder aggregate", np.median(enc_f), np.median(enc_x))
            print(f"  err-to-f32-truth, kernel-direct leaves: fused med "
                  f"{np.median(errs_f):.2e} max {max(errs_f):.2e}  |  "
                  f"xla-bf16 med {np.median(errs_x):.2e} max "
                  f"{max(errs_x):.2e}", flush=True)
            print(f"  err-to-f32-truth, encoder-side leaves (via shared "
                  f"XLA encoder bwd): fused med {np.median(enc_f):.2e} "
                  f"max {max(enc_f):.2e}  |  xla-bf16 med "
                  f"{np.median(enc_x):.2e} max {max(enc_x):.2e}",
                  flush=True)

    print("TRAIN FORWARD-FAMILY HW VALIDATION OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())
