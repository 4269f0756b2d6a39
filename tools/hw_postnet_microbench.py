"""Microbenchmark of the flagship postnet's fwd+bwd on the TPU.

tools/hw_results/train_stages_2026-08-19.log attributes 11.4 ms of the
60.1 ms flagship train step to the postnet (19%), vs ~3.4 ms at the bf16
MXU roofline for its ~670 GFLOP of convs.  The encoder had the same
disease in round 3 (XLA:TPU conv layouts inside the big graph) and was
fixed with per-tap einsum matmuls.  This probe measures, at the exact
train shapes [B=50, F=512, M=80 -> 512 x4 -> 80], value+grad device ms:

  xla_conv   : lax.conv channels-last (what models/postnet.py does today)
  tap_matmul : same math as K shifted [B*F, Cin] @ [Cin, Cout] einsums
  each +/- batch-norm and dropout to attribute the remainder.

Run:  timeout 2400 python tools/hw_postnet_microbench.py
"""
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


from tools.trace_util import device_ms  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    print("probe:", float(jax.jit(lambda x: x + 1)(jnp.float32(1))),
          flush=True)
    assert jax.devices()[0].platform == "tpu", jax.devices()

    B, F, M, D, K = 50, 512, 80, 512, 5
    dims = [(M, D), (D, D), (D, D), (D, D), (D, M)]
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(B, F, M) * 0.1, jnp.bfloat16)
    params = {}
    for i, (ci, co) in enumerate(dims):
        params[f"w{i}"] = jnp.asarray(
            rng.randn(K, ci, co) * (1.0 / np.sqrt(ci * K)), jnp.float32)
        params[f"scale{i}"] = jnp.ones((co,), jnp.float32)
        params[f"bias{i}"] = jnp.zeros((co,), jnp.float32)
    key = jax.random.PRNGKey(0)

    def bn(h, scale, bias):
        h = h.astype(jnp.float32)
        mean = jnp.mean(h, axis=(0, 1))
        var = jnp.var(h, axis=(0, 1))
        return (h - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias

    def conv_xla(h, w):
        return jax.lax.conv_general_dilated(
            h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            window_strides=(1,), padding=[(K // 2, K // 2)],
            dimension_numbers=("NHC", "HIO", "NHC"))

    def conv_tap(h, w):
        h = h.astype(jnp.bfloat16)
        pad = K // 2
        hp_ = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
        out = None
        for k in range(K):
            y = jnp.einsum("bfi,io->bfo", hp_[:, k:k + F, :],
                           w[k].astype(jnp.bfloat16))
            out = y if out is None else out + y
        return out

    def net(p, x, conv, use_bn, use_dropout, rng):
        h = x
        for i in range(5):
            h = conv(h, p[f"w{i}"])
            if use_bn:
                h = bn(h, p[f"scale{i}"], p[f"bias{i}"])
            h = jnp.tanh(h) if i < 4 else h
            if use_dropout:
                keep = jax.random.bernoulli(
                    jax.random.fold_in(rng, i), 0.5, h.shape)
                h = jnp.where(keep, h / 0.5, 0.0)
            h = h.astype(jnp.bfloat16)
        return jnp.mean((h.astype(jnp.float32) + x.astype(jnp.float32)) ** 2)

    results = {}
    for name, conv in (("xla_conv", conv_xla), ("tap_matmul", conv_tap)):
        for use_bn, use_do in ((True, True), (True, False), (False, False)):
            tag = f"{name}{'+bn' if use_bn else ''}{'+do' if use_do else ''}"
            f = jax.jit(jax.value_and_grad(functools.partial(
                net, conv=conv, use_bn=use_bn, use_dropout=use_do)),
                static_argnums=())
            loss, g = f(params, x0, rng=key)
            jax.block_until_ready(g)
            ms = device_ms(lambda f=f: jax.block_until_ready(
                f(params, x0, rng=key)))
            results[tag] = ms
            print(f"{tag:24s} {ms:7.2f} ms  (loss {float(loss):.5f})",
                  flush=True)

    # dropout PRNG impl: threefry (above) vs the TPU-native RngBitGenerator
    # behind jax's 'rbg'/'unsafe_rbg' key impls.  Mask quality is fine for
    # dropout; the question is device time.
    for impl in ("rbg", "unsafe_rbg"):
        k2 = jax.random.key(0, impl=impl)
        tag = f"xla_conv+bn+do[{impl}]"
        f = jax.jit(jax.value_and_grad(functools.partial(
            net, conv=conv_xla, use_bn=True, use_dropout=True)))
        loss, g = f(params, x0, rng=k2)
        jax.block_until_ready(g)
        ms = device_ms(lambda f=f, k2=k2: jax.block_until_ready(
            f(params, x0, rng=k2)))
        results[tag] = ms
        print(f"{tag:24s} {ms:7.2f} ms  (loss {float(loss):.5f})",
              flush=True)

    # parity of the two conv formulations (value + a weight grad)
    f_a = jax.jit(jax.value_and_grad(functools.partial(
        net, conv=conv_xla, use_bn=True, use_dropout=False)))
    f_b = jax.jit(jax.value_and_grad(functools.partial(
        net, conv=conv_tap, use_bn=True, use_dropout=False)))
    la, ga = f_a(params, x0, rng=key)
    lb, gb = f_b(params, x0, rng=key)
    rel = abs(float(la) - float(lb)) / max(abs(float(la)), 1e-9)
    gra = np.asarray(ga["w2"], np.float64)
    grb = np.asarray(gb["w2"], np.float64)
    grel = np.abs(gra - grb).max() / (np.abs(gra).max() + 1e-12)
    print(f"parity xla_conv vs tap_matmul: loss rel {rel:.2e}, "
          f"w2-grad rel {grel:.2e}", flush=True)
    print(json.dumps(results))
    print("POSTNET MICROBENCH DONE", flush=True)


if __name__ == "__main__":
    sys.exit(main())
