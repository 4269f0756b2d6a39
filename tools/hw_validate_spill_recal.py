"""Hardware validation of the recalibrated serving VMEM spill charge.

The 2026-08-19 f32 spill probe (spill_probe_f32_2026-08-19.log) showed the
esize-scaled spill charge plus the 18M budget margin was conservative for
unquantized serving: f32 T=256 fit 30-row blocks on the chip while the
model allowed 16.  `_auto_block_cap` now charges the measured per-mode
spill (esize*at_b + 24K quantized, + 72K more unquantized) against a 121M
budget.  Four block picks changed, all larger (the two unquantized picks
at chunk 128, and — a round-5 review finding — two int8 picks at the
chunk-256 throughput-serving setting):

  0. bf16 unquant T=512 c128 B=240: 48 -> 60 rows;
  1. f32  unquant T=256 c128 B=240: 16 -> 24 rows (probe fits 30);
  2. bf16 int8    T=384 c256 B=240: 80 -> 120 rows;
  3. bf16 int8    T=512 c256 B=240: 60 -> 80 rows.

For each changed pick this script compiles and runs the fused serving
decoder at the new auto pick, checks bit-identical outputs against the
previous pick (dropout off — per-row math is block-partition-invariant),
and reports profiled device us/step for old vs new.  ``--cases=i,j``
selects a subset by index.

One process, one TPU session.  Runs recorded:
  cases 0,1 -> tools/hw_results/unquant_t512_block60_2026-08-19.log
  cases 2,3 -> tools/hw_results/int8_c256_picks_2026-08-19.log
"""
import functools
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
    from multilingual_text_to_speech_tpu.ops import pallas_decoder as pd

    cases = [
        # (name, dtype, int8, text_len, chunk, old_pick)
        ("bf16-unquant T=512 c128", jnp.bfloat16, False, 512, 128, 48),
        ("f32-unquant T=256 c128", jnp.float32, False, 256, 128, 16),
        # the budget raise also grew two int8 picks at the chunk-256
        # throughput-serving setting (review finding, 2026-08-19):
        # T=384 80 -> 120 rows, T=512 60 -> 80 rows
        ("bf16-int8 T=384 c256", jnp.bfloat16, True, 384, 256, 80),
        ("bf16-int8 T=512 c256", jnp.bfloat16, True, 512, 256, 60),
    ]
    sel = None
    for a in sys.argv[1:]:
        if a.startswith("--cases="):
            sel = {int(i) for i in a.split("=", 1)[1].split(",")}
    failures = 0
    for ci, (name, compute_dtype, int8, text_len, chunk,
             old_pick) in enumerate(cases):
        if sel is not None and ci not in sel:
            continue
        hp = _flagship_hp()
        hp.compute_dtype = ("bfloat16" if compute_dtype == jnp.bfloat16
                            else "float32")
        hp.pallas_decoder_int8 = int8
        hp.decode_chunk_frames = chunk
        hp.dropout = 0.0     # block-partition-invariance needs no RNG draws

        n_langs = len(hp.languages)
        batch = 240
        rng = np.random.RandomState(0)
        text = jnp.asarray(rng.randint(3, hp.total_symbols(),
                                       (batch, text_len)), jnp.int32)
        lengths = jnp.full((batch,), text_len, jnp.int32)
        speakers = jnp.asarray(rng.randint(0, hp.speaker_number, batch),
                               jnp.int32)
        languages = jnp.asarray(np.arange(batch) % n_langs, jnp.int32)
        model = Tacotron(hp, train=False, dtype=compute_dtype)
        key = jax.random.PRNGKey(0)
        variables = jax.jit(model.init)(
            key, text, lengths, jnp.zeros((batch, 32, hp.num_mels)),
            jnp.full((batch,), 32, jnp.int32), speakers, languages, 0.0, key)
        memory, mt, mask, carry = jax.jit(functools.partial(
            model.apply, method=Tacotron.encode_for_inference))(
            variables, text, lengths, speakers, languages)

        new_cap = pd._auto_block_cap(
            pd._padded_t(text_len), memory.shape[-1], mt.shape[-1],
            carry["h_att"].shape[-1], hp.num_mels, hp.prenet_dimension,
            chunk, compute_dtype, quantized=int8,
            att_kind=pd.att_kind_of(hp), n_prenet=int(hp.prenet_layers))
        new_pick = pd._largest_block(batch, new_cap)
        print(f"{name}: recalibrated cap={new_cap} pick={new_pick} "
              f"(old pick {old_pick})", flush=True)

        fused = pd.make_decode_fn(hp, variables, compute_dtype)
        k = jax.random.PRNGKey(7)

        def run_at(cap_rows):
            os.environ["MTTS_PALLAS_BLOCK_CAP"] = str(cap_rows)
            try:
                step = jax.jit(lambda c, m, t_, k_, r: fused(c, m, t_, k_, r))
                c2, (spec, stop) = step(carry, memory, mt, mask, k)
                spec = np.asarray(spec)
                us = device_us(lambda: np.asarray(
                    step(carry, memory, mt, mask, k)[1][0])) / chunk
                return spec, us
            finally:
                os.environ.pop("MTTS_PALLAS_BLOCK_CAP", None)

        spec_new, us_new = run_at(new_pick)   # compiles or OOMs right here
        spec_old, us_old = run_at(old_pick)
        assert np.isfinite(spec_new).all(), f"{name}: non-finite output"
        diff = float(np.max(np.abs(spec_new - spec_old)))
        ok = diff == 0.0
        print(f"  old {old_pick}-row blocks: {us_old:.1f} us/step | "
              f"new {new_pick}-row blocks: {us_new:.1f} us/step "
              f"({us_old / us_new:.3f}x) | max|diff|={diff:.3g} "
              f"{'BIT-EXACT' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            failures += 1

    if failures:
        print(f"SPILL RECAL VALIDATION FAILED ({failures})", flush=True)
        return 1
    print("SPILL RECAL VALIDATION OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
