"""Flagship-dims trained-quality study: bf16 + fused Pallas train kernels
on real TPU hardware vs the f32 torch reference on CPU.

The round-3 study (demos/quality_parity_study.py) proved trained-quality
parity at TINY dims in f32 on CPU.  This study closes the remaining gap:
does training at the REAL flagship dims (embedding 512, generated encoder
256, prenet 256, attention 128, decoder 1024, postnet 512, 80 mels) in
bfloat16 THROUGH THE FUSED custom-VJP train decoder on the TPU converge
to the same quality as the torch reference in float32?

Protocol (same as the tiny study, scaled up):
  1. one synthetic copy-task dataset (40 symbols x 3 frames, 80 mels,
     texts up to 64 symbols / 192 frames) shared verbatim by both sides;
  2. torch reference (live /root/reference modules) and this framework
     start from IDENTICAL weights (torch init ported via
     interop.port_state_dict), train on identical batch order;
  3. torch trains on CPU in f32 as far as a wall-clock budget allows
     (flagship torch CPU steps are slow); JAX trains on the TPU in bf16
     through ops/pallas_train_decoder.py for the full run, snapshotting
     its parameters at torch's last step for a matched-step comparison;
  4. compare teacher-forced loss curves on the overlap, teacher-forced
     alignment diagonality, and free-running DTW-MCD against ground
     truth on held-out texts — JAX at the matched step AND at the full
     run, plus an int8-serving variant of the final model (the
     bench/serving configuration).

Usage (needs the TPU tunnel):
    timeout 7200 python demos/flagship_quality_study.py \
        [--steps 2000] [--torch_steps 200] [--torch_seconds 2700] \
        [--json out.json]

Reference interfaces driven: modules/tacotron2.py:355-410,
modules/attention.py:49-117 (location-sensitive), train.py:260-271.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

# repo-root bootstrap for direct execution (python demos/<name>.py);
# the imports themselves are package imports
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from demos import quality_parity_study as qps
from demos.learnability_check import alignment_diagonality

# scaled copy task: flagship acoustic dims, realistic utterance lengths
N_SYMBOLS = 40
FRAMES_PER_SYMBOL = 3
NUM_MELS = 80
BATCH = 16
T_PAD = 64
F_PAD = T_PAD * FRAMES_PER_SYMBOL


def build_hp():
    """Flagship dims on the tiny study's single-language topology.

    Dims match params/generated_switching.json (the headline model):
    what changes vs the tiny study is ONLY scale + compute_dtype +
    the fused kernels — the axes round 3 left unproven."""
    hp = qps.build_hp(attention_type="location_sensitive")
    hp.characters = ("abcdefghijklmnopqrstuvwxyz"
                     "ABCDEFGHIJKLMNOPQRSTUVWXYZ")  # >= N_SYMBOLS ids
    hp.num_mels = NUM_MELS
    hp.embedding_dimension = 512
    hp.encoder_dimension = 256
    hp.generator_dim = 10
    hp.generator_bottleneck_dim = 4
    hp.prenet_dimension = 256
    hp.attention_dimension = 128
    hp.attention_kernel_size = 31
    hp.attention_location_dimension = 32
    hp.decoder_dimension = 1024
    hp.postnet_dimension = 512
    hp.postnet_blocks = 5
    hp.batch_size = BATCH
    hp.max_output_length = F_PAD + 20
    # the axes under test: bf16 compute + both fused kernel families
    hp.compute_dtype = "bfloat16"
    hp.use_pallas_train_decoder = True
    hp.use_pallas_decoder = True
    # int8 LSTM gates are default-on for serving (config.py); pin the
    # study's base model to the EXACT bf16 path so the jax_final vs
    # jax_final_int8 rows measure the quantization delta, not 0
    hp.pallas_decoder_int8 = False
    return hp


def train_jax_flagship(hp, batches, steps, log_every, torch_init_state,
                       snapshot_step, seed=7, dtype=None,
                       require_fused=True):
    """JAX training at flagship dims: bf16 compute, fused train decoder.

    Mirrors qps.train_jax but (a) builds the model with dtype=bfloat16,
    (b) asserts the fused Pallas train path is actually engaged, and
    (c) snapshots parameters at ``snapshot_step`` for the matched-step
    comparison against torch's wall-clock-bounded run.

    ``dtype``/``require_fused`` exist for the seed-variance addendum's
    f32 control (demos/flagship_seed_variance.py): dtype=float32 with
    require_fused=False isolates the bf16-compute effect from the
    cross-framework RNG-stream difference."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax.core import unfreeze

    from multilingual_text_to_speech_tpu.interop import (
        merge_into,
        port_state_dict,
    )
    from multilingual_text_to_speech_tpu.models.tacotron import (
        Tacotron,
        tacotron_loss,
    )
    from multilingual_text_to_speech_tpu.ops import pallas_train_decoder

    dtype = jnp.bfloat16 if dtype is None else dtype
    assert jax.devices()[0].platform == "tpu", (
        "flagship study must run on the TPU: " + repr(jax.devices()))
    mem_dim = hp.encoder_dimension
    if require_fused:
        assert pallas_train_decoder.supports(hp) and \
            pallas_train_decoder.fits_vmem(
                hp, BATCH, T_PAD, mem_dim, hp.attention_dimension,
                dtype=dtype, train=True), \
            "fused train decoder must engage at study dims"

    model = Tacotron(hp, train=True, dtype=dtype)
    text, tlen, target, flen, stop = batches[0]
    key = jax.random.PRNGKey(seed)
    args0 = (jnp.asarray(text, jnp.int32), jnp.asarray(tlen, jnp.int32),
             jnp.asarray(target), jnp.asarray(flen, jnp.int32),
             None, None, 1.0, key)
    variables = jax.tree_util.tree_map(
        np.asarray, unfreeze(jax.jit(model.init)(key, *args0)))
    ported = port_state_dict(torch_init_state, hp)
    variables["params"] = merge_into(variables["params"],
                                     ported["params"], strict=True)
    variables["batch_stats"] = merge_into(
        variables["batch_stats"], ported["batch_stats"], strict=True)

    tx = optax.chain(
        optax.clip_by_global_norm(hp.gradient_clipping),
        optax.scale_by_adam(),
        optax.scale(-hp.learning_rate),
    )
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, batch_stats, opt_state, batch, rng):
        text, tlen, target, flen, stop = batch

        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                text, tlen, target, flen, None, None, 1.0, rng,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(rng, 1)})
            total, parts = tacotron_loss(
                out, hp=hp, input_lengths=tlen, target_lengths=flen,
                pre_target=target, post_target=target, stop_target=stop,
                speakers=None,
                guided_att_variance=hp.guided_attention_toleration)
            return total, (parts, mut["batch_stats"])

        (total, (parts, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), new_bs, new_opt,
                total, parts["mel_pre"] + parts["mel_pos"])

    curve, snap = [], None
    t0 = time.time()
    for s in range(steps):
        if s == snapshot_step:
            snap = jax.tree_util.tree_map(
                np.asarray, {"params": params, "batch_stats": batch_stats})
        text, tlen, target, flen, stop = batches[s % len(batches)]
        batch = (jnp.asarray(text, jnp.int32), jnp.asarray(tlen, jnp.int32),
                 jnp.asarray(target), jnp.asarray(flen, jnp.int32),
                 jnp.asarray(stop))
        params, batch_stats, opt_state, total, mel = step_fn(
            params, batch_stats, opt_state, batch,
            jax.random.fold_in(jax.random.PRNGKey(seed + 1), s))
        if s % log_every == 0 or s == steps - 1:
            curve.append((s, float(total), float(mel)))
            if s % (log_every * 10) == 0:
                print(f"  jax step {s}: loss {float(total):.4f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
    print(f"  jax:   {steps} steps in {time.time() - t0:.0f}s")
    final = jax.tree_util.tree_map(
        np.asarray, {"params": params, "batch_stats": batch_stats})
    if snap is None:
        snap = final
    return final, snap, curve


def jax_teacher_forced_diagonality(hp, variables, batch):
    """Mean alignment diagonality over a teacher-forced eval batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron

    model = Tacotron(hp, train=False, dtype=jnp.bfloat16)
    text, tlen, target, flen, stop = batch
    out = jax.jit(model.apply)(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(text, jnp.int32), jnp.asarray(tlen, jnp.int32),
        jnp.asarray(target), jnp.asarray(flen, jnp.int32), None, None,
        1.0, jax.random.PRNGKey(0))
    align = np.asarray(out["alignment"], np.float32)  # [B, F, T]
    return float(np.mean([
        alignment_diagonality(align[i], int(tlen[i]), int(flen[i]))
        for i in range(align.shape[0])]))


def torch_teacher_forced_diagonality(model, batch):
    import numpy as np
    import torch

    text, tlen, target, flen, stop = batch
    model.eval()
    with torch.no_grad():
        _post, _pre, _stop, align, _spk, _enc = model(
            torch.tensor(text), torch.tensor(tlen),
            torch.tensor(target).transpose(1, 2), torch.tensor(flen),
            None, None, teacher_forcing_ratio=1.0)
    model.train()
    a = np.asarray(align, np.float32)  # [B, F, T]
    return float(np.mean([
        alignment_diagonality(a[i], int(tlen[i]), int(flen[i]))
        for i in range(a.shape[0])]))


def mcd_of(hp, gt, spec):
    from multilingual_text_to_speech_tpu.ops.audio import (
        mel_cepstral_distortion,
    )

    class _McdHp:
        num_mfcc = 13

    return float(mel_cepstral_distortion(gt, spec, _McdHp, mode="dtw"))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=2000,
                        help="JAX/TPU training steps.")
    parser.add_argument("--torch_steps", type=int, default=200,
                        help="torch/CPU step target (wall-capped).")
    parser.add_argument("--torch_seconds", type=float, default=2700,
                        help="torch wall-clock budget.")
    parser.add_argument("--log_every", type=int, default=10)
    parser.add_argument("--eval_items", type=int, default=6)
    parser.add_argument("--json", default=None)
    args = parser.parse_args(argv)

    import numpy as np

    hp = build_hp()
    items = qps.build_dataset(
        n_items=64, seed=0, n_symbols=N_SYMBOLS,
        frames_per_symbol=FRAMES_PER_SYMBOL, num_mels=NUM_MELS, t_pad=T_PAD)
    train_items = items[:-args.eval_items]
    eval_items = items[-args.eval_items:]
    batches = qps.make_batches(train_items, hp, seed=1, batch=BATCH,
                               t_pad=T_PAD, f_pad=F_PAD, num_mels=NUM_MELS)
    eval_batch = qps.make_batches(
        items[-BATCH:], hp, seed=2, batch=BATCH, t_pad=T_PAD, f_pad=F_PAD,
        num_mels=NUM_MELS)[0]
    print(f"dataset: {len(train_items)} train / {args.eval_items} eval, "
          f"{len(batches)} batches of {BATCH}; flagship dims "
          f"(enc {hp.encoder_dimension} dec {hp.decoder_dimension} "
          f"{hp.num_mels} mels), bf16 + fused kernels on TPU vs torch f32 CPU")

    print("training torch reference (CPU, f32) ...", flush=True)
    tmodel, torch_init, torch_curve = qps.train_torch(
        hp, batches, args.torch_steps, args.log_every,
        max_seconds=args.torch_seconds)
    torch_last_step = torch_curve[-1][0]

    print("training this framework (TPU, bf16, fused train decoder) ...",
          flush=True)
    final_vars, snap_vars, jax_curve = train_jax_flagship(
        hp, batches, args.steps, args.log_every, torch_init,
        snapshot_step=torch_last_step)

    print("alignment diagonality (teacher-forced eval batch) ...", flush=True)
    diag_torch = torch_teacher_forced_diagonality(tmodel, eval_batch)
    diag_jax_matched = jax_teacher_forced_diagonality(hp, snap_vars,
                                                      eval_batch)
    diag_jax_final = jax_teacher_forced_diagonality(hp, final_vars,
                                                    eval_batch)

    print("free-running DTW-MCD on held-out texts ...", flush=True)
    from multilingual_text_to_speech_tpu.synthesis import Synthesizer

    synth_matched = Synthesizer(hp, snap_vars)
    synth_final = Synthesizer(hp, final_vars)
    hp_int8 = copy.deepcopy(hp)
    hp_int8.pallas_decoder_int8 = True
    synth_int8 = Synthesizer(hp_int8, final_vars)

    rows = {"torch": [], "jax_matched": [], "jax_final": [],
            "jax_final_int8": []}
    for ids, mel in eval_items:
        gt = mel.T  # [M, F]
        rows["torch"].append(mcd_of(hp, gt, qps.torch_free_run(tmodel, ids)))
        for name, synth in (("jax_matched", synth_matched),
                            ("jax_final", synth_final),
                            ("jax_final_int8", synth_int8)):
            rows[name].append(
                mcd_of(hp, gt, synth.spectrogram_from_ids(
                    np.asarray(list(ids)))))
    mcd = {k: float(np.mean(v)) for k, v in rows.items()}

    results = {
        "dims": {"embedding": hp.embedding_dimension,
                 "encoder": hp.encoder_dimension,
                 "prenet": hp.prenet_dimension,
                 "attention": hp.attention_dimension,
                 "decoder": hp.decoder_dimension,
                 "postnet": hp.postnet_dimension,
                 "num_mels": hp.num_mels, "batch": BATCH,
                 "t_pad": T_PAD, "f_pad": F_PAD},
        "jax_steps": args.steps,
        "torch_last_step": torch_last_step,
        "torch_curve": torch_curve,
        "jax_curve": jax_curve,
        "diagonality": {"torch": diag_torch,
                        "jax_matched_step": diag_jax_matched,
                        "jax_final": diag_jax_final},
        "mcd_dtw": mcd,
        "abs_mcd_delta_matched": abs(mcd["torch"] - mcd["jax_matched"]),
        "int8_mcd_delta_vs_f_final": abs(mcd["jax_final"]
                                         - mcd["jax_final_int8"]),
    }
    print(json.dumps(results, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
