"""Side-by-side trained-quality comparison: torch reference vs this framework.

The per-step numerical parity suite (tests/test_reference_parity.py) proves
"same function at step 0".  This study proves "same system after training"
— the strongest quality-parity evidence obtainable without corpus egress:

1. build ONE synthetic copy-task dataset (each symbol id deterministically
   maps to a fixed 3-frame mel pattern — a perfectly learnable TTS toy);
2. instantiate the LIVE torch reference Tacotron (/root/reference) and this
   framework's Tacotron with MATCHED hyper-parameters, then port the torch
   initialization into the JAX model (interop.port_state_dict) so both start
   from IDENTICAL weights;
3. train both with the same objective (composite Tacotron loss incl. guided
   attention), same Adam settings, same gradient clipping, same batch order,
   for the same number of steps;
4. compare teacher-forced loss trajectories and free-running DTW-MCD of
   generated spectrograms against the ground-truth patterns on held-out
   texts.

The two runs differ only in framework-internal stochastic draws (prenet
dropout, zoneout masks), so trajectories agree statistically, not
bit-exactly.  Results are committed in QUALITY_PARITY.md.

Usage:
    python demos/quality_parity_study.py [--steps 300] [--report out.md]

Reference interfaces driven: modules/tacotron2.py:355-385 (forward),
387-410 (inference), 459-485 (TacotronLoss), train.py:260-271 (optimizer).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_PATH = "/root/reference"

N_SYMBOLS = 12
FRAMES_PER_SYMBOL = 3
NUM_MELS = 20
BATCH = 16
T_PAD = 16      # padded text length
F_PAD = 48      # padded frame length


def build_hp(attention_type="location_sensitive"):
    """Matched hyper-parameters for both frameworks (flagship-shaped tiny
    model: generated encoder, zoneout LSTMs, conv postnet).

    ``attention_type`` extends the study to the forward attention family
    ("forward" only — the reference's ForwardAttentionWithTransition.reset
    drops the ``device`` argument upstream and cannot train unpatched)."""
    from multilingual_text_to_speech_tpu.config import HParams

    hp = HParams()
    hp.languages = ["synth"]
    hp.language_number = 1
    hp.characters = "abcdefghijklmnopqrstuvwxyz"
    hp.use_punctuation = False
    hp.use_phonemes = False
    hp.case_sensitive = True
    hp.num_mels = NUM_MELS
    hp.embedding_dimension = 32
    hp.encoder_type = "generated"
    hp.encoder_dimension = 48
    hp.generator_dim = 8
    hp.generator_bottleneck_dim = 4
    hp.prenet_dimension = 32
    hp.prenet_layers = 2
    hp.attention_type = attention_type
    hp.attention_dimension = 32
    hp.attention_kernel_size = 15
    hp.attention_location_dimension = 16
    hp.decoder_dimension = 96
    hp.decoder_regularization = "zoneout"
    hp.zoneout_hidden = 0.1
    hp.zoneout_cell = 0.1
    hp.dropout = 0.1                  # always-on prenet dropout (both sides)
    hp.postnet_dimension = 32
    hp.postnet_blocks = 3
    hp.postnet_kernel_size = 5
    hp.predict_linear = False
    hp.multi_speaker = False
    hp.multi_language = False
    hp.reversal_classifier = False
    hp.stop_frames = 2
    hp.guided_attention_loss = True
    hp.guided_attention_steps = 10 ** 6   # active for the whole run
    hp.guided_attention_toleration = 0.25
    hp.guided_attention_gain = 1.0        # no decay: schedules trivially match
    hp.learning_rate = 2e-3
    hp.weight_decay = 0.0
    hp.gradient_clipping = 1.0
    hp.max_output_length = F_PAD + 12
    hp.normalize_spectrogram = False
    hp.compute_dtype = "float32"      # torch trains in f32 — match it
    hp.batch_size = BATCH
    hp.use_pallas_decoder = False
    hp.use_pallas_train_decoder = False
    return hp


def build_dataset(n_items=64, seed=0, *, n_symbols=N_SYMBOLS,
                  frames_per_symbol=FRAMES_PER_SYMBOL, num_mels=NUM_MELS,
                  t_pad=T_PAD):
    """Copy-task utterances: (ids [L], mel [F, M]) with shared patterns.

    Keyword arguments let the flagship-dims on-device study
    (demos/flagship_quality_study.py) scale the task up without forking
    the protocol."""
    import numpy as np

    rng = np.random.RandomState(seed)
    patterns = rng.randn(n_symbols, frames_per_symbol, num_mels).astype(
        np.float32)
    items = []
    for _ in range(n_items):
        length = rng.randint(t_pad // 2, t_pad + 1)
        ids = rng.randint(3, 3 + n_symbols, length)  # skip PAD/EOS/UNK rows
        mel = np.concatenate([patterns[s - 3] for s in ids], axis=0)
        items.append((ids, mel))
    return items


def make_batches(items, hp, seed=1, *, batch=BATCH, t_pad=T_PAD, f_pad=F_PAD,
                 num_mels=NUM_MELS):
    """Static-shape padded batches shared verbatim by both frameworks."""
    import numpy as np

    rng = np.random.RandomState(seed)
    order = rng.permutation(len(items))
    batches = []
    for lo in range(0, len(items) - batch + 1, batch):
        sel = order[lo:lo + batch]
        text = np.zeros((batch, t_pad), np.int64)
        tlen = np.zeros((batch,), np.int64)
        target = np.zeros((batch, f_pad, num_mels), np.float32)
        flen = np.zeros((batch,), np.int64)
        stop = np.ones((batch, f_pad), np.float32)
        for j, idx in enumerate(sel):
            ids, mel = items[idx]
            text[j, :len(ids)] = ids
            tlen[j] = len(ids)
            target[j, :mel.shape[0]] = mel
            flen[j] = mel.shape[0]
            stop[j, :max(mel.shape[0] - hp.stop_frames, 0)] = 0.0
        # sort by text length desc (torch packed-sequence convention; the
        # generated encoder does not pack, but keep batches order-identical)
        perm = np.argsort(-tlen, kind="stable")
        batches.append(tuple(a[perm] for a in (text, tlen, target, flen, stop)))
    return batches


# ---------------------------------------------------------------------------
# torch reference side
# ---------------------------------------------------------------------------


def setup_reference(hp):
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import utils  # noqa: F401  (import order: utils before modules)
    import modules.tacotron2 as tacotron2
    from params.params import Params

    for k, v in hp.state_dict().items():
        if hasattr(Params, k):
            setattr(Params, k, v)
    return tacotron2, Params


def train_torch(hp, batches, steps, log_every, seed=7, max_seconds=None):
    """Train the live torch reference.  ``max_seconds`` bounds wall clock
    (flagship dims on CPU are slow): training stops at the first logging
    point past the budget, and the returned curve's last step records how
    far the reference actually got."""
    import copy

    import torch

    tacotron2, Params = setup_reference(hp)
    torch.manual_seed(seed)
    model = tacotron2.Tacotron().train()
    # snapshot the INITIALIZATION before any update — the JAX run starts
    # from these exact weights (ported), not from torch's trained state
    init_state = copy.deepcopy(
        {k: v.detach().clone() for k, v in model.state_dict().items()})
    criterion = tacotron2.TacotronLoss(
        hp.guided_attention_steps, hp.guided_attention_toleration,
        hp.guided_attention_gain)
    opt = torch.optim.Adam(model.parameters(), lr=hp.learning_rate,
                           weight_decay=hp.weight_decay)
    curve = []
    t0 = time.time()
    for s in range(steps):
        text, tlen, target, flen, stop = batches[s % len(batches)]
        text_t = torch.tensor(text)
        tlen_t = torch.tensor(tlen)
        target_t = torch.tensor(target).transpose(1, 2)  # [B, M, F]
        flen_t = torch.tensor(flen)
        stop_t = torch.tensor(stop)
        opt.zero_grad()
        post, pre, stop_pred, align, spk_pred, enc = model(
            text_t, tlen_t, target_t, flen_t, None, None,
            teacher_forcing_ratio=1.0)
        total, parts = criterion(
            tlen_t, flen_t, pre, target_t, post, target_t, stop_pred,
            stop_t, align, None, spk_pred, enc, None)
        total.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(),
                                       hp.gradient_clipping)
        opt.step()
        if s % log_every == 0 or s == steps - 1:
            curve.append((s, float(total),
                          float(parts["mel_pre"] + parts["mel_pos"])))
            if max_seconds is not None and time.time() - t0 > max_seconds:
                print(f"  torch: wall budget {max_seconds:.0f}s hit at "
                      f"step {s}", flush=True)
                break
    print(f"  torch: {curve[-1][0] + 1} steps in {time.time() - t0:.0f}s")
    return model, init_state, curve


def torch_free_run(model, ids):
    import torch

    model.eval()
    with torch.no_grad():
        out = model.inference(torch.tensor(list(ids)))  # [M, F]
    model.train()
    return out.numpy()


# ---------------------------------------------------------------------------
# JAX side
# ---------------------------------------------------------------------------


def train_jax(hp, batches, steps, log_every, torch_init_state, seed=7):
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

    model = Tacotron(hp, train=True)
    text, tlen, target, flen, stop = batches[0]
    key = jax.random.PRNGKey(seed)
    args0 = (jnp.asarray(text, jnp.int32), jnp.asarray(tlen, jnp.int32),
             jnp.asarray(target), jnp.asarray(flen, jnp.int32),
             None, None, 1.0, key)
    variables = jax.tree_util.tree_map(
        np.asarray, unfreeze(model.init(key, *args0)))
    if torch_init_state is not None:
        # identical starting point: port the torch initialization
        ported = port_state_dict(torch_init_state, hp)
        variables["params"] = merge_into(variables["params"],
                                         ported["params"], strict=True)
        variables["batch_stats"] = merge_into(
            variables["batch_stats"], ported["batch_stats"], strict=True)

    # reference optimizer: torch Adam's weight_decay folds wd*param into the
    # gradient BEFORE the moments (here wd=0 so plain adam + global clip)
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

    curve = []
    t0 = time.time()
    for s in range(steps):
        text, tlen, target, flen, stop = batches[s % len(batches)]
        batch = (jnp.asarray(text, jnp.int32), jnp.asarray(tlen, jnp.int32),
                 jnp.asarray(target), jnp.asarray(flen, jnp.int32),
                 jnp.asarray(stop))
        params, batch_stats, opt_state, total, mel = step_fn(
            params, batch_stats, opt_state, batch,
            jax.random.fold_in(jax.random.PRNGKey(seed + 1), s))
        if s % log_every == 0 or s == steps - 1:
            curve.append((s, float(total), float(mel)))
    print(f"  jax:   {steps} steps in {time.time() - t0:.0f}s")
    return {"params": params, "batch_stats": batch_stats}, curve


def jax_free_run(hp, variables, ids):
    import numpy as np

    from multilingual_text_to_speech_tpu.synthesis import Synthesizer

    synth = Synthesizer(hp, variables)
    return synth.spectrogram_from_ids(np.asarray(list(ids)))  # [M, F]


# ---------------------------------------------------------------------------
# study driver
# ---------------------------------------------------------------------------


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--log_every", type=int, default=10)
    parser.add_argument("--eval_items", type=int, default=8)
    parser.add_argument("--report", default=None,
                        help="Write a markdown report to this path.")
    parser.add_argument("--json", default=None,
                        help="Write raw results JSON to this path.")
    parser.add_argument("--attention", default="location_sensitive",
                        choices=["location_sensitive", "forward"],
                        help="Attention family for both frameworks "
                        "(see build_hp re: the transition-agent variant).")
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # identical hardware for both

    import numpy as np

    from multilingual_text_to_speech_tpu.ops.audio import (
        mel_cepstral_distortion,
    )

    hp = build_hp(attention_type=args.attention)
    items = build_dataset(n_items=64, seed=0)
    train_items, eval_items = items[:-args.eval_items], items[-args.eval_items:]
    batches = make_batches(train_items, hp, seed=1)
    print(f"dataset: {len(train_items)} train / {len(eval_items)} eval "
          f"utterances, {len(batches)} batches of {BATCH}")

    print("training torch reference ...")
    tmodel, torch_init, torch_curve = train_torch(
        hp, batches, args.steps, args.log_every)
    print("training this framework (same init, same batches) ...")
    variables, jax_curve = train_jax(hp, batches, args.steps, args.log_every,
                                     torch_init)

    # free-running MCD vs ground truth on held-out texts
    class _McdHp:  # mel_cepstral_distortion only reads num_mfcc
        num_mfcc = 13

    torch_mcd, jax_mcd = [], []
    for ids, mel in eval_items:
        gt = mel.T  # [M, F]
        s_t = torch_free_run(tmodel, ids)
        s_j = jax_free_run(hp, variables, ids)
        torch_mcd.append(mel_cepstral_distortion(gt, s_t, _McdHp, mode="dtw"))
        jax_mcd.append(mel_cepstral_distortion(gt, s_j, _McdHp, mode="dtw"))
    t_mcd, j_mcd = float(np.mean(torch_mcd)), float(np.mean(jax_mcd))

    results = {
        "steps": args.steps,
        "torch_curve": torch_curve,
        "jax_curve": jax_curve,
        "torch_final_loss": torch_curve[-1][1],
        "jax_final_loss": jax_curve[-1][1],
        "torch_mcd_dtw": t_mcd,
        "jax_mcd_dtw": j_mcd,
        "abs_mcd_delta": abs(t_mcd - j_mcd),
    }
    print(json.dumps(results, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    if args.report:
        write_report(args.report, hp, results)
        print(f"report written to {args.report}")
    return results


def write_report(path, hp, r):
    lines = [
        "# Trained-quality parity: torch reference vs this framework",
        "",
        "Produced by `demos/quality_parity_study.py` (see its docstring for",
        "the protocol).  Both models start from IDENTICAL weights (the torch",
        "initialization ported through `interop.port_state_dict`), train on",
        "identical batches of a synthetic copy task with matched objectives",
        "and optimizers on CPU, and differ only in framework-internal",
        "dropout/zoneout draws.",
        "",
        f"Model: generated encoder {hp.encoder_dimension}, decoder "
        f"{hp.decoder_dimension}, {hp.num_mels} mels; Adam lr "
        f"{hp.learning_rate}, clip {hp.gradient_clipping}; "
        f"{r['steps']} steps, batch {hp.batch_size}.",
        "",
        "## Teacher-forced training loss (total composite)",
        "",
        "| step | torch reference | this framework |",
        "|---|---|---|",
    ]
    jmap = dict((s, (t, m)) for s, t, m in r["jax_curve"])
    for s, t_total, _ in r["torch_curve"]:
        if s in jmap:
            lines.append(f"| {s} | {t_total:.4f} | {jmap[s][0]:.4f} |")
    lines += [
        "",
        "## Free-running DTW-MCD vs ground truth (held-out texts)",
        "",
        "| framework | mean MCD (dB-like, synthetic mels) |",
        "|---|---|",
        f"| torch reference | {r['torch_mcd_dtw']:.4f} |",
        f"| this framework | {r['jax_mcd_dtw']:.4f} |",
        "",
        f"**|ΔMCD| = {r['abs_mcd_delta']:.4f}** "
        f"({100 * r['abs_mcd_delta'] / max(r['torch_mcd_dtw'], 1e-9):.1f}% "
        "of the reference's value).",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))


if __name__ == "__main__":
    main()
