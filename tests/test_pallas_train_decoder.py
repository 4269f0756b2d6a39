"""Parity and gradient tests for the fused Pallas TRAINING decoder.

ops/pallas_train_decoder.py replaces the XLA teacher-forced decoder scan
(models/decoder.py) with chunked forward/backward kernels under a custom
VJP.  Three layers of evidence, all in interpreter mode on CPU:

1. With regularization disabled the fused path must match the XLA scan —
   outputs AND gradients — at float32 epsilon for any teacher-forcing
   ratio (the stochasticity reduces to the shared Bernoulli flags).
2. With dropout/zoneout ACTIVE the masks come from the kernel's
   counter-based PRNG, so the XLA scan is a different (equally valid)
   stochastic realization; the gold check is a pure-JAX replica of the
   step loop drawing the SAME masks via the same hash — forward equality
   and VJP agreement against its autodiff.
3. Determinism: same seeds, same results.

Reference semantics: the hot loop /root/reference/modules/tacotron2.py:180-207,
zoneout modules/layers.py:18-34, prenet tacotron2.py:15-46.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multilingual_text_to_speech_tpu.models.tacotron import Tacotron
from multilingual_text_to_speech_tpu.ops import pallas_train_decoder as ptd
from tests.corpus_utils import tiny_model_hp


def make_hp(regularization="zoneout", stochastic=False, prenet_layers=2,
            attention_type="location_sensitive"):
    hp = tiny_model_hp(
        multi_speaker=True, multi_language=True, speaker_number=4,
        language_number=2, languages=["de", "fr"],
        decoder_regularization=regularization)
    hp.attention_type = attention_type
    hp.prenet_layers = prenet_layers
    if stochastic:
        hp.dropout = 0.5
        hp.zoneout_hidden = 0.1
        hp.zoneout_cell = 0.1
        hp.dropout_hidden = 0.1
    else:
        hp.dropout = 0.0
        hp.zoneout_hidden = 0.0
        hp.zoneout_cell = 0.0
        hp.dropout_hidden = 0.0
    assert ptd.supports(hp)
    return hp


def build(hp, batch=4, text_len=24, frames=12, seed=0):
    model = Tacotron(hp, train=True)
    rng = np.random.RandomState(seed)
    text = jnp.asarray(rng.randint(3, hp.total_symbols(), (batch, text_len)),
                       jnp.int32)
    lengths = jnp.asarray(
        np.clip(rng.randint(text_len // 2, text_len + 1, batch), 2, text_len),
        jnp.int32)
    speakers = jnp.asarray(rng.randint(0, hp.speaker_number, batch), jnp.int32)
    languages = jnp.asarray(np.arange(batch) % hp.language_number, jnp.int32)
    target = jnp.asarray(rng.randn(batch, frames, hp.num_mels), jnp.float32)
    tlen = jnp.full((batch,), frames, jnp.int32)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, text, lengths, target, tlen, speakers,
                           languages, 1.0, key)
    args = (text, lengths, target, tlen, speakers, languages)
    return model, variables, args


def run_model(model, variables, args, ratio, seed=3):
    (text, lengths, target, tlen, speakers, languages) = args
    k = jax.random.PRNGKey(seed)
    out, _ = model.apply(
        variables, text, lengths, target, tlen, speakers, languages,
        ratio, k, mutable=["batch_stats"],
        rngs={"dropout": jax.random.fold_in(k, 1)})
    return out


@pytest.mark.parametrize("ratio", [1.0, 0.5, 0.0])
def test_forward_parity_vs_xla(monkeypatch, ratio):
    hp = make_hp()
    model, variables, args = build(hp)
    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "off")
    ox = run_model(model, variables, args, ratio)
    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "interpret")
    of = run_model(model, variables, args, ratio)
    for k in ("pre_prediction", "post_prediction", "stop_token", "alignment"):
        np.testing.assert_allclose(
            np.asarray(ox[k]), np.asarray(of[k]), atol=5e-6,
            err_msg=f"ratio={ratio} key={k}")


@pytest.mark.parametrize("attention_type",
                         ["forward", "forward_transition_agent"])
def test_forward_parity_vs_xla_forward_family(monkeypatch, attention_type):
    """Round 3: the train kernel covers the forward attention family via
    the shift-matrix recurrence (unmasked softmax energy, masked clamp +
    L1 renorm, lane-replicated transition probability)."""
    hp = make_hp(attention_type=attention_type)
    model, variables, args = build(hp)
    ratio = 0.5
    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "off")
    ox = run_model(model, variables, args, ratio)
    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "interpret")
    of = run_model(model, variables, args, ratio)
    for k in ("pre_prediction", "post_prediction", "stop_token", "alignment"):
        np.testing.assert_allclose(
            np.asarray(ox[k]), np.asarray(of[k]), atol=5e-6,
            err_msg=f"ratio={ratio} key={k}")


@pytest.mark.parametrize(
    "regularization,prenet_layers,attention_type",
    [("zoneout", 2, "location_sensitive"),
     ("dropout", 2, "location_sensitive"),
     ("zoneout", 1, "location_sensitive"),
     ("zoneout", 3, "location_sensitive"),
     ("zoneout", 2, "forward"),
     ("zoneout", 2, "forward_transition_agent"),
     ("dropout", 2, "forward_transition_agent")])
def test_grad_parity_vs_xla(monkeypatch, regularization, prenet_layers,
                            attention_type):
    """Prenet depths 1 and 3 and the forward attention family ride the
    same check (round 3: the train kernel covers any depth >= 1 and all
    three attention recurrences, matching the serving kernel)."""
    hp = make_hp(regularization, prenet_layers=prenet_layers,
                 attention_type=attention_type)
    model, variables, args = build(hp)
    (text, lengths, target, tlen, speakers, languages) = args

    def loss_fn(params, seed=3):
        k = jax.random.PRNGKey(seed)
        out, _ = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            text, lengths, target, tlen, speakers, languages,
            0.5, k, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(k, 1)})
        return (jnp.mean((out["pre_prediction"] - target) ** 2)
                + 0.1 * jnp.mean(out["stop_token"] ** 2)
                + 0.05 * jnp.mean(out["alignment"] ** 2))

    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "off")
    gx = jax.grad(loss_fn)(variables["params"])
    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "interpret")
    gf = jax.grad(loss_fn)(variables["params"])
    for (pa, va), (_, vb) in zip(
            jax.tree_util.tree_leaves_with_path(gx),
            jax.tree_util.tree_leaves_with_path(gf)):
        a, b = np.asarray(va), np.asarray(vb)
        scale = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() / scale < 1e-3, (
            jax.tree_util.keystr(pa), np.abs(a - b).max(), scale)


@pytest.mark.parametrize("text_len,check_grads",
                         [(256, True), (192, False), (160, False)])
def test_blocked_attention_parity(monkeypatch, text_len, check_grads):
    """Round 3: above 128 symbols the location-sensitive train kernels use
    the serving kernel's T-blocked attention layout (Tb=128, or 64 when
    128 does not divide the bucket) — operands and the dband accumulator
    grow T*Tb instead of T^2, lifting the flagship training text ceiling
    from ~170 (single fold) to 512 symbols.  160 exercises the 64-multiple
    ROUTING PAD (160 -> 192) applied inside the Decoder's fused branch —
    exact for ls because the masked -inf softmax zeroes padded positions."""
    from multilingual_text_to_speech_tpu.ops import pallas_train_decoder

    hp = make_hp()
    t_fused = pallas_train_decoder.padded_t_len(text_len, hp.attention_type)
    cfg = pallas_train_decoder._make_cfg(
        hp, t_len=t_fused, mem_dim=32,
        att_dim=int(hp.attention_dimension), dtype=jnp.float32)
    assert cfg.n_blocks > 1, (text_len, t_fused, cfg.t_block)
    model, variables, args = build(hp, batch=2, text_len=text_len,
                                   frames=10)
    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "off")
    ox = run_model(model, variables, args, 1.0)
    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "interpret")
    of = run_model(model, variables, args, 1.0)
    for k in ("pre_prediction", "post_prediction", "stop_token",
              "alignment"):
        # blocked accumulation reorders float sums vs the XLA scan's
        # single fold — slightly looser than the exact-order tests
        np.testing.assert_allclose(
            np.asarray(ox[k]), np.asarray(of[k]), atol=2e-5, err_msg=k)
    if not check_grads:
        return
    (text, lengths, target, tlen, speakers, languages) = args

    def loss_fn(params):
        k = jax.random.PRNGKey(3)
        out, _ = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            text, lengths, target, tlen, speakers, languages,
            1.0, k, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(k, 1)})
        return (jnp.mean((out["pre_prediction"] - target) ** 2)
                + 0.1 * jnp.mean(out["stop_token"] ** 2)
                + 0.05 * jnp.mean(out["alignment"] ** 2))

    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "off")
    gx = jax.grad(loss_fn)(variables["params"])
    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "interpret")
    gf = jax.grad(loss_fn)(variables["params"])
    for (pa, va), (_, vb) in zip(
            jax.tree_util.tree_leaves_with_path(gx),
            jax.tree_util.tree_leaves_with_path(gf)):
        a, b = np.asarray(va), np.asarray(vb)
        scale = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() / scale < 1e-3, (
            jax.tree_util.keystr(pa), np.abs(a - b).max(), scale)


def test_blocked_vmem_ceiling():
    """The T-blocked layout is what makes flagship-dim training fit VMEM
    past the old ~170-symbol single-fold wall (PARITY.md row: train text
    len)."""
    from __graft_entry__ import _flagship_hp
    from multilingual_text_to_speech_tpu.ops import pallas_train_decoder

    hp = _flagship_hp()
    a = int(hp.attention_dimension)
    assert pallas_train_decoder.fits_vmem(
        hp, 50, 256, 528, a, dtype=jnp.bfloat16, train=True)
    assert pallas_train_decoder.fits_vmem(
        hp, 16, 512, 528, a, dtype=jnp.bfloat16, train=True)
    assert pallas_train_decoder.supports_shapes(16, 512)
    # f32 + blocked fold multiplies Mosaic spill slots per block: the
    # 2026-08-18 v5e dump (tools/hw_results/train_forward_family_*.log)
    # measured 144.6M/128M at (b=20, T=192, 3 blocks) — the model must
    # route that shape to the XLA scan, while b=8 still fits on-chip
    assert not pallas_train_decoder.fits_vmem(
        hp, 20, 192, 292, a, dtype=jnp.float32, train=True)
    assert pallas_train_decoder.fits_vmem(
        hp, 8, 192, 292, a, dtype=jnp.float32, train=True)


# ---------------------------------------------------------------------------
# stochastic gold check: pure-JAX replica drawing the kernel's exact masks
# ---------------------------------------------------------------------------


def replica_decode(hp, cell_params, memory, mt, mask, shifted, teacher,
                   seeds):
    """Straight-line JAX re-statement of the kernel's step math, using the
    same counter-based PRNG (ptd._rand_bits) — differentiable by jax.grad."""
    p = cell_params
    b, t_len, mem_dim = memory.shape
    frames = shifted.shape[1]
    hidden = hp.decoder_dimension
    use_zoneout = hp.decoder_regularization == "zoneout"
    keep_pre = 1.0 - hp.dropout
    pre_thresh = ptd._thresh(keep_pre)
    pre_scale = 1.0 / keep_pre if keep_pre > 0 else 0.0
    zh = hp.zoneout_hidden if use_zoneout else hp.dropout_hidden
    zc = hp.zoneout_cell if use_zoneout else 0.0
    zh_thresh = ptd._thresh(1.0 - zh)
    zc_thresh = ptd._thresh(1.0 - zc)
    dh_scale = 1.0 / (1.0 - zh) if zh < 1.0 else 0.0
    seed0 = seeds[0].astype(jnp.uint32)
    seed1 = seeds[1].astype(jnp.uint32)

    wq = p["attention"]["query_kernel"]
    loc_filter = p["attention"]["loc_filter"]
    wl = p["attention"]["location_kernel"]
    att_bias = p["attention"]["bias"]
    v = p["attention"]["energy_kernel"]

    n_prenet = int(getattr(hp, "prenet_layers", 2))
    (sites, salt_att_h, salt_att_c,
     salt_gen_h, salt_gen_c) = ptd._salt_layout(n_prenet)

    def bits(shape, gs, salt):
        return ptd._rand_bits(shape, seed0, seed1,
                              jnp.asarray(gs * sites + salt))

    def lstm(gates, c):
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = (jax.nn.sigmoid(f) * c
                 + jax.nn.sigmoid(i) * jnp.tanh(g))
        return jax.nn.sigmoid(o) * jnp.tanh(c_new), c_new

    def reg(h_prev, c_prev, h_new, c_new, gs, salt_h, salt_c):
        if use_zoneout:
            mh = bits((b, hidden), gs, salt_h) < zh_thresh
            mc = bits((b, hidden), gs, salt_c) < zc_thresh
            return (jnp.where(mh, h_new, h_prev),
                    jnp.where(mc, c_new, c_prev))
        mh = bits((b, hidden), gs, salt_h) < ptd._thresh(1.0 - zh)
        return jnp.where(mh, h_new * dh_scale, 0.0), c_new

    h_att = jnp.zeros((b, hidden))
    c_att = jnp.zeros((b, hidden))
    h_gen = jnp.zeros((b, hidden))
    c_gen = jnp.zeros((b, hidden))
    ctx = jnp.zeros((b, mem_dim))
    frame = jnp.zeros((b, hp.num_mels))
    cum = jnp.zeros((b, t_len))
    mask_add = jnp.where(mask, 0.0, -1e9)

    specs, stops, ws = [], [], []
    for s in range(frames):
        raw = jnp.where(teacher[s], shifted[:, s], frame)
        x = raw
        for layer in range(n_prenet):
            fc = p["prenet"][f"fc{layer}"]
            r = jax.nn.relu(x @ fc["kernel"] + fc["bias"])
            if hp.dropout > 0:
                x = jnp.where(bits(r.shape, s, layer) < pre_thresh,
                              r * pre_scale, 0.0)
            else:
                x = r

        cat = jnp.concatenate([x, ctx, h_att], axis=-1)
        gates = (cat @ p["attention_lstm"]["cell"]["gates"]["kernel"]
                 + p["attention_lstm"]["cell"]["gates"]["bias"])
        h_new, c_new = lstm(gates, c_att)
        h_att, c_att = reg(h_att, c_att, h_new, c_new, s,
                           salt_att_h, salt_att_c)

        q = (h_att @ wq)[:, None, :]
        loc = jax.lax.conv_general_dilated(
            cum[..., None], loc_filter, (1,),
            [((hp.attention_kernel_size - 1) // 2,) * 2],
            dimension_numbers=("NWC", "WIO", "NWC")) @ wl
        energy = jnp.tanh(q + mt + loc + att_bias) @ v
        e = energy[..., 0] + mask_add
        w = jax.nn.softmax(e, axis=-1)
        ctx = jnp.einsum("bt,btm->bm", w, memory)
        cum = cum + w

        cat = jnp.concatenate([h_att, ctx, h_gen], axis=-1)
        gates = (cat @ p["generator_lstm"]["cell"]["gates"]["kernel"]
                 + p["generator_lstm"]["cell"]["gates"]["bias"])
        h_new, c_new = lstm(gates, c_gen)
        h_gen, c_gen = reg(h_gen, c_gen, h_new, c_new, s,
                           salt_gen_h, salt_gen_c)

        proto = jnp.concatenate([h_gen, ctx], axis=-1)
        frame = (proto @ p["frame_prediction"]["kernel"]
                 + p["frame_prediction"]["bias"])
        stop = (proto @ p["stop_prediction"]["kernel"]
                + p["stop_prediction"]["bias"])[:, 0]
        specs.append(frame)
        stops.append(stop)
        ws.append(w)
    return (jnp.stack(specs, 1), jnp.stack(stops, 1), jnp.stack(ws, 1))


@pytest.mark.parametrize("regularization,prenet_layers",
                         [("zoneout", 2), ("dropout", 2), ("zoneout", 3)])
def test_stochastic_parity_vs_replica(regularization, prenet_layers):
    """Active dropout/zoneout: the fused kernel and the pure-JAX replica
    draw identical masks, so outputs AND gradients must agree.  Depth 3
    exercises the per-layer prenet salt layout (round 3)."""
    hp = make_hp(regularization, stochastic=True,
                 prenet_layers=prenet_layers)
    model, variables, args = build(hp)
    (text, lengths, target, tlen, speakers, languages) = args
    b, t_len, frames = text.shape[0], text.shape[1], target.shape[1]

    # decoder-level inputs identical for both paths
    (memory, mt, mask, _), _ = model.apply(
        variables, text, lengths, speakers, languages,
        method=Tacotron.encode_for_inference, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(42)})
    memory = memory.astype(jnp.float32)
    mt = mt.astype(jnp.float32)
    shifted = jnp.concatenate(
        [jnp.zeros_like(target[:, :1]), target[:, :-1]], axis=1)
    teacher = jnp.asarray([1, 0] * (frames // 2), bool)
    seeds = jnp.asarray([12345, 67890], jnp.int32)
    cell_params = variables["params"]["decoder"]["cell"]

    def decode_with_seeds(cp, mem_, mt_):
        # mirror make_train_decode_fn.decode but with fixed seeds
        cfg = ptd._Cfg(
            t_len=t_len, mem_dim=mem_.shape[-1], att_dim=mt_.shape[-1],
            hidden=hp.decoder_dimension, mmel=hp.num_mels,
            prenet_dim=hp.prenet_dimension,
            n_prenet=int(hp.prenet_layers), dropout_rate=hp.dropout,
            zoneout_h=(hp.zoneout_hidden if regularization == "zoneout"
                       else hp.dropout_hidden),
            zoneout_c=(hp.zoneout_cell if regularization == "zoneout"
                       else 0.0),
            use_zoneout=regularization == "zoneout",
            dtype=jnp.float32, fwd_chunk=4, bwd_chunk=3)
        core = ptd.make_core(cfg, interpret=True)
        bundle = ptd.extract_decoder_bundle(
            None, compute_dtype=jnp.float32, cell_params=cp)
        att_dim = mt_.shape[-1]
        band = ptd._band_blocks(bundle, t_len, att_dim, t_len,
                                jnp.float32)[0]
        vt = jnp.repeat(bundle["v"].astype(jnp.float32), t_len)[None, :]
        mt_am = ptd._mt_operand(bundle, mt_, t_len, att_dim, t_len,
                                jnp.float32)
        ops = {k: bundle[k]
               for k in ptd._weight_order(int(hp.prenet_layers))}
        ops.update(band=band, vt=vt, mt_am=mt_am)
        mask_add = jnp.where(mask, 0.0, ptd._NEG_INF).astype(jnp.float32)
        f32 = jnp.float32
        init = (jnp.zeros((b, cfg.hidden), f32),) * 4 + (
            jnp.zeros((b, mem_.shape[-1]), f32),
            jnp.zeros((b, cfg.mmel), f32),
            jnp.zeros((b, t_len), f32))
        spec, stop, w_seq = core(
            ops, mem_, mask_add, jnp.swapaxes(shifted, 0, 1),
            teacher.astype(jnp.int32), seeds, init)
        return (jnp.swapaxes(spec, 0, 1), jnp.swapaxes(stop, 0, 1),
                jnp.swapaxes(w_seq, 0, 1))

    fused = decode_with_seeds(cell_params, memory, mt)
    ref = replica_decode(hp, cell_params, memory, mt, mask, shifted,
                         teacher, seeds)
    for name, a, r in zip(("spec", "stop", "w"), fused, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-5,
                                   err_msg=name)

    # gradients: fused custom VJP vs autodiff of the replica
    def loss_fused(cp, mem_, mt_):
        s, st, w = decode_with_seeds(cp, mem_, mt_)
        return (jnp.mean(s ** 2) + 0.1 * jnp.mean(st ** 2)
                + 0.05 * jnp.mean(w ** 2))

    def loss_ref(cp, mem_, mt_):
        s, st, w = replica_decode(hp, cp, mem_, mt_, mask, shifted,
                                  teacher, seeds)
        return (jnp.mean(s ** 2) + 0.1 * jnp.mean(st ** 2)
                + 0.05 * jnp.mean(w ** 2))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(cell_params, memory, mt)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(cell_params, memory, mt)
    for (pa, va), (_, vb) in zip(
            jax.tree_util.tree_leaves_with_path(gf),
            jax.tree_util.tree_leaves_with_path(gr)):
        a_, b_ = np.asarray(va), np.asarray(vb)
        scale = np.abs(b_).max() + 1e-6
        assert np.abs(a_ - b_).max() / scale < 2e-3, (
            jax.tree_util.keystr(pa), np.abs(a_ - b_).max(), scale)


def test_determinism(monkeypatch):
    hp = make_hp(stochastic=True)
    model, variables, args = build(hp)
    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "interpret")
    o1 = run_model(model, variables, args, 0.5, seed=9)
    o2 = run_model(model, variables, args, 0.5, seed=9)
    np.testing.assert_array_equal(np.asarray(o1["pre_prediction"]),
                                  np.asarray(o2["pre_prediction"]))


def test_training_loss_decreases(monkeypatch):
    """Three optimizer steps through the fused custom VJP reduce the loss."""
    import optax

    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "interpret")
    hp = make_hp(stochastic=True)
    model, variables, args = build(hp)
    (text, lengths, target, tlen, speakers, languages) = args
    tx = optax.adam(2e-3)
    params = variables["params"]
    opt_state = tx.init(params)

    def loss_fn(params, seed):
        k = jax.random.PRNGKey(seed)
        out, _ = model.apply(
            {"params": params,
             "batch_stats": variables.get("batch_stats", {})},
            text, lengths, target, tlen, speakers, languages,
            1.0, k, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(k, 1)})
        return jnp.mean((out["pre_prediction"] - target) ** 2)

    losses = []
    for i in range(4):
        loss, grads = jax.value_and_grad(loss_fn)(params, 0)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.parametrize("regularization,attention_type",
                         [("zoneout", "location_sensitive"),
                          ("dropout", "location_sensitive"),
                          ("zoneout", "forward_transition_agent")])
def test_eval_mode_parity_vs_xla(monkeypatch, regularization,
                                 attention_type):
    """Eval/GTA teacher-forced forward: deterministic zoneout interpolation
    (models/rnn.py:79-81) makes the eval path exactly comparable with
    NONZERO zoneout rates — only prenet dropout must be disabled.  The
    transition-agent case covers the eval kernel's residual-free t_prob
    carry (round 3)."""
    hp = make_hp(regularization, attention_type=attention_type)
    hp.zoneout_hidden = 0.1
    hp.zoneout_cell = 0.1
    hp.dropout = 0.0        # the one remaining stochastic op at eval
    hp.dropout_hidden = 0.3  # eval: off either way
    model_t, variables, args = build(hp)
    model = Tacotron(hp, train=False)

    def run(ratio):
        (text, lengths, target, tlen, speakers, languages) = args
        k = jax.random.PRNGKey(5)
        out = model.apply(
            variables, text, lengths, target, tlen, speakers, languages,
            ratio, k)
        return out

    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "off")
    ox = run(1.0)
    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "interpret")
    of = run(1.0)
    for k in ("pre_prediction", "post_prediction", "stop_token", "alignment"):
        np.testing.assert_allclose(
            np.asarray(ox[k]), np.asarray(of[k]), atol=5e-6, err_msg=k)


def test_vmem_fit_gate():
    """ADVICE r2 (medium): shapes whose chunk-independent VMEM footprint
    outgrows the budget must report no-fit so the router takes the XLA
    scan instead of crashing in Mosaic.

    (The round-3 VPU energy path removed the qe/red operands and the
    [A*T, T] dred accumulator, so flagship bf16 training now fits the
    whole coarse 256-symbol range — the no-fit cases below use f32 or
    doubled dims.)"""
    from multilingual_text_to_speech_tpu.config import HParams

    hp = HParams()
    hp.decoder_dimension = 1024
    hp.num_mels = 80
    hp.prenet_dimension = 256

    # flagship bf16 fits across the coarse bound...
    assert ptd.fits_vmem(hp, 50, 128, 512, 128, dtype=jnp.bfloat16)
    assert ptd.fits_vmem(hp, 50, 256, 512, 128, dtype=jnp.bfloat16)
    # ...but f32 at batch 128 does not, nor do doubled dims
    assert not ptd.fits_vmem(hp, 128, 256, 512, 128, dtype=jnp.float32)
    hp2 = HParams()
    hp2.decoder_dimension = 2048
    hp2.num_mels = 80
    hp2.prenet_dimension = 256
    assert not ptd.fits_vmem(hp2, 128, 128, 1024, 256, dtype=jnp.bfloat16)

    # the no-fit sentinel: fixed bytes alone bust the budget => 0, not 1
    cfg = ptd._make_cfg(hp, t_len=256, mem_dim=512, att_dim=128,
                        dtype=jnp.float32)
    assert ptd._vmem_chunk(cfg, 128, 32, True) == 0
    # eval-mode (forward-only) fit is less demanding than training
    assert not ptd.fits_vmem(hp, 50, 192, 512, 128, dtype=jnp.float32)
    assert ptd.fits_vmem(hp, 50, 192, 512, 128, dtype=jnp.float32,
                         train=False)

    # forward family: single fold fits at the full 512-symbol serving
    # bound, flagship bf16 batch 50 — its operands are linear in T (no
    # [A*T] band), so no T-blocked fold is needed for this family.
    # Hardware-confirmed 2026-08-19: Mosaic compile + loss parity + exact
    # f32 grads at T=512 (tools/hw_results/
    # train_forward_family_2026-08-19c.log); the bf16 T=512 grad story is
    # the boundary diagnostic in hw_results/diag_bf16_t512_2026-08-19.log.
    for att in ("forward", "forward_transition_agent"):
        hp_f = HParams()
        hp_f.decoder_dimension = 1024
        hp_f.num_mels = 80
        hp_f.prenet_dimension = 256
        hp_f.attention_type = att
        assert ptd.padded_t_len(512, att) == 512  # no pad, single fold
        assert ptd.fits_vmem(hp_f, 50, 512, 512, 128, dtype=jnp.bfloat16)


@pytest.mark.parametrize("mesh_shape,batch,scheme", [
    ((4, 1), 8, "flatten"),       # pure DP: 2 samples per shard
    ((2, 2), 8, "flatten"),       # TP mesh, batch divides mesh.size
    ((2, 2), 6, "replicate"),     # TP mesh, batch divides only 'data'
])
def test_shard_map_grad_parity(monkeypatch, mesh_shape, batch, scheme):
    """The sharded decode routes (kernel per shard; parameter cotangents
    psum'd by the shard_map transpose, check_vma off) must produce the SAME
    gradients as the single-device fused path — on pure data-parallel AND
    tensor-parallel meshes.  A missing/wrong psum (or a wrong replica
    rescale on the replicate scheme) would scale decoder grads by a
    shard-count factor — caught here on CPU meshes."""
    from jax.sharding import Mesh

    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "interpret")
    hp = make_hp()  # deterministic: dropout/zoneout rates all zero
    model_single, variables, _ = build(hp, batch=batch)
    _, _, args = build(hp, batch=batch)  # same seeds => same args
    (text, lengths, target, tlen, speakers, languages) = args

    mesh = Mesh(np.asarray(jax.devices()[:mesh_shape[0] * mesh_shape[1]]
                           ).reshape(*mesh_shape),
                axis_names=("data", "model"))
    from multilingual_text_to_speech_tpu.models.decoder import Decoder

    shard = Decoder._mesh_shard_batch(mesh, batch)
    assert shard == (batch // mesh.size if scheme == "flatten"
                     else batch // mesh_shape[0])
    model_dp = Tacotron(hp, train=True, mesh=mesh)

    def loss_fn(model):
        def f(params):
            k = jax.random.PRNGKey(3)
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                text, lengths, target, tlen, speakers, languages,
                1.0, k, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(k, 1)})
            return (jnp.mean((out["pre_prediction"] - target) ** 2)
                    + 0.1 * jnp.mean(out["stop_token"] ** 2)
                    + 0.05 * jnp.mean(out["alignment"] ** 2))
        return f

    g_single = jax.grad(loss_fn(model_single))(variables["params"])
    g_dp = jax.grad(loss_fn(model_dp))(variables["params"])
    for (pa, va), (_, vb) in zip(
            jax.tree_util.tree_leaves_with_path(g_single),
            jax.tree_util.tree_leaves_with_path(g_dp)):
        a, b = np.asarray(va), np.asarray(vb)
        scale = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() / scale < 1e-4, (
            jax.tree_util.keystr(pa), np.abs(a - b).max(), scale)
