"""Numerical parity against the PyTorch reference implementation.

Weights are ported from live reference modules (/root/reference, torch CPU)
into this framework's pytrees, then outputs are compared component by
component and for the full eval-mode forward:

- ConvBlock / HighwayConvBlock           (reference modules/layers.py:50-153)
- Conv1dGenerated / BatchNorm1dGenerated (reference modules/generated.py:7-96)
- ZoneoutLSTMCell eval mode              (reference modules/layers.py:18-34)
- LocationSensitiveAttention single step (reference modules/attention.py:39-86)
- Decoder, full teacher-forced unroll    (reference modules/tacotron2.py:148-214)
- Tacotron full forward, generated enc.  (reference modules/tacotron2.py:355-385)
- Tacotron full forward, simple enc.     (reference modules/encoder.py:9-45)
- TacotronLoss                           (reference modules/tacotron2.py:459-485)

Determinism: every stochastic reference path is disabled for comparison —
torch modules run in eval() mode, ``hp.dropout = 0`` kills the always-on
prenet dropout (reference tacotron2.py:40), zoneout eval mode is a
deterministic interpolation, and teacher forcing ratio 1.0 makes the
per-step Bernoulli draws constant.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REFERENCE_PATH = "/root/reference"

# Tiny shared topology (mirrors generated_switching's structure).
TINY = dict(
    embedding_dimension=16,
    encoder_type="generated",
    encoder_dimension=16,
    encoder_blocks=2,
    encoder_kernel_size=5,
    generator_dim=6,
    generator_bottleneck_dim=3,
    prenet_dimension=8,
    prenet_layers=2,
    attention_type="location_sensitive",
    attention_dimension=12,
    attention_kernel_size=5,
    attention_location_dimension=4,
    decoder_dimension=16,
    decoder_regularization="zoneout",
    zoneout_hidden=0.1,
    zoneout_cell=0.1,
    dropout_hidden=0.1,
    postnet_dimension=8,
    postnet_blocks=3,
    postnet_kernel_size=5,
    dropout=0.0,
    predict_linear=False,
    multi_speaker=True,
    multi_language=True,
    speaker_embedding_dimension=4,
    language_embedding_dimension=3,
    input_language_embedding=4,
    reversal_classifier=True,
    reversal_classifier_type="reversal",
    reversal_classifier_dim=10,
    reversal_classifier_w=0.125,
    reversal_gradient_clipping=0.25,
    stop_frames=2,
    num_mels=5,
    num_fft=32,
    characters="abcdefgh",
    use_punctuation=False,
    use_phonemes=False,
    case_sensitive=True,
    languages=["de", "fr", "zh"],
    speaker_number=4,
    language_number=3,
    guided_attention_loss=True,
    guided_attention_steps=10,
    guided_attention_toleration=0.25,
    guided_attention_gain=1.00025,
    max_output_length=50,
)


@pytest.fixture(scope="module")
def ref():
    """Import the reference (utils first: circular import) and expose it."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import utils  # noqa: F401  (must import before modules.tacotron2)
    import modules.attention as attention
    import modules.classifier as classifier
    import modules.encoder as encoder
    import modules.generated as generated
    import modules.layers as layers
    import modules.tacotron2 as tacotron2
    from params.params import Params

    import types

    return types.SimpleNamespace(
        Params=Params,
        layers=layers,
        generated=generated,
        attention=attention,
        encoder=encoder,
        classifier=classifier,
        tacotron2=tacotron2,
    )


def set_ref_hp(Params, **overrides):
    for k, v in {**TINY, **overrides}.items():
        setattr(Params, k, v)


def my_hp(**overrides):
    from multilingual_text_to_speech_tpu.config import HParams

    hp = HParams()
    for k, v in {**TINY, **overrides}.items():
        setattr(hp, k, v)
    return hp


# ---------------------------------------------------------------------------
# weight-porting helpers: the library's interop module IS the porting logic
# (promoted out of this test in round 3 for the user-facing checkpoint
# importer CLI); the parity suite drives the same code paths.
# ---------------------------------------------------------------------------

from multilingual_text_to_speech_tpu.interop.torch_port import (  # noqa: E402
    N_GENERATED_LAYERS,
    bilstm,
    conv_kernel,
    dense,
    fused_lstm,
    gen_kernel_dense,
    lin_kernel,
    merge_into as override,
    port_convblock,
    port_decoder,
    port_generated_block,
    port_forward_attention,
    port_lsa,
    port_state_dict,
    port_tacotron,
    t2j,
)


def randomize_running_stats(module):
    """Give torch BatchNorm buffers non-trivial values so eval-mode parity
    actually exercises the running statistics."""
    g = torch.Generator().manual_seed(7)
    for name, buf in module.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
        elif name.endswith("running_var"):
            buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)


def unfreeze(variables):
    from flax.core import unfreeze as _unfreeze

    return jax.tree_util.tree_map(lambda x: x, _unfreeze(variables))


def report(name, mine, theirs, atol, rtol=1e-5):
    mine = np.asarray(mine)
    theirs = np.asarray(theirs)
    diff = float(np.max(np.abs(mine - theirs))) if mine.size else 0.0
    print(f"parity[{name}]: max_abs_diff={diff:.3e}")
    np.testing.assert_allclose(mine, theirs, atol=atol, rtol=rtol)


# ---------------------------------------------------------------------------
# component tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kernel,groups", [(5, 1), (4, 1), (3, 2)])
def test_convblock_parity(ref, kernel, groups):
    from multilingual_text_to_speech_tpu.models.layers import ConvBlock

    torch.manual_seed(0)
    cin, cout, b, t = 8, 12, 3, 17
    tblock = ref.layers.ConvBlock(
        cin, cout, kernel, dropout=0.0, activation="relu",
        dilation=2, groups=groups,
    ).eval()
    randomize_running_stats(tblock)

    x = torch.randn(b, cin, t)
    with torch.no_grad():
        want = tblock(x).numpy().transpose(0, 2, 1)  # -> [B, T, C]

    block = ConvBlock(output_channels=cout, kernel=kernel, dropout=0.0,
                      activation="relu", dilation=2, groups=groups, train=False)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    variables = unfreeze(block.init(jax.random.PRNGKey(0), xj))
    ported_p, ported_s = port_convblock(tblock.state_dict(), "")
    variables["params"] = override(variables["params"], ported_p, strict=True)
    variables["batch_stats"] = override(
        variables["batch_stats"], ported_s, strict=True
    )
    got = block.apply(variables, xj)
    report(f"convblock_k{kernel}_g{groups}", got, want, atol=1e-5)


def test_highway_convblock_parity(ref):
    from multilingual_text_to_speech_tpu.models.layers import HighwayConvBlock

    torch.manual_seed(1)
    c, b, t, groups = 12, 4, 15, 2
    tblock = ref.layers.HighwayConvBlock(
        c, c, 3, dropout=0.0, dilation=3, groups=groups
    ).eval()
    randomize_running_stats(tblock)

    x = torch.randn(b, c, t)
    with torch.no_grad():
        want = tblock(x).numpy().transpose(0, 2, 1)

    block = HighwayConvBlock(output_channels=c, kernel=3, dropout=0.0,
                             dilation=3, groups=groups, train=False)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    variables = unfreeze(block.init(jax.random.PRNGKey(0), xj))
    ported_p, ported_s = port_convblock(tblock.state_dict(), "")
    variables["params"] = override(
        variables["params"], {"ConvBlock_0": ported_p}, strict=True
    )
    variables["batch_stats"] = override(
        variables["batch_stats"], {"ConvBlock_0": ported_s}, strict=True
    )
    got = block.apply(variables, xj)
    report("highway_convblock", got, want, atol=1e-5)


def test_conv1d_generated_parity(ref):
    from multilingual_text_to_speech_tpu.models.layers import Conv1dGenerated

    torch.manual_seed(2)
    g, cin, cout, k, b, t = 3, 9, 15, 3, 6, 11
    emb_dim, bottleneck = 6, 4
    tconv = ref.generated.Conv1dGenerated(
        emb_dim, bottleneck, cin, cout, k, padding=(k - 1) // 2,
        dilation=1, groups=g, bias=True,
    ).eval()
    e = torch.randn(g, emb_dim)
    x = torch.randn(b, cin, t)
    with torch.no_grad():
        want = tconv(e, x).numpy().transpose(0, 2, 1)

    conv = Conv1dGenerated(bottleneck_dim=bottleneck, in_channels=cin,
                           out_channels=cout, kernel=k, groups=g, bias=True)
    ej = jnp.asarray(e.numpy())
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    variables = unfreeze(conv.init(jax.random.PRNGKey(0), ej, xj))
    sd = tconv.state_dict()
    ported = {
        "bottleneck": dense(sd, "_bottleneck"),
        "kernel": gen_kernel_dense(sd, "_kernel", cout // g, cin // g, k),
        "bias": dense(sd, "_bias"),
    }
    variables["params"] = override(variables["params"], ported, strict=True)
    got = conv.apply(variables, ej, xj)
    report("conv1d_generated", got, want, atol=1e-5)


def test_batchnorm1d_generated_parity(ref):
    from multilingual_text_to_speech_tpu.models.layers import BatchNorm1dGenerated

    torch.manual_seed(3)
    g, c, b, t = 3, 12, 6, 9
    emb_dim, bottleneck = 6, 4
    tbn = ref.generated.BatchNorm1dGenerated(
        emb_dim, bottleneck, c, groups=g
    ).eval()
    randomize_running_stats(tbn)
    e = torch.randn(g, emb_dim)
    x = torch.randn(b, c, t)
    with torch.no_grad():
        want = tbn(e, x).numpy().transpose(0, 2, 1)

    bn = BatchNorm1dGenerated(bottleneck_dim=bottleneck, num_features=c,
                              groups=g, train=False)
    ej = jnp.asarray(e.numpy())
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    variables = unfreeze(bn.init(jax.random.PRNGKey(0), ej, xj))
    sd = tbn.state_dict()
    variables["params"] = override(
        variables["params"],
        {"bottleneck": dense(sd, "_bottleneck"), "affine": dense(sd, "_affine")},
        strict=True,
    )
    variables["batch_stats"] = override(
        variables["batch_stats"],
        {"mean": t2j(sd["running_mean"]), "var": t2j(sd["running_var"])},
        strict=True,
    )
    got = bn.apply(variables, ej, xj)
    report("batchnorm1d_generated", got, want, atol=1e-5)


def test_zoneout_cell_eval_parity(ref):
    from multilingual_text_to_speech_tpu.models.rnn import ZoneoutLSTMCell

    torch.manual_seed(4)
    in_dim, hid, b = 10, 8, 5
    tcell = ref.layers.ZoneoutLSTMCell(in_dim, hid, 0.1, 0.1).eval()
    x = torch.randn(b, in_dim)
    h = torch.randn(b, hid)
    c = torch.randn(b, hid)
    with torch.no_grad():
        want_h, want_c = tcell(x, h, c)

    cell = ZoneoutLSTMCell(hid, 0.1, 0.1)
    args = (jnp.asarray(x.numpy()), jnp.asarray(h.numpy()),
            jnp.asarray(c.numpy()), jax.random.PRNGKey(0), False)
    variables = unfreeze(cell.init(jax.random.PRNGKey(0), *args))
    sd = {f"cell.{k}": v for k, v in tcell.state_dict().items()}
    variables["params"] = override(
        variables["params"], fused_lstm(sd, "cell"), strict=True
    )
    got_h, got_c = cell.apply(variables, *args)
    report("zoneout_h", got_h, want_h.numpy(), atol=1e-6)
    report("zoneout_c", got_c, want_c.numpy(), atol=1e-6)


def test_location_sensitive_attention_step_parity(ref):
    from multilingual_text_to_speech_tpu.models.attention import (
        LocationSensitiveAttention,
    )

    torch.manual_seed(5)
    b, t, mem_dim, q_dim, a_dim, loc_ch, k = 4, 13, 10, 8, 12, 4, 5
    tatt = ref.attention.LocationSensitiveAttention(
        k, loc_ch, False, a_dim, q_dim, mem_dim
    ).eval()
    memory = torch.randn(b, t, mem_dim)
    query = torch.randn(b, q_dim)
    lengths = torch.tensor([13, 9, 7, 4])
    mask = torch.arange(t)[None, :] < lengths[:, None]

    with torch.no_grad():
        tatt.reset(memory, b, t, torch.device("cpu"))
        # seed non-trivial cumulative weights, as mid-decode
        cum = torch.rand(b, t) * mask
        tatt._prev_weights = cum.clone()
        want_ctx, want_w = tatt(query, memory, mask, None)
        want_cum = tatt._prev_weights

    att = LocationSensitiveAttention(
        representation_dim=a_dim, kernel_size=k, location_channels=loc_ch
    )
    sd = tatt.state_dict()
    memory_j = jnp.asarray(memory.numpy())
    mt_j = memory_j @ jnp.asarray(lin_kernel(sd["_memory.weight"]))
    state = {"weights": jnp.asarray(cum.numpy())}
    args = (jnp.asarray(query.numpy()), memory_j, mt_j,
            jnp.asarray(mask.numpy()), state, jnp.zeros((b, 1)))
    variables = unfreeze(att.init(jax.random.PRNGKey(0), *args))
    ported = port_lsa({f"_attention.{kk}": v for kk, v in sd.items()})
    variables["params"] = override(variables["params"], ported, strict=True)
    got_ctx, got_w, new_state = att.apply(variables, *args)
    report("lsa_context", got_ctx, want_ctx.numpy(), atol=1e-5)
    report("lsa_weights", got_w, want_w.numpy(), atol=1e-5)
    report("lsa_cumulative", new_state["weights"], want_cum.numpy(), atol=1e-5)


@pytest.mark.parametrize("transition", [False, True])
def test_forward_attention_step_parity(ref, transition):
    """Forward attention (+transition agent) single step vs the live torch
    reference (modules/attention.py:89-160).  The reference's
    ForwardAttentionWithTransition.reset drops the ``device`` argument (an
    upstream arity bug — it would crash if called), so the test seeds the
    recurrence state directly on both sides, as mid-decode."""
    from multilingual_text_to_speech_tpu.models.attention import (
        ForwardAttention,
        ForwardAttentionWithTransition,
    )

    torch.manual_seed(7)
    b, t, mem_dim, q_dim, a_dim, out_dim = 4, 13, 10, 8, 12, 6
    if transition:
        tatt = ref.attention.ForwardAttentionWithTransition(
            out_dim, a_dim, q_dim, mem_dim).eval()
    else:
        tatt = ref.attention.ForwardAttention(a_dim, q_dim, mem_dim).eval()
    memory = torch.randn(b, t, mem_dim)
    query = torch.randn(b, q_dim)
    prev_out = torch.randn(b, out_dim)
    lengths = torch.tensor([13, 9, 7, 4])
    mask = torch.arange(t)[None, :] < lengths[:, None]
    prev_w = torch.rand(b, t) * mask
    prev_w = prev_w / prev_w.sum(-1, keepdim=True)
    t_prob = torch.rand(b, 1)

    with torch.no_grad():
        # seed state without reset() (see docstring re: upstream arity bug)
        tatt._memory_transform = tatt._memory(memory)
        tatt._prev_weights = prev_w.clone()
        tatt._prev_context = torch.zeros(b, mem_dim)
        if transition:
            tatt._t_prob = t_prob.clone()
        want_ctx, want_w = tatt(query, memory, mask, prev_out)

    att = (ForwardAttentionWithTransition if transition
           else ForwardAttention)(representation_dim=a_dim)
    sd = tatt.state_dict()
    memory_j = jnp.asarray(memory.numpy())
    mt_j = memory_j @ jnp.asarray(lin_kernel(sd["_memory.weight"]))
    state = {"weights": jnp.asarray(prev_w.numpy())}
    if transition:
        state["t_prob"] = jnp.asarray(t_prob.numpy())
    args = (jnp.asarray(query.numpy()), memory_j, mt_j,
            jnp.asarray(mask.numpy()), state,
            jnp.asarray(prev_out.numpy()))
    variables = unfreeze(att.init(jax.random.PRNGKey(0), *args))
    ported = port_forward_attention(
        {f"_attention.{kk}": v for kk, v in sd.items()},
        transition=transition)
    variables["params"] = override(variables["params"], ported, strict=True)
    got_ctx, got_w, new_state = att.apply(variables, *args)
    tag = "fwd_trans" if transition else "fwd"
    report(f"{tag}_context", got_ctx, want_ctx.numpy(), atol=1e-5)
    report(f"{tag}_weights", got_w, want_w.numpy(), atol=1e-5)
    if transition:
        report(f"{tag}_t_prob", new_state["t_prob"],
               tatt._t_prob.numpy(), atol=1e-5)


# ---------------------------------------------------------------------------
# decoder + full model
# ---------------------------------------------------------------------------

def _batch(hp, b, t_len, frames, seed=0):
    rng = np.random.RandomState(seed)
    n_langs = len(hp.languages)
    lengths = np.sort(
        np.clip(rng.randint(t_len // 2, t_len + 1, b), 2, t_len)
    )[::-1].copy()
    text = rng.randint(1, hp.total_symbols(), (b, t_len))
    for i, l in enumerate(lengths):
        text[i, l:] = 0  # PAD
    target = rng.randn(b, frames, hp.num_mels).astype(np.float32)
    target_lengths = np.clip(rng.randint(frames // 2, frames + 1, b), 4, frames)
    speakers = rng.randint(0, hp.speaker_number, b)
    languages = np.arange(b) % n_langs  # language-interleaved
    return text, lengths, target, target_lengths, speakers, languages


def test_decoder_teacher_forced_parity(ref):
    """Full teacher-forced unroll: prenet, both zoneout LSTMs, LSA, heads,
    speaker/language conditioning (reference tacotron2.py:148-214)."""
    from multilingual_text_to_speech_tpu.models.decoder import Decoder

    set_ref_hp(ref.Params)
    hp = my_hp()
    torch.manual_seed(6)
    tmodel = ref.tacotron2.Tacotron().eval()

    b, t_len, frames = 6, 11, 9
    text, lengths, target, target_lengths, speakers, languages = _batch(
        hp, b, t_len, frames
    )
    encoded = np.random.RandomState(1).randn(
        b, t_len, hp.encoder_dimension
    ).astype(np.float32)

    with torch.no_grad():
        want_spec, want_stop, want_align = tmodel._decoder(
            torch.tensor(encoded),
            torch.tensor(lengths),
            torch.tensor(target.transpose(0, 2, 1)),  # ref layout [B, M, F]
            1.0,
            torch.tensor(speakers).unsqueeze(1).expand(-1, t_len),
            torch.tensor(languages).unsqueeze(1).expand(-1, t_len),
        )

    decoder = Decoder(hp, train=False)
    args = (jnp.asarray(encoded), jnp.asarray(lengths), jnp.asarray(target),
            1.0, jnp.asarray(speakers), jnp.asarray(languages),
            jax.random.PRNGKey(0))
    variables = unfreeze(decoder.init(jax.random.PRNGKey(0), *args))
    variables["params"] = override(
        variables["params"], port_decoder(tmodel.state_dict(), hp), strict=True
    )
    got_spec, got_stop, got_align = decoder.apply(variables, *args)
    report("decoder_spec", got_spec, want_spec.numpy(), atol=2e-4, rtol=1e-3)
    report("decoder_stop", got_stop, want_stop.numpy(), atol=2e-4, rtol=1e-3)
    report("decoder_align", got_align, want_align.numpy(), atol=2e-4, rtol=1e-3)


def _full_forward_parity(ref, encoder_type, seed, extra=None):
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron

    multi = encoder_type != "simple"
    overrides = dict(encoder_type=encoder_type)
    if not multi:
        overrides.update(
            multi_speaker=False, multi_language=False,
            reversal_classifier=False, languages=["en"], language_number=1,
        )
    overrides.update(extra or {})
    set_ref_hp(ref.Params, **overrides)
    hp = my_hp(**overrides)

    torch.manual_seed(seed)
    tmodel = ref.tacotron2.Tacotron().eval()
    randomize_running_stats(tmodel)
    # The reference's xavier_uniform_ re-randomizes the padding_idx=0 row
    # AFTER Embedding construction (tacotron2.py:237-239), so its PAD
    # embedding is a frozen non-zero vector (padding_idx only zeroes the
    # gradient).  This framework zeroes PAD embeddings outright
    # (models/tacotron.py:166-167); align the torch side to the intended
    # padding semantics for comparison.
    with torch.no_grad():
        tmodel._embedding.weight[0] = 0.0

    b, t_len, frames = 6, 11, 9
    text, lengths, target, target_lengths, speakers, languages = _batch(
        hp, b, t_len, frames
    )
    if encoder_type in ("generated", "convolutional"):
        # Deliberate divergence: this framework's grouped encoders mask
        # activations beyond each sample's length after every block (bucket-
        # padding invariance, models/encoder.py:165-178), while the reference
        # lets PAD positions bleed into boundary frames through the k=3
        # highway convs (modules/encoder.py:196-211 applies no masking).
        # Parity is therefore asserted on unpadded inputs; the masked
        # behavior is pinned by test_variants.py's padding-invariance tests.
        lengths[:] = t_len
        text[:, :] = np.maximum(text, 1)

    # shared/separate encoders consume 3-D per-character language weights in
    # the reference (MultiEncoder/ConditionalEncoder index dim 2,
    # modules/encoder.py:67-97); 1-D index specs would crash there.  This
    # framework normalizes 1-D/2-D/3-D specs itself (tacotron.py:45-59), so
    # hand torch the equivalent one-hot and keep 1-D on our side.
    torch_languages = None
    if multi:
        torch_languages = torch.tensor(languages)
        if encoder_type in ("shared", "separate"):
            torch_languages = torch.nn.functional.one_hot(
                torch_languages[:, None].expand(-1, t_len),
                hp.language_number,
            ).float()

    def run_torch(sl):
        with torch.no_grad():
            return tmodel(
                torch.tensor(text[sl]),
                torch.tensor(lengths[sl]),
                torch.tensor(target.transpose(0, 2, 1)[sl]),
                torch.tensor(target_lengths[sl]),
                torch.tensor(speakers[sl]) if multi else None,
                torch_languages[sl] if multi else None,
                teacher_forcing_ratio=1.0,
            )

    if encoder_type == "separate":
        # The reference MultiEncoder's mixing weights broadcast only at
        # batch size 1 (modules/encoder.py:92-96 flattens to [B*T, 1]);
        # any larger batch crashes.  Eval mode is sample-independent, so
        # run the reference per sample and stack — this framework runs the
        # whole batch at once.
        per_sample = [run_torch(slice(i, i + 1)) for i in range(b)]
        want = [
            (torch.cat(outs) if outs[0] is not None else None)
            for outs in zip(*per_sample)
        ]
    else:
        want = run_torch(slice(None))
    (want_post, want_pre, want_stop, want_align,
     want_spk, want_enc) = want

    model = Tacotron(hp, train=False)
    args = (jnp.asarray(text), jnp.asarray(lengths), jnp.asarray(target),
            jnp.asarray(target_lengths),
            jnp.asarray(speakers) if multi else None,
            jnp.asarray(languages) if multi else None,
            1.0, jax.random.PRNGKey(0))
    variables = unfreeze(model.init(jax.random.PRNGKey(0), *args))
    variables_p = port_tacotron(tmodel, hp)
    variables["params"] = override(
        variables["params"], variables_p["params"], strict=True
    )
    variables["batch_stats"] = override(
        variables["batch_stats"], variables_p["batch_stats"], strict=True
    )
    out = model.apply(variables, *args)

    tag = f"full_{encoder_type}"
    report(f"{tag}_encoder", out["encoder_output"],
           want_enc.numpy(), atol=1e-4, rtol=1e-3)
    if multi:
        report(f"{tag}_speaker_pred", out["speaker_prediction"],
               want_spk.numpy(), atol=1e-4, rtol=1e-3)
    report(f"{tag}_pre", out["pre_prediction"],
           want_pre.numpy().transpose(0, 2, 1), atol=5e-4, rtol=1e-3)
    report(f"{tag}_post", out["post_prediction"],
           want_post.numpy().transpose(0, 2, 1), atol=5e-4, rtol=1e-3)
    report(f"{tag}_stop", out["stop_token"], want_stop.numpy(),
           atol=5e-4, rtol=1e-3)
    report(f"{tag}_align", out["alignment"], want_align.numpy(),
           atol=5e-4, rtol=1e-3)


def test_full_forward_generated_encoder_parity(ref):
    """Eval-mode forward of the paper's headline model (generated encoder,
    multi-speaker, reversal classifier, conv postnet)."""
    _full_forward_parity(ref, "generated", seed=8)


def test_full_forward_simple_encoder_parity(ref):
    """Eval-mode forward of the monolingual model (conv+BiLSTM encoder),
    covering packed-BiLSTM equivalence (reference modules/encoder.py:35-45)."""
    _full_forward_parity(ref, "simple", seed=9)


def test_full_forward_shared_encoder_parity(ref):
    """Eval-mode forward with the ConditionalEncoder: language embedding
    concatenated per character, then the vanilla encoder (reference
    modules/encoder.py:48-71)."""
    _full_forward_parity(ref, "shared", seed=10)


def test_full_forward_separate_encoder_parity(ref):
    """Eval-mode forward with the MultiEncoder: one vanilla encoder per
    language mixed by per-character weights (reference
    modules/encoder.py:74-97; ours is a single vmapped encoder)."""
    _full_forward_parity(ref, "separate", seed=11)


def test_full_forward_convolutional_encoder_parity(ref):
    """Eval-mode forward with the plain grouped ConvolutionalEncoder
    (reference modules/encoder.py:100-156)."""
    _full_forward_parity(ref, "convolutional", seed=12)


def test_full_forward_cbhg_postnet_parity(ref):
    """Eval-mode forward with predict_linear=True: the CBHG postnet maps
    mels to linear spectrogram frames (reference modules/cbhg.py:8-69,
    factory tacotron2.py:335-345)."""
    _full_forward_parity(
        ref, "simple", seed=13,
        extra=dict(
            predict_linear=True,
            cbhg_bank_kernels=4,
            cbhg_bank_dimension=8,
            cbhg_projection_dimension=8,
            cbhg_projection_kernel_size=3,
            cbhg_highway_dimension=8,
            cbhg_rnn_dim=8,
            cbhg_dropout=0.0,
        ),
    )


def test_tacotron_loss_parity(ref):
    from multilingual_text_to_speech_tpu.models.tacotron import tacotron_loss

    set_ref_hp(ref.Params)
    hp = my_hp()
    rng = np.random.RandomState(11)
    b, t_len, frames = 4, 11, 9

    lengths = np.array([11, 9, 7, 5])
    target_lengths = np.array([9, 8, 6, 5])
    pre_p = rng.randn(b, frames, hp.num_mels).astype(np.float32)
    post_p = rng.randn(b, frames, hp.num_mels).astype(np.float32)
    pre_t = rng.randn(b, frames, hp.num_mels).astype(np.float32)
    post_t = rng.randn(b, frames, hp.num_mels).astype(np.float32)
    stop_p = rng.randn(b, frames).astype(np.float32)
    stop_t = (rng.rand(b, frames) > 0.7).astype(np.float32)
    align = rng.rand(b, frames, t_len).astype(np.float32)
    align /= align.sum(-1, keepdims=True)
    speakers = rng.randint(0, hp.speaker_number, b)
    spk_pred = rng.randn(b, t_len, hp.speaker_number).astype(np.float32)

    tloss = ref.tacotron2.TacotronLoss(
        hp.guided_attention_steps, hp.guided_attention_toleration,
        hp.guided_attention_gain,
    )
    with torch.no_grad():
        want_total, want_items = tloss(
            torch.tensor(lengths), torch.tensor(target_lengths),
            torch.tensor(pre_p.transpose(0, 2, 1)),
            torch.tensor(pre_t.transpose(0, 2, 1)),
            torch.tensor(post_p.transpose(0, 2, 1)),
            torch.tensor(post_t.transpose(0, 2, 1)),
            torch.tensor(stop_p), torch.tensor(stop_t),
            torch.tensor(align),
            torch.tensor(speakers), torch.tensor(spk_pred),
            None, None,
        )

    outputs = {
        "pre_prediction": jnp.asarray(pre_p),
        "post_prediction": jnp.asarray(post_p),
        "stop_token": jnp.asarray(stop_p),
        "alignment": jnp.asarray(align),
        "speaker_prediction": jnp.asarray(spk_pred),
        "encoder_output": None,
    }
    got_total, got_items = tacotron_loss(
        outputs, hp=hp,
        input_lengths=jnp.asarray(lengths),
        target_lengths=jnp.asarray(target_lengths),
        pre_target=jnp.asarray(pre_t), post_target=jnp.asarray(post_t),
        stop_target=jnp.asarray(stop_t), speakers=jnp.asarray(speakers),
        guided_att_variance=hp.guided_attention_toleration,
    )
    for key, mine_key in [("mel_pre", "mel_pre"), ("mel_pos", "mel_pos"),
                          ("stop_token", "stop_token"),
                          ("lang_class", "lang_class"),
                          ("guided_att", "guided_att")]:
        report(f"loss_{key}", got_items[mine_key],
               float(want_items[key]), atol=1e-5, rtol=1e-5)
    report("loss_total", got_total, float(want_total), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("encoder_type,extra", [
    ("generated", {}),
    ("convolutional", dict(
        predict_linear=True,
        cbhg_bank_kernels=4, cbhg_bank_dimension=8,
        cbhg_projection_dimension=8, cbhg_projection_kernel_size=3,
        cbhg_highway_dimension=8, cbhg_rnn_dim=8, cbhg_dropout=0.0,
    )),
])
def test_checkpoint_import_roundtrip(ref, tmp_path, encoder_type, extra):
    """User-facing importer CLI: a reference-format torch checkpoint file
    (epoch/model/optimizer/scheduler/parameters/criterion, train.py:302-308,
    with DataParallel 'module.' prefixes) converts to this framework's
    checkpoint, and the restored Synthesizer model reproduces the torch
    model's eval-mode teacher-forced forward at float32 epsilon.  The second
    case covers the grouped convolutional encoder + CBHG linear postnet
    (predict_linear checkpoints, tacotron2.py:284)."""
    from multilingual_text_to_speech_tpu.cli.import_reference_checkpoint import (
        main as import_main,
    )
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron
    from multilingual_text_to_speech_tpu.synthesis import Synthesizer

    set_ref_hp(ref.Params, encoder_type=encoder_type, **extra)
    hp = my_hp(encoder_type=encoder_type, **extra)
    torch.manual_seed(11)
    tmodel = ref.tacotron2.Tacotron().eval()
    randomize_running_stats(tmodel)
    with torch.no_grad():
        tmodel._embedding.weight[0] = 0.0  # intended padding semantics

    # reference checkpoint format, incl. DataParallel prefixes
    src = str(tmp_path / "ref_ckpt")
    torch.save({
        "epoch": 17,
        "model": {f"module.{k}": v for k, v in tmodel.state_dict().items()},
        "optimizer": {},
        "scheduler": {},
        "parameters": ref.Params.state_dict(),
        "criterion": {"_g": 0.125, "_g_steps": 7},
    }, src)

    out = str(tmp_path / "imported.msgpack")
    assert import_main([src, "-o", out]) == 0

    synth = Synthesizer.from_checkpoint(out)
    assert synth.hp.encoder_type == encoder_type
    assert synth.hp.languages == hp.languages

    # criterion state must carry the reference guided-attention schedule
    from multilingual_text_to_speech_tpu.training.checkpoint import (
        load_checkpoint,
    )
    payload = load_checkpoint(out)
    assert payload["criterion"]["guided_att_variance"] == pytest.approx(0.125)
    assert int(payload["criterion"]["guided_att_steps"]) == 7
    assert int(payload["epoch"]) == 17

    # teacher-forced eval forward through the RESTORED variables vs torch
    b, t_len, frames = 6, 11, 9
    text, lengths, target, target_lengths, speakers, languages = _batch(
        hp, b, t_len, frames, seed=4
    )
    lengths[:] = t_len                    # unpadded (mask divergence note)
    text[:, :] = np.maximum(text, 1)
    with torch.no_grad():
        want = tmodel(
            torch.tensor(text), torch.tensor(lengths),
            torch.tensor(target.transpose(0, 2, 1)),
            torch.tensor(target_lengths),
            torch.tensor(speakers), torch.tensor(languages),
            teacher_forcing_ratio=1.0,
        )
    model = Tacotron(synth.hp, train=False)
    out_mine = model.apply(
        synth.variables, jnp.asarray(text), jnp.asarray(lengths),
        jnp.asarray(target), jnp.asarray(target_lengths),
        jnp.asarray(speakers), jnp.asarray(languages),
        1.0, jax.random.PRNGKey(0))
    report("import_post", out_mine["post_prediction"],
           want[0].numpy().transpose(0, 2, 1), atol=5e-4, rtol=1e-3)
    report("import_stop", out_mine["stop_token"], want[2].numpy(),
           atol=5e-4, rtol=1e-3)
    report("import_align", out_mine["alignment"], want[3].numpy(),
           atol=5e-4, rtol=1e-3)
