"""Encoder/attention/decoder/Tacotron integration tests on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multilingual_text_to_speech_tpu.config import HParams
from multilingual_text_to_speech_tpu.models.attention import (
    ForwardAttention,
    ForwardAttentionWithTransition,
    LocationSensitiveAttention,
    init_attention_state,
)
from multilingual_text_to_speech_tpu.models.classifier import (
    ReversalClassifier,
    gradient_reversal,
    reversal_classifier_loss,
)
from multilingual_text_to_speech_tpu.models.encoder import (
    ConditionalEncoder,
    ConvolutionalEncoder,
    Encoder,
    GeneratedConvolutionalEncoder,
    MultiEncoder,
)
from multilingual_text_to_speech_tpu.models.tacotron import (
    Tacotron,
    TacotronLossState,
    guided_attention_loss,
    tacotron_loss,
)

KEY = jax.random.PRNGKey(0)


def tiny_hp(**over):
    hp = HParams()
    hp.embedding_dimension = 16
    hp.encoder_dimension = 16
    hp.encoder_blocks = 2
    hp.encoder_kernel_size = 3
    hp.prenet_dimension = 8
    hp.attention_dimension = 8
    hp.attention_kernel_size = 5
    hp.attention_location_dimension = 4
    hp.decoder_dimension = 16
    hp.postnet_dimension = 8
    hp.postnet_blocks = 2
    hp.num_mels = 5
    hp.num_fft = 16
    hp.generator_dim = 4
    hp.generator_bottleneck_dim = 2
    hp.cbhg_bank_kernels = 3
    hp.cbhg_bank_dimension = 8
    hp.cbhg_projection_dimension = 8
    hp.cbhg_highway_dimension = 8
    hp.cbhg_rnn_dim = 8
    for k, v in over.items():
        setattr(hp, k, v)
    return hp


# ---------------------------------------------------------------------------
# encoders
# ---------------------------------------------------------------------------

def test_encoder_masks_padding():
    m = Encoder(output_dim=8, num_blocks=1, kernel_size=3, dropout=0.0)
    x = jax.random.normal(KEY, (2, 10, 6))
    lengths = jnp.array([10, 4])
    v = m.init(KEY, x, lengths)
    y = m.apply(v, x, lengths)
    assert y.shape == (2, 10, 8)
    assert np.allclose(np.asarray(y[1, 4:]), 0.0)
    assert not np.allclose(np.asarray(y[1, :4]), 0.0)


def test_encoder_backward_lstm_respects_lengths():
    # output at t=0 for a short sample must not depend on padding content
    m = Encoder(output_dim=8, num_blocks=1, kernel_size=1, dropout=0.0)
    x = jax.random.normal(KEY, (1, 8, 6))
    lengths = jnp.array([5])
    v = m.init(KEY, x, lengths)
    y1 = m.apply(v, x, lengths)
    x2 = x.at[:, 5:].set(99.0)  # corrupt padding
    y2 = m.apply(v, x2, lengths)
    np.testing.assert_allclose(np.asarray(y1[:, :5]), np.asarray(y2[:, :5]),
                               atol=1e-4)


def test_conditional_encoder():
    m = ConditionalEncoder(num_langs=3, langs_embedding_dim=4, output_dim=8,
                           num_blocks=1, kernel_size=3, dropout=0.0)
    x = jax.random.normal(KEY, (2, 6, 6))
    langs = jax.nn.one_hot(jnp.array([[0] * 6, [2] * 6]), 3)
    v = m.init(KEY, x, jnp.array([6, 6]), langs)
    y = m.apply(v, x, jnp.array([6, 6]), langs)
    assert y.shape == (2, 6, 8)


def test_multi_encoder_weighted_mix():
    m = MultiEncoder(num_langs=2, output_dim=8, num_blocks=1, kernel_size=3,
                     dropout=0.0)
    x = jax.random.normal(KEY, (2, 6, 6))
    lengths = jnp.array([6, 6])
    one_hot_0 = jax.nn.one_hot(jnp.zeros((2, 6), jnp.int32), 2)
    one_hot_1 = jax.nn.one_hot(jnp.ones((2, 6), jnp.int32), 2)
    v = m.init(KEY, x, lengths, one_hot_0)
    y0 = m.apply(v, x, lengths, one_hot_0)
    y1 = m.apply(v, x, lengths, one_hot_1)
    # different language encoders -> different outputs
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
    # 50/50 mix == average of the two
    mix = m.apply(v, x, lengths, 0.5 * (one_hot_0 + one_hot_1))
    np.testing.assert_allclose(
        np.asarray(mix), 0.5 * (np.asarray(y0) + np.asarray(y1)), atol=1e-5
    )


@pytest.mark.parametrize("cls,kw", [
    (ConvolutionalEncoder, {}),
    (GeneratedConvolutionalEncoder, {"embedding_dim": 4, "bottleneck_dim": 2}),
])
def test_grouped_encoders_shapes_and_inference_mix(cls, kw):
    g = 3
    m = cls(input_dim=6, output_dim=8, dropout=0.0, groups=g, **kw)
    # training: batch divisible by groups, language-interleaved
    x = jax.random.normal(KEY, (6, 7, 6))
    v = m.init(KEY, x)
    y = m.apply(v, x)
    assert y.shape == (6, 7, 8)

    # inference: batch 1 + per-char language weights -> mixed output
    x1 = x[:1]
    w = jnp.zeros((1, 7, g)).at[:, :4, 0].set(1.0).at[:, 4:, 1].set(1.0)
    y1 = m.apply(v, x1, None, w)
    assert y1.shape == (1, 7, 8)


def test_grouped_encoder_group_independence():
    # changing language j's input must not affect other groups' outputs
    g = 2
    m = ConvolutionalEncoder(input_dim=4, output_dim=4, dropout=0.0, groups=g)
    x = jax.random.normal(KEY, (4, 5, 4))
    v = m.init(KEY, x)
    y = m.apply(v, x)
    x2 = x.at[1].set(7.0)  # batch idx 1 = language 1 (interleaved)
    y2 = m.apply(v, x2)
    # language-0 rows (0, 2) unchanged
    np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y2[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(y[2]), np.asarray(y2[2]), atol=1e-5)
    assert not np.allclose(np.asarray(y[1]), np.asarray(y2[1]))


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("att_cls,att_type", [
    (LocationSensitiveAttention, "location_sensitive"),
    (ForwardAttention, "forward"),
    (ForwardAttentionWithTransition, "forward_transition_agent"),
])
def test_attention_step(att_cls, att_type):
    b, t, mem_dim, q_dim = 2, 7, 6, 5
    m = att_cls(representation_dim=8)
    query = jax.random.normal(KEY, (b, q_dim))
    memory = jax.random.normal(jax.random.PRNGKey(1), (b, t, mem_dim))
    memory_transform = jax.random.normal(jax.random.PRNGKey(2), (b, t, 8))
    mask = jnp.array([[True] * 7, [True] * 4 + [False] * 3])
    state = init_attention_state(att_type, b, t)
    prev_out = jax.random.normal(jax.random.PRNGKey(3), (b, 4))

    v = m.init(KEY, query, memory, memory_transform, mask, state, prev_out)
    ctx, w, new_state = m.apply(v, query, memory, memory_transform, mask,
                                state, prev_out)
    assert ctx.shape == (b, mem_dim)
    assert w.shape == (b, t)
    np.testing.assert_allclose(np.asarray(w.sum(1)), 1.0, atol=1e-4)
    # masked positions get (near-)zero weight
    assert np.asarray(w[1, 4:]).max() < 1e-3


def test_lsa_cumulative_weights():
    b, t = 1, 5
    m = LocationSensitiveAttention(representation_dim=8)
    args = (
        jnp.ones((b, 3)),
        jnp.ones((b, t, 4)),
        jnp.zeros((b, t, 8)),
        jnp.ones((b, t), bool),
    )
    state = init_attention_state("location_sensitive", b, t)
    v = m.init(KEY, *args, state, jnp.ones((b, 2)))
    _, w1, s1 = m.apply(v, *args, state, jnp.ones((b, 2)))
    _, w2, s2 = m.apply(v, *args, s1, jnp.ones((b, 2)))
    np.testing.assert_allclose(np.asarray(s2["weights"]),
                               np.asarray(w1 + w2), atol=1e-5)


# ---------------------------------------------------------------------------
# classifier
# ---------------------------------------------------------------------------

def test_gradient_reversal_flips_and_clamps():
    def f(x):
        return jnp.sum(gradient_reversal(x, 1.0, 0.25) * jnp.array([1.0, -10.0]))

    g = jax.grad(f)(jnp.array([0.0, 0.0]))
    # grad 1.0 clamps to 0.25 then negates -> -0.25;
    # grad -10 clamps to -0.25 then negates -> +0.25
    np.testing.assert_allclose(np.asarray(g), [-0.25, 0.25], atol=1e-6)


def test_reversal_classifier_loss_masks_padding():
    b, t, s = 2, 6, 3
    pred = jax.random.normal(KEY, (b, t, s))
    speakers = jnp.array([0, 2])
    full = reversal_classifier_loss(jnp.array([6, 6]), speakers, pred)
    # corrupting masked positions must not change the loss
    pred2 = pred.at[1, 3:].set(55.0)
    part = reversal_classifier_loss(jnp.array([6, 3]), speakers, pred2)
    part_ref = reversal_classifier_loss(jnp.array([6, 3]), speakers, pred)
    np.testing.assert_allclose(float(part), float(part_ref), atol=1e-5)
    assert float(full) > 0


# ---------------------------------------------------------------------------
# guided attention
# ---------------------------------------------------------------------------

def test_guided_attention_matches_loop():
    rng = np.random.RandomState(0)
    b, f, t = 3, 8, 6
    align = rng.rand(b, f, t).astype(np.float32)
    in_len = np.array([6, 4, 5])
    trg_len = np.array([8, 5, 7])
    g = 0.25

    expected = 0.0
    for i in range(b):
        fi, li = trg_len[i], in_len[i]
        w = np.zeros((f, t))
        gf, gl = np.meshgrid(np.arange(fi), np.arange(li), indexing="ij")
        w[:fi, :li] = 1 - np.exp(-((gl / li - gf / fi) ** 2) / (2 * g * g))
        expected += (w * align[i]).sum() / fi
    expected /= b

    got = guided_attention_loss(
        jnp.asarray(align), jnp.asarray(in_len), jnp.asarray(trg_len), g
    )
    np.testing.assert_allclose(float(got), expected, rtol=1e-5)


def test_loss_state_schedule():
    hp = HParams()
    s = TacotronLossState.init(hp)
    s2 = s.update()
    assert s2.guided_att_variance == pytest.approx(0.25 * 1.00025)
    assert s2.guided_att_steps == hp.guided_attention_steps - 1


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def _batch(hp, b=2, t=11, f=9):
    rng = np.random.RandomState(1)
    text = jnp.asarray(rng.randint(3, hp.total_symbols(), (b, t)))
    text_len = jnp.array([t, t - 3])
    target = jnp.asarray(rng.randn(b, f, hp.num_mels).astype(np.float32))
    target_len = jnp.array([f, f - 2])
    stop_target = np.zeros((b, f), np.float32)
    for i, l in enumerate(np.asarray(target_len)):
        stop_target[i, l - hp.stop_frames:] = 1.0
    return text, text_len, target, target_len, jnp.asarray(stop_target)


@pytest.mark.parametrize("encoder_type", [
    "simple", "shared", "separate", "convolutional", "generated",
])
def test_tacotron_forward_all_encoders(encoder_type):
    multi = encoder_type != "simple"
    hp = tiny_hp(
        encoder_type=encoder_type,
        multi_language=multi,
        language_number=2 if multi else 0,
        languages=["de", "fr"] if multi else ["en-us"],
    )
    b = 2
    text, text_len, target, target_len, _ = _batch(hp, b=b)
    langs = jnp.array([0, 1]) if multi else None

    model = Tacotron(hp, train=False)
    variables = model.init(
        KEY, text, text_len, target, target_len, None, langs, 1.0, KEY
    )
    out = model.apply(
        variables, text, text_len, target, target_len, None, langs, 1.0, KEY
    )
    assert out["post_prediction"].shape == (b, 9, hp.num_mels)
    assert out["pre_prediction"].shape == (b, 9, hp.num_mels)
    assert out["stop_token"].shape == (b, 9)
    assert out["alignment"].shape == (b, 9, 11)
    # padded stop logits forced high
    assert float(out["stop_token"][1, -1]) == 1000.0
    # alignment rows are probability distributions
    np.testing.assert_allclose(
        np.asarray(out["alignment"][0].sum(-1)), 1.0, atol=1e-4
    )


def test_tacotron_multispeaker_with_classifier():
    hp = tiny_hp(
        multi_speaker=True, multi_language=True,
        speaker_number=4, language_number=2, languages=["de", "fr"],
        reversal_classifier=True, reversal_classifier_dim=8,
        speaker_embedding_dimension=4, language_embedding_dimension=2,
        encoder_type="generated",
    )
    text, text_len, target, target_len, stop_t = _batch(hp)
    speakers = jnp.array([1, 3])
    langs = jnp.array([0, 1])

    model = Tacotron(hp, train=True)
    variables = model.init(
        KEY, text, text_len, target, target_len, speakers, langs, 1.0, KEY
    )
    out, mut = model.apply(
        variables, text, text_len, target, target_len, speakers, langs, 1.0,
        KEY, mutable=["batch_stats"], rngs={"dropout": KEY},
    )
    assert out["speaker_prediction"].shape == (2, 11, 4)

    total, losses = tacotron_loss(
        out, hp=hp, input_lengths=text_len, target_lengths=target_len,
        pre_target=target, post_target=target, stop_target=stop_t,
        speakers=speakers, guided_att_variance=0.25,
    )
    assert np.isfinite(float(total))
    assert set(losses) == {"mel_pre", "mel_pos", "stop_token", "lang_class",
                           "guided_att"}


def test_tacotron_loss_gradients_flow():
    hp = tiny_hp()
    text, text_len, target, target_len, stop_t = _batch(hp)
    model = Tacotron(hp, train=True)
    variables = model.init(
        KEY, text, text_len, target, target_len, None, None, 1.0, KEY
    )

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            text, text_len, target, target_len, None, None, 1.0, KEY,
            mutable=["batch_stats"], rngs={"dropout": KEY},
        )
        total, _ = tacotron_loss(
            out, hp=hp, input_lengths=text_len, target_lengths=target_len,
            pre_target=target, post_target=target, stop_target=stop_t,
            speakers=None, guided_att_variance=0.25,
        )
        return total

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # every parameter gets some gradient somewhere
    nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0 for g in flat)
    assert nonzero > len(flat) * 0.8


def test_tacotron_inference_chunks():
    hp = tiny_hp(decode_chunk_frames=4)
    text = jnp.asarray(np.random.RandomState(0).randint(3, 20, (1, 7)))
    text_len = jnp.array([7])
    model = Tacotron(hp, train=False)
    target = jnp.zeros((1, 5, hp.num_mels))
    variables = model.init(
        KEY, text, text_len, target, jnp.array([5]), None, None, 0.0, KEY
    )

    memory, mt, mask, carry = model.apply(
        variables, text, text_len, None, None,
        method=Tacotron.encode_for_inference,
    )
    chunks = []
    for i in range(3):
        carry, (spec, stop) = model.apply(
            variables, carry, memory, mt, mask, jax.random.PRNGKey(i), 4,
            method=Tacotron.decode_chunk,
        )
        chunks.append(spec)
        assert spec.shape == (1, 4, hp.num_mels)
    full = jnp.concatenate(chunks, axis=1)
    post = model.apply(variables, full, jnp.array([12]),
                       method=Tacotron.apply_postnet)
    assert post.shape == (1, 12, hp.num_mels)


def test_tacotron_predict_linear_cbhg():
    hp = tiny_hp(predict_linear=True)
    text, text_len, target, target_len, _ = _batch(hp)
    model = Tacotron(hp, train=False)
    variables = model.init(
        KEY, text, text_len, target, target_len, None, None, 1.0, KEY
    )
    out = model.apply(
        variables, text, text_len, target, target_len, None, None, 1.0, KEY
    )
    assert out["post_prediction"].shape == (2, 9, hp.num_fft // 2 + 1)


@pytest.mark.parametrize("encoder_type", ["generated", "convolutional"])
def test_row_group_encode_matches_mixing(encoder_type):
    """Row-group inference (language-sorted batch, each sample through ONLY
    its own language's grouped encoder) must equal the accent-mixing path
    with one-hot weights — including unbalanced language counts and Bp>1
    row groups with padding slots."""
    n_langs = 3
    hp = tiny_hp(
        encoder_type=encoder_type,
        multi_language=True, multi_speaker=True, speaker_number=4,
        language_number=n_langs, languages=["de", "fr", "zh"],
        speaker_embedding_dimension=4, language_embedding_dimension=2,
    )
    b, t = 7, 12
    rng = np.random.RandomState(3)
    text = jnp.asarray(rng.randint(3, hp.total_symbols(), (b, t)), jnp.int32)
    tl = jnp.asarray(rng.randint(4, t + 1, b), jnp.int32)
    spk = jnp.asarray(rng.randint(0, hp.speaker_number, b), jnp.int32)
    langs = np.asarray([0, 2, 1, 0, 0, 2, 1])      # unbalanced

    model = Tacotron(hp, train=False)
    # init via the training path, which needs batch % groups == 0
    bi = n_langs
    target = jnp.zeros((bi, 8, hp.num_mels))
    variables = model.init(
        KEY, text[:bi], tl[:bi], target, jnp.full((bi,), 8, jnp.int32),
        spk[:bi], jnp.arange(bi, dtype=jnp.int32), 0.0, KEY,
    )

    w = jax.nn.one_hot(
        jnp.broadcast_to(jnp.asarray(langs)[:, None], (b, t)), n_langs)
    mix = model.apply(variables, text, tl, spk, w,
                      method=Tacotron.encode_for_inference)

    # language-sorted with per-sample row groups (Bp=1)
    order = np.argsort(langs, kind="stable")
    inv = np.argsort(order)
    gl = jnp.asarray(langs[order], jnp.int32)
    rg = model.apply(variables, text[order], tl[order], spk[order],
                     jnp.asarray(langs[order]), group_langs=gl,
                     method=Tacotron.encode_for_inference)
    np.testing.assert_allclose(np.asarray(rg[0])[inv], np.asarray(mix[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(rg[1])[inv], np.asarray(mix[1]),
                               atol=2e-5)

    # Bp=2 row groups with padding slots (counts 3/2/2 -> padded 4/2/2)
    slots = [0, 3, 4, None, 2, 6, 1, 5]             # sample indices by lang
    gl2 = jnp.asarray([0, 0, 1, 2], jnp.int32)
    text2 = jnp.stack([text[i] if i is not None else jnp.zeros(t, jnp.int32)
                       for i in slots])
    tl2 = jnp.asarray([int(tl[i]) if i is not None else 1 for i in slots])
    spk2 = jnp.asarray([int(spk[i]) if i is not None else 0 for i in slots])
    l2 = jnp.asarray([int(langs[i]) if i is not None else 0 for i in slots])
    rg2 = model.apply(variables, text2, tl2, spk2, l2, group_langs=gl2,
                      method=Tacotron.encode_for_inference)
    got = np.asarray(rg2[0])
    for s_i, i in enumerate(slots):
        if i is None:
            continue
        np.testing.assert_allclose(got[s_i], np.asarray(mix[0])[i], atol=2e-5)
