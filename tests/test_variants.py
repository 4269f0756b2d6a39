"""Coverage for secondary configuration paths: forward attention in the full
model, encoder LR groups, cosine classifier, balanced sampling, smoothing."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multilingual_text_to_speech_tpu.config import HParams
from multilingual_text_to_speech_tpu.models.attention import (
    LocationSensitiveAttention,
    init_attention_state,
)
from multilingual_text_to_speech_tpu.models.tacotron import (
    Tacotron,
    tacotron_loss,
)
from multilingual_text_to_speech_tpu.training.trainer import make_optimizer

from tests.corpus_utils import tiny_model_hp

KEY = jax.random.PRNGKey(0)


def _batch(hp, b=2, t=9, f=7):
    rng = np.random.RandomState(1)
    text = jnp.asarray(rng.randint(3, hp.total_symbols(), (b, t)))
    text_len = jnp.array([t, t - 2])
    target = jnp.asarray(rng.randn(b, f, hp.num_mels).astype(np.float32))
    target_len = jnp.array([f, f - 2])
    stop = np.ones((b, f), np.float32)
    for i, l in enumerate(np.asarray(target_len)):
        stop[i, : max(int(l) - hp.stop_frames, 0)] = 0.0
    return text, text_len, target, target_len, jnp.asarray(stop)


@pytest.mark.parametrize("attention_type", [
    "forward", "forward_transition_agent",
])
def test_tacotron_forward_attention_variants(attention_type):
    hp = tiny_model_hp(attention_type=attention_type, compute_dtype="float32")
    text, text_len, target, target_len, stop = _batch(hp)
    model = Tacotron(hp, train=False)
    v = model.init(KEY, text, text_len, target, target_len, None, None,
                   1.0, KEY)
    out = model.apply(v, text, text_len, target, target_len, None, None,
                      1.0, KEY)
    align = np.asarray(out["alignment"])
    assert np.isfinite(align).all()
    np.testing.assert_allclose(align[0].sum(-1), 1.0, atol=1e-3)
    # forward attention weights at masked positions stay ~clamp level
    assert align[1, :, -2:].max() < 0.1


def test_lsa_smoothing_normalization():
    b, t = 2, 7
    m = LocationSensitiveAttention(representation_dim=8, kernel_size=5,
                                   location_channels=4, smoothing=True)
    args = (
        jax.random.normal(KEY, (b, 5)),
        jax.random.normal(KEY, (b, t, 6)),
        jax.random.normal(KEY, (b, t, 8)),
        jnp.array([[True] * 7, [True] * 4 + [False] * 3]),
        init_attention_state("location_sensitive", b, t),
        jnp.zeros((b, 3)),
    )
    v = m.init(KEY, *args)
    _, w, _ = m.apply(v, *args)
    np.testing.assert_allclose(np.asarray(w.sum(1)), 1.0, atol=1e-4)
    assert np.asarray(w[1, 4:]).max() < 1e-6


def test_cosine_classifier_model_and_loss():
    hp = tiny_model_hp(
        multi_speaker=True, multi_language=True,
        speaker_number=3, language_number=2, languages=["de", "fr"],
        reversal_classifier=True, reversal_classifier_type="cosine",
        speaker_embedding_dimension=4, language_embedding_dimension=2,
        compute_dtype="float32",
    )
    text, text_len, target, target_len, stop = _batch(hp)
    speakers = jnp.array([0, 2])
    langs = jnp.array([0, 1])
    model = Tacotron(hp, train=False)
    v = model.init(KEY, text, text_len, target, target_len, speakers, langs,
                   1.0, KEY)
    out = model.apply(v, text, text_len, target, target_len, speakers, langs,
                      1.0, KEY)
    total, losses = tacotron_loss(
        out, hp=hp, input_lengths=text_len, target_lengths=target_len,
        pre_target=target, post_target=target, stop_target=stop,
        speakers=speakers, guided_att_variance=0.25,
        classifier_kernel=v["params"]["classifier"]["fc"]["kernel"],
    )
    assert np.isfinite(float(total))
    assert "lang_class" in losses


def test_encoder_optimizer_separate_lr():
    hp = tiny_model_hp(encoder_optimizer=True, learning_rate=1e-3,
                       learning_rate_encoder=1e-5)
    tx = make_optimizer(hp)
    params = {
        "encoder": {"w": jnp.ones((4, 4))},
        "decoder": {"w": jnp.ones((4, 4))},
    }
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # encoder update magnitude must be ~100x smaller (lr ratio)
    enc = float(jnp.abs(updates["encoder"]["w"]).mean())
    dec = float(jnp.abs(updates["decoder"]["w"]).mean())
    assert enc < dec / 10


def test_gradient_clipping_in_optimizer():
    hp = tiny_model_hp(gradient_clipping=0.25)
    tx = make_optimizer(hp)
    params = {"w": jnp.zeros((10,))}
    state = tx.init(params)
    huge = {"w": jnp.full((10,), 1e6)}
    updates, _ = tx.update(huge, state, params)
    # after global-norm clip + adam normalization the step stays bounded
    assert float(jnp.abs(updates["w"]).max()) < 1.0


def test_trainer_balanced_non_perfect_sampling(tmp_path_factory):
    """balanced_sampling without perfect_sampling takes the
    RandomImbalancedSampler path (train.py:232-236)."""
    from multilingual_text_to_speech_tpu.data import TextToSpeechDatasetCollection
    from multilingual_text_to_speech_tpu.parallel import make_mesh
    from multilingual_text_to_speech_tpu.training import Trainer
    from tests.corpus_utils import build_corpus_with_metafiles

    root = str(tmp_path_factory.mktemp("bal"))
    hp = tiny_model_hp(
        languages=["german", "french"], multi_language=True,
        encoder_type="shared", balanced_sampling=True,
        perfect_sampling=False, batch_size=4, case_sensitive=False,
        compute_dtype="float32",
    )
    build_corpus_with_metafiles(root, hp, n_per_lang=4)
    data = TextToSpeechDatasetCollection(root, hp)
    mesh = make_mesh(devices=jax.devices()[:1])
    trainer = Trainer(hp, data, mesh=mesh, seed=0)
    assert type(trainer.train_sampler).__name__ == "BalancedBatchSampler"
    steps = trainer.train_epoch()
    assert steps >= 1
