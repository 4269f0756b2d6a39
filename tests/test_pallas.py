"""Pallas fused attention-step kernel: interpret-mode equivalence vs XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multilingual_text_to_speech_tpu.models.attention import (
    LocationSensitiveAttention,
    init_attention_state,
)

KEY = jax.random.PRNGKey(0)


def _setup(b=4, t=16, m=12, q=10, a=8, k=5, c=4):
    rng = np.random.RandomState(0)
    query = jnp.asarray(rng.randn(b, q).astype(np.float32))
    memory = jnp.asarray(rng.randn(b, t, m).astype(np.float32))
    mt = jnp.asarray(rng.randn(b, t, a).astype(np.float32))
    mask = jnp.asarray(
        np.arange(t)[None, :] < np.array([t, t - 3, t, t - 7])[:, None]
    )
    state = init_attention_state("location_sensitive", b, t)
    # nonzero cumulative weights so the location conv path is exercised
    state = {"weights": jnp.asarray(rng.rand(b, t).astype(np.float32))}
    prev = jnp.zeros((b, 3))
    return query, memory, mt, mask, state, prev


def test_pallas_matches_xla_path():
    args = _setup()
    xla_att = LocationSensitiveAttention(
        representation_dim=8, kernel_size=5, location_channels=4,
        use_pallas=False,
    )
    pl_att = LocationSensitiveAttention(
        representation_dim=8, kernel_size=5, location_channels=4,
        use_pallas=True, pallas_interpret=True,
    )
    v = xla_att.init(KEY, *args)
    ctx_x, w_x, s_x = xla_att.apply(v, *args)
    ctx_p, w_p, s_p = pl_att.apply(v, *args)

    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_x),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ctx_p), np.asarray(ctx_x),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s_p["weights"]),
                               np.asarray(s_x["weights"]), atol=1e-4)


def test_pallas_masked_positions_zero():
    args = _setup()
    pl_att = LocationSensitiveAttention(
        representation_dim=8, kernel_size=5, location_channels=4,
        use_pallas=True, pallas_interpret=True,
    )
    v = pl_att.init(KEY, *args)
    _, w, _ = pl_att.apply(v, *args)
    mask = np.asarray(args[3])
    assert np.asarray(w)[~mask].max() < 1e-6
    np.testing.assert_allclose(np.asarray(w).sum(1), 1.0, atol=1e-4)


def test_pallas_in_scan_decoder():
    """The fused kernel must work inside the decoder scan (tiny shapes)."""
    from tests.corpus_utils import tiny_model_hp
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron

    hp = tiny_model_hp(use_pallas_attention=True, compute_dtype="float32")
    # interpret mode for CPU tests
    from multilingual_text_to_speech_tpu.models import decoder as dec_mod

    orig = dec_mod._make_attention

    def patched(att_type, hp_like, dtype):
        return LocationSensitiveAttention(
            representation_dim=hp_like.attention_dimension,
            kernel_size=hp_like.attention_kernel_size,
            location_channels=hp_like.attention_location_dimension,
            use_pallas=True, pallas_interpret=True,
            dtype=dtype, name="attention",
        )

    dec_mod._make_attention = patched
    try:
        rng = np.random.RandomState(0)
        text = jnp.asarray(rng.randint(3, 20, (2, 8)))
        text_len = jnp.asarray([8, 6])
        target = jnp.asarray(rng.randn(2, 6, hp.num_mels).astype(np.float32))
        target_len = jnp.asarray([6, 5])
        model = Tacotron(hp, train=False)
        v = model.init(KEY, text, text_len, target, target_len, None, None,
                       1.0, KEY)
        out = model.apply(v, text, text_len, target, target_len, None, None,
                          1.0, KEY)
        assert np.isfinite(np.asarray(out["post_prediction"])).all()
        np.testing.assert_allclose(
            np.asarray(out["alignment"][0].sum(-1)), 1.0, atol=1e-3
        )
    finally:
        dec_mod._make_attention = orig
