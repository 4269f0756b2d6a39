"""Building-block tests: conv blocks, highway gates, generated layers, cells."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multilingual_text_to_speech_tpu.models.layers import (
    BatchNorm1dGenerated,
    Conv1dGenerated,
    ConvBlock,
    ConvBlockGenerated,
    HighwayConvBlock,
    HighwayConvBlockGenerated,
    same_pad_amounts,
)
from multilingual_text_to_speech_tpu.models.rnn import (
    DropoutLSTMCell,
    LSTMCell,
    ZoneoutLSTMCell,
)

KEY = jax.random.PRNGKey(0)


def test_same_pad_amounts():
    assert same_pad_amounts(5, 1) == (2, 2)
    assert same_pad_amounts(3, 3) == (3, 3)
    assert same_pad_amounts(2, 1) == (0, 1)   # even kernel -> asymmetric
    assert same_pad_amounts(31, 1) == (15, 15)


def test_conv_block_preserves_time():
    x = jnp.ones((2, 17, 8))
    for k, d in [(1, 1), (3, 3), (5, 1), (2, 1), (31, 1)]:
        m = ConvBlock(output_channels=12, kernel=k, dilation=d, activation="relu")
        v = m.init(KEY, x)
        y = m.apply(v, x)
        assert y.shape == (2, 17, 12), (k, d)


def test_conv_block_train_updates_batch_stats():
    x = jax.random.normal(KEY, (4, 10, 8))
    m = ConvBlock(output_channels=6, kernel=3)
    v = m.init(KEY, x)
    m_train = ConvBlock(output_channels=6, kernel=3, train=True)
    y, mut = m_train.apply(v, x, mutable=["batch_stats"],
                           rngs={"dropout": KEY})
    before = v["batch_stats"]["BatchNorm_0"]["mean"]
    after = mut["batch_stats"]["BatchNorm_0"]["mean"]
    assert not np.allclose(before, after)


def test_highway_gate_identity_when_gate_closed():
    # with all-zero params (gate sigmoid(0)=0.5) the output mixes equally;
    # check shape + that groups are respected by comparing grouped vs
    # block-diagonal computation
    x = jax.random.normal(KEY, (2, 9, 8))
    m = HighwayConvBlock(output_channels=8, kernel=3, groups=2, batch_norm=False)
    v = m.init(KEY, x)
    y = m.apply(v, x)
    assert y.shape == x.shape


def test_grouped_conv_is_blockdiagonal():
    # a grouped ConvBlock must equal two independent convs on channel halves
    x = jax.random.normal(KEY, (2, 9, 8))
    m = ConvBlock(output_channels=8, kernel=3, groups=2, batch_norm=False)
    v = m.init(KEY, x)
    y = m.apply(v, x)

    kernel = v["params"]["Conv_0"]["kernel"]  # [k, in/g, out]
    bias = v["params"]["Conv_0"]["bias"]
    # manual per-group conv
    outs = []
    for g in range(2):
        xg = x[..., g * 4 : (g + 1) * 4]
        kg = kernel[:, :, g * 4 : (g + 1) * 4]
        yg = jax.lax.conv_general_dilated(
            xg, kg, (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC")
        ) + bias[g * 4 : (g + 1) * 4]
        outs.append(yg)
    np.testing.assert_allclose(y, jnp.concatenate(outs, -1), atol=1e-5)


def test_conv1d_generated_matches_explicit_groups():
    # generated grouped conv == applying each group's generated kernel alone
    g, cin, cout, k = 3, 4, 6, 3
    x = jax.random.normal(KEY, (2, 7, g * cin))
    e = jax.random.normal(jax.random.PRNGKey(1), (g, 5))
    m = Conv1dGenerated(bottleneck_dim=2, in_channels=g * cin,
                        out_channels=g * cout, kernel=k, groups=g)
    v = m.init(KEY, e, x)
    y = m.apply(v, e, x)
    assert y.shape == (2, 7, g * cout)

    # recompute kernels by hand from the generator params
    p = v["params"]
    bott = e @ p["bottleneck"]["kernel"] + p["bottleneck"]["bias"]
    kern = bott @ p["kernel"]["kernel"] + p["kernel"]["bias"]   # [g, cout*cin*k]
    bias = bott @ p["bias"]["kernel"] + p["bias"]["bias"]       # [g, cout]
    for gi in range(g):
        # generator columns are ordered (k, cin, cout) — TPU-tileable minor
        # dim at every reshape (see Conv1dGenerated.generate)
        kg = kern[gi].reshape(k, cin, cout)
        xg = x[..., gi * cin : (gi + 1) * cin]
        pad = same_pad_amounts(k, 1)
        yg = jax.lax.conv_general_dilated(
            xg, kg, (1,), [pad], dimension_numbers=("NWC", "WIO", "NWC")
        ) + bias[gi]
        np.testing.assert_allclose(
            np.asarray(y[..., gi * cout : (gi + 1) * cout]), np.asarray(yg),
            atol=1e-5,
        )


def test_batchnorm_generated_shared_stats():
    g, c = 2, 4
    x = jax.random.normal(KEY, (8, 5, g * c)) * 3 + 1
    e = jax.random.normal(jax.random.PRNGKey(1), (g, 5))
    m = BatchNorm1dGenerated(bottleneck_dim=2, num_features=g * c, groups=g)
    v = m.init(KEY, e, x)
    # running stats span ALL channels (shared buffer)
    assert v["batch_stats"]["mean"].shape == (g * c,)
    m_train = BatchNorm1dGenerated(bottleneck_dim=2, num_features=g * c,
                                   groups=g, train=True)
    y, mut = m_train.apply(v, e, x, mutable=["batch_stats"])
    assert y.shape == x.shape
    # running mean moved toward batch mean
    assert not np.allclose(mut["batch_stats"]["mean"], 0.0)


def test_generated_highway_block_shapes():
    g, c = 2, 4
    x = jax.random.normal(KEY, (2, 7, g * c))
    e = jax.random.normal(jax.random.PRNGKey(1), (g, 3))
    m = HighwayConvBlockGenerated(
        bottleneck_dim=2, in_channels=g * c, out_channels=g * c,
        kernel=3, dilation=3, groups=g,
    )
    v = m.init(KEY, e, x)
    y = m.apply(v, e, x)
    assert y.shape == x.shape


def test_lstm_cell_step():
    m = LSTMCell(16)
    x = jnp.ones((3, 8))
    h = c = jnp.zeros((3, 16))
    v = m.init(KEY, x, h, c)
    nh, nc = m.apply(v, x, h, c)
    assert nh.shape == nc.shape == (3, 16)
    assert np.abs(np.asarray(nh)).max() <= 1.0  # tanh-bounded


def test_zoneout_eval_interpolates():
    m = ZoneoutLSTMCell(8, zoneout_h=1.0, zoneout_c=1.0)  # full zoneout
    x = jnp.ones((2, 4))
    h = jnp.full((2, 8), 0.7)
    c = jnp.full((2, 8), -0.3)
    v = m.init(KEY, x, h, c, KEY, False)
    nh, nc = m.apply(v, x, h, c, KEY, False)
    # z=1.0 at eval keeps the old state entirely
    np.testing.assert_allclose(nh, h, atol=1e-6)
    np.testing.assert_allclose(nc, c, atol=1e-6)


def test_zoneout_train_mixes_old_and_new():
    m = ZoneoutLSTMCell(64, zoneout_h=0.5, zoneout_c=0.5)
    x = jnp.ones((2, 4))
    h = jnp.full((2, 64), 0.9)
    c = jnp.zeros((2, 64))
    v = m.init(KEY, x, h, c, KEY, True)
    nh, _ = m.apply(v, x, h, c, jax.random.PRNGKey(7), True)
    kept_old = np.isclose(np.asarray(nh), 0.9).mean()
    assert 0.2 < kept_old < 0.8  # ~half the elements keep the old h


def test_dropout_lstm_cell_train_vs_eval():
    m = DropoutLSTMCell(32, dropout_rate=0.5)
    x = jnp.ones((2, 4))
    h = c = jnp.zeros((2, 32))
    v = m.init(KEY, x, h, c, KEY, False)
    nh_eval, _ = m.apply(v, x, h, c, KEY, False)
    nh_train, _ = m.apply(v, x, h, c, jax.random.PRNGKey(3), True)
    assert (np.asarray(nh_train) == 0).any()       # some dropped
    assert not (np.asarray(nh_eval) == 0).all()
