"""Training runtime tests: schedules, checkpoint round-trip, tiny E2E training."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multilingual_text_to_speech_tpu.data import TextToSpeechDatasetCollection
from multilingual_text_to_speech_tpu.parallel import make_mesh
from multilingual_text_to_speech_tpu.training import (
    Trainer,
    cos_decay,
    step_decay_schedule,
    teacher_forcing_ratio,
)
from multilingual_text_to_speech_tpu.training.checkpoint import (
    load_checkpoint,
    restore_into,
    save_checkpoint,
)

from tests.corpus_utils import build_corpus_with_metafiles, tiny_model_hp


def test_step_decay_schedule():
    hp = tiny_model_hp(learning_rate=1.0, learning_rate_decay=0.5,
                       learning_rate_decay_start=100,
                       learning_rate_decay_each=50)
    sched = step_decay_schedule(hp)
    assert float(sched(0)) == 1.0
    assert float(sched(99)) == 1.0
    assert float(sched(100)) == 0.5
    assert float(sched(149)) == 0.5
    assert float(sched(150)) == 0.25


def test_cos_decay():
    assert cos_decay(0, 100) == pytest.approx(1.0)
    assert cos_decay(50, 100) == pytest.approx(0.5)
    assert cos_decay(100, 100) == pytest.approx(0.0)
    assert cos_decay(200, 100) == pytest.approx(0.0)  # clamped


def test_teacher_forcing_ratio():
    hp = tiny_model_hp()
    assert teacher_forcing_ratio(hp, 12345) == 1.0
    hp.constant_teacher_forcing = False
    hp.teacher_forcing_start_steps = 10
    hp.teacher_forcing_steps = 100
    assert teacher_forcing_ratio(hp, 0) == pytest.approx(1.0)
    assert teacher_forcing_ratio(hp, 60) == pytest.approx(0.5)
    assert teacher_forcing_ratio(hp, 110) == pytest.approx(0.0)


def test_dropout_rng_impl():
    """hp.dropout_rng_impl: 'threefry' keeps the raw fold_in key; 'rbg'
    re-wraps it as a typed RngBitGenerator key (deterministic in the base
    rng).  The E2E trainer tests run the default ('rbg') through the model."""
    from types import SimpleNamespace

    hp = tiny_model_hp()
    rng = jax.random.PRNGKey(5)

    hp.dropout_rng_impl = "threefry"
    k = Trainer._dropout_rng(SimpleNamespace(hp=hp), rng)
    np.testing.assert_array_equal(
        np.asarray(k), np.asarray(jax.random.fold_in(rng, 1)))

    hp.dropout_rng_impl = "rbg"
    k2 = Trainer._dropout_rng(SimpleNamespace(hp=hp), rng)
    assert jnp.issubdtype(k2.dtype, jax.dtypes.prng_key)
    m = jax.random.bernoulli(k2, 0.5, (256,))
    assert 0 < int(m.sum()) < 256
    # deterministic given the same base rng
    k3 = Trainer._dropout_rng(SimpleNamespace(hp=hp), rng)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(k2)),
        np.asarray(jax.random.key_data(k3)))


def test_checkpoint_roundtrip(tmp_path):
    hp = tiny_model_hp()
    params = {"dense": {"kernel": np.random.randn(3, 4).astype(np.float32)}}
    stats = {"bn": {"mean": np.zeros(4, np.float32)}}
    opt_state = {"count": np.int32(7)}
    path = str(tmp_path / "ckpt")
    save_checkpoint(
        path, epoch=3, step=42, params=params, batch_stats=stats,
        opt_state=opt_state, hp=hp,
        criterion_state={"guided_att_variance": 0.2, "guided_att_steps": 5,
                         "guided_att_gamma": 1.0002},
    )
    payload = load_checkpoint(path)
    assert int(payload["epoch"]) == 3 and int(payload["step"]) == 42
    assert payload["hp"].num_mels == hp.num_mels
    restored = restore_into(payload, params=params, batch_stats=stats)
    np.testing.assert_allclose(
        restored["params"]["dense"]["kernel"], params["dense"]["kernel"]
    )


def test_checkpoint_partial_restore(tmp_path):
    hp = tiny_model_hp()
    params_old = {"a": {"w": np.ones((2, 2), np.float32)},
                  "b": {"w": np.full((3,), 2.0, np.float32)}}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, epoch=0, step=0, params=params_old, batch_stats={},
                    opt_state={}, hp=hp, criterion_state={})
    # new architecture: 'b' has a different shape, 'c' is new
    params_new = {"a": {"w": np.zeros((2, 2), np.float32)},
                  "b": {"w": np.zeros((5,), np.float32)},
                  "c": {"w": np.zeros((1,), np.float32)}}
    payload = load_checkpoint(path)
    restored = restore_into(payload, params=params_new, partial=True)["params"]
    np.testing.assert_allclose(restored["a"]["w"], 1.0)   # matched -> loaded
    np.testing.assert_allclose(restored["b"]["w"], 0.0)   # shape mismatch -> kept
    np.testing.assert_allclose(restored["c"]["w"], 0.0)   # new -> kept


@pytest.fixture(scope="module")
def tiny_training_setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    hp = tiny_model_hp(
        languages=["german", "french"],
        multi_language=True,
        encoder_type="generated",
        balanced_sampling=True,
        perfect_sampling=True,
        batch_size=4,
        case_sensitive=False,
        guided_attention_steps=1000,
        decoder_regularization="zoneout",
        griffin_lim_iters=2,  # keep the eval-audio render cheap on CPU
    )
    build_corpus_with_metafiles(root, hp, n_per_lang=4)
    return root, hp


def test_trainer_end_to_end(tiny_training_setup, tmp_path):
    root, hp = tiny_training_setup
    hp = hp.copy()
    data = TextToSpeechDatasetCollection(root, hp)
    mesh = make_mesh(devices=jax.devices()[:1])
    ckpt_dir = str(tmp_path / "ckpts")

    trainer = Trainer(hp, data, checkpoint_dir=ckpt_dir,
                      log_dir=str(tmp_path / "logs"), mesh=mesh, seed=0)

    # hp mutated like the reference runtime
    assert hp.language_number == 2
    assert hp.mel_normalization() is not None

    losses = []
    for _ in range(3):
        steps = trainer.train_epoch()
        assert steps >= 1
        eval_loss = trainer.evaluate()
        losses.append(eval_loss)
        trainer.epoch += 1
    assert np.isfinite(losses).all()
    # training reduces loss on this trivially overfittable corpus
    assert losses[-1] < losses[0]

    # eval epochs render Griffin-Lim audio of a random sample, generated AND
    # teacher-forced (reference utils/logging.py:116-119)
    import json

    metrics_path = os.path.join(trainer.logger.log_dir, "metrics.jsonl")
    trainer.logger._jsonl.flush()
    evals = [json.loads(l) for l in open(metrics_path, encoding="utf-8")
             if json.loads(l)["kind"] == "eval"]
    assert len(evals) == 3
    assert all(e["audio_generated_samples"] > 0 for e in evals)
    assert all(e["audio_forced_samples"] > 0 for e in evals)

    path = trainer.save(losses[-1])
    assert os.path.exists(path)

    # resume: fresh trainer from checkpoint continues at the right epoch
    trainer2 = Trainer(hp.copy(), data, mesh=mesh, seed=0,
                       from_checkpoint=path)
    assert trainer2.epoch == trainer.epoch + 1
    assert int(trainer2.state.step) == int(trainer.state.step)
    # params identical after restore
    a = jax.tree_util.tree_leaves(trainer.state.params)
    b = jax.tree_util.tree_leaves(trainer2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_trainer_data_parallel_8dev(tmp_path_factory):
    """Tiny model on the full 8-device virtual mesh (4 data x 2 model):
    batch 8 = 2 langs x 4 dp shards, sharded over 'data'."""
    root = str(tmp_path_factory.mktemp("corpus8"))
    hp = tiny_model_hp(
        languages=["german", "french"],
        multi_language=True,
        encoder_type="generated",
        balanced_sampling=True,
        perfect_sampling=True,
        batch_size=8,
        case_sensitive=False,
        mesh_data_parallel=4,
        mesh_model_parallel=2,
    )
    build_corpus_with_metafiles(root, hp, n_per_lang=8, val_every=8)
    data = TextToSpeechDatasetCollection(root, hp)
    mesh = make_mesh(hp)  # all 8 virtual CPU devices
    assert mesh.shape == {"data": 4, "model": 2}

    trainer = Trainer(hp, data, mesh=mesh, seed=0)
    steps = trainer.train_epoch()
    assert steps >= 1
    assert np.isfinite(
        float(sum(jnp.sum(jnp.abs(x))
                  for x in jax.tree_util.tree_leaves(trainer.state.params)))
    )


def test_trainer_data_parallel_fused_decoder(tmp_path_factory, monkeypatch):
    """Data-parallel training through the fused Pallas train decoder: a pure
    4-data-shard mesh routes the decode through shard_map (one kernel per
    shard, parameter grads psum'd by the shard_map transpose).  Forced
    through the interpreter on the CPU test mesh."""
    monkeypatch.setenv("MTTS_PALLAS_TRAIN_DECODER", "interpret")
    root = str(tmp_path_factory.mktemp("corpus_dpf"))
    hp = tiny_model_hp(
        languages=["german", "french"],
        multi_language=True,
        encoder_type="generated",
        balanced_sampling=True,
        perfect_sampling=True,
        batch_size=8,
        case_sensitive=False,
        mesh_data_parallel=4,
        mesh_model_parallel=1,
        decoder_regularization="zoneout",
    )
    build_corpus_with_metafiles(root, hp, n_per_lang=8, val_every=8)
    data = TextToSpeechDatasetCollection(root, hp)
    mesh = make_mesh(hp, devices=jax.devices()[:4])
    assert mesh.shape == {"data": 4, "model": 1}

    # count factory invocations to prove the fused path actually engaged
    from multilingual_text_to_speech_tpu.ops import pallas_train_decoder
    calls = []
    real_factory = pallas_train_decoder.make_train_decode_fn
    monkeypatch.setattr(
        pallas_train_decoder, "make_train_decode_fn",
        lambda *a, **kw: calls.append(1) or real_factory(*a, **kw))

    trainer = Trainer(hp, data, mesh=mesh, seed=0)
    steps = trainer.train_epoch()
    assert calls, "fused train decoder did not engage"
    assert steps >= 1
    assert np.isfinite(
        float(sum(jnp.sum(jnp.abs(x))
                  for x in jax.tree_util.tree_leaves(trainer.state.params)))
    )


def test_find_latest_checkpoint(tmp_path):
    import time as _time

    from multilingual_text_to_speech_tpu.config import HParams
    from multilingual_text_to_speech_tpu.training.checkpoint import (
        find_latest_checkpoint,
        save_checkpoint,
    )

    d = str(tmp_path)
    assert find_latest_checkpoint(d) is None

    def save(name, epoch):
        save_checkpoint(
            str(tmp_path / name), epoch=epoch, step=epoch,
            params={"w": np.ones(2, np.float32)}, batch_stats={},
            opt_state={}, hp=HParams(), criterion_state={"g": 0.5},
        )

    save("ckpt_a", 0)
    _time.sleep(0.01)
    save("ckpt_b", 1)
    (tmp_path / "ckpt_c.tmp").write_bytes(b"3")   # in-flight writes skipped
    _time.sleep(0.01)
    (tmp_path / "notes.txt").write_text("hello")  # stray files skipped even
    (tmp_path / "events.out.tfevents.123").write_bytes(b"\x00" * 40)  # newer
    assert find_latest_checkpoint(d).endswith("ckpt_b")


def test_orbax_checkpoint_roundtrip(tmp_path):
    import numpy as np

    from multilingual_text_to_speech_tpu.training.orbax_io import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    hp = tiny_model_hp()
    params = {"dense": {"kernel": np.random.randn(3, 4).astype(np.float32)}}
    stats = {"bn": {"mean": np.zeros(4, np.float32)}}
    opt = {"count": np.zeros((), np.int32)}
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(
        path, epoch=2, step=17, params=params, batch_stats=stats,
        opt_state=opt, hp=hp,
        criterion_state={"guided_att_variance": 0.3, "guided_att_steps": 9,
                         "guided_att_gamma": 1.0},
    )
    restored, meta = load_checkpoint_orbax(
        path, params=jax.tree_util.tree_map(np.zeros_like, params),
        batch_stats=jax.tree_util.tree_map(np.zeros_like, stats),
        opt_state=jax.tree_util.tree_map(np.zeros_like, opt),
    )
    np.testing.assert_allclose(
        restored["params"]["dense"]["kernel"], params["dense"]["kernel"]
    )
    assert meta["epoch"] == 2 and meta["step"] == 17
    assert meta["hp"].num_mels == hp.num_mels
