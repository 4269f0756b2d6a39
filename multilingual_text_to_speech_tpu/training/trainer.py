"""The training runtime: jitted SPMD train/eval steps and the epoch loop.

Rebuild of ``/root/reference/train.py`` for TPU:

- ONE jitted train step (forward, loss, grads, clip, Adam update, batch-stat
  update) instead of a Python loop of torch kernel launches;
- batches are sharded over the ``data`` mesh axis (``jax.sharding``); XLA
  inserts the gradient all-reduce over ICI — the SPMD successor of the
  reference's DataParallel scatter/gather (train.py:255-256);
- torch-Adam semantics: L2 weight decay folded into gradients before the
  moment updates, global-norm clipping at ``hp.gradient_clipping``
  (train.py:84,260);
- optional separate encoder learning rate (``hp.encoder_optimizer``,
  train.py:261-270) via optax.multi_transform;
- evaluation runs the teacher-forced AND free-running passes and computes
  DTW-MCD per sample (train.py:124-145).
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multilingual_text_to_speech_tpu.data import Collate
from multilingual_text_to_speech_tpu.data.batching import Batch, batch_iterator
from multilingual_text_to_speech_tpu.data.sampling import (
    BalancedBatchSampler,
    PerfectBatchSampler,
    SimpleBatchSampler,
)
from multilingual_text_to_speech_tpu.models.tacotron import (
    Tacotron,
    TacotronLossState,
    lengths_to_mask,
    tacotron_loss,
)
from multilingual_text_to_speech_tpu.ops import audio as audio_ops
from multilingual_text_to_speech_tpu.parallel import make_mesh, replicate, shard_batch
from multilingual_text_to_speech_tpu.training.checkpoint import (
    load_checkpoint,
    restore_into,
    save_checkpoint,
)
from multilingual_text_to_speech_tpu.training.logging import MetricsLogger
from multilingual_text_to_speech_tpu.training.schedule import (
    step_decay_schedule,
    teacher_forcing_ratio,
)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def dropout_stream_key(hp, rng):
    """Key for the flax 'dropout' stream (encoder/postnet ConvBlocks).

    With ``hp.dropout_rng_impl='rbg'`` (the default) the stream is
    re-wrapped as a TPU-native RngBitGenerator key: threefry mask
    generation costs ~4.3 ms of the flagship postnet's 8.7 ms fwd+bwd at
    B=50/F=512 (tools/hw_results/postnet_microbench_2026-08-19.log).  The
    decoder threads its own raw key (the fused kernels hash a counter
    in-kernel), so only nn.Dropout masks change.
    """
    key = jax.random.fold_in(rng, 1)
    impl = getattr(hp, "dropout_rng_impl", "threefry")
    if impl != "threefry":
        data = jax.random.bits(key, (4,), jnp.uint32)
        key = jax.random.wrap_key_data(data, impl=impl)
    return key


def make_optimizer(hp):
    """torch.optim.Adam(weight_decay=L2) + clip_grad_norm_, as one optax chain
    (reference: train.py:84,260-270)."""
    def adam_chain(lr0):
        sched_hp = hp.copy()
        sched_hp.learning_rate = lr0
        return optax.chain(
            optax.add_decayed_weights(hp.weight_decay),
            optax.scale_by_adam(eps=1e-8),
            optax.scale_by_learning_rate(step_decay_schedule(sched_hp)),
        )

    clip = optax.clip_by_global_norm(hp.gradient_clipping)

    if hp.encoder_optimizer:
        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "encoder"
                if path and getattr(path[0], "key", None) == "encoder"
                else "other",
                params,
            )

        tx = optax.multi_transform(
            {"encoder": adam_chain(hp.learning_rate_encoder),
             "other": adam_chain(hp.learning_rate)},
            label_fn,
        )
    else:
        tx = adam_chain(hp.learning_rate)
    return optax.chain(clip, tx)


class Trainer:
    """End-to-end training driver (reference __main__, train.py:182-310)."""

    def __init__(self, hp, dataset_collection, *, base_directory: str = ".",
                 checkpoint_dir: Optional[str] = None,
                 log_dir: Optional[str] = None, seed: int = 42,
                 mesh=None, from_checkpoint: Optional[str] = None,
                 flush_seconds: int = 60):
        self.hp = hp
        self.data = dataset_collection
        self.rng = jax.random.PRNGKey(seed)

        # dataset-dependent hp mutation (reference: train.py:238-250)
        hp.speaker_number = (
            dataset_collection.train.get_num_speakers() if hp.multi_speaker else 0
        )
        hp.language_number = len(hp.languages) if hp.multi_language else 0
        if hp.multi_speaker and not from_checkpoint:
            hp.unique_speakers = list(dataset_collection.train.unique_speakers)
        if not from_checkpoint and hp.normalize_spectrogram:
            # get_normalization_constants loads raw (un-normalized)
            # spectrograms regardless of hp (reference: dataset.py:165-176)
            if hp.mel_normalization() is None:
                train_ds = dataset_collection.train
                mean, var = train_ds.get_normalization_constants(True)
                hp.mel_normalize_mean, hp.mel_normalize_variance = mean, var
                if hp.predict_linear:
                    mean, var = train_ds.get_normalization_constants(False)
                    hp.lin_normalize_mean, hp.lin_normalize_variance = mean, var

        self.mesh = mesh if mesh is not None else make_mesh(hp)
        compute_dtype = (
            jnp.bfloat16 if getattr(hp, "compute_dtype", "float32") == "bfloat16"
            else jnp.float32
        )
        self.model_train = Tacotron(hp, train=True, dtype=compute_dtype,
                                    mesh=self.mesh)
        self.model_eval = Tacotron(hp, train=False, dtype=compute_dtype,
                                   mesh=self.mesh)
        self.loss_state = TacotronLossState.init(hp)
        self.tx = make_optimizer(hp)
        self.epoch = 0

        # data pipelines
        self.collate = Collate(hp)
        self._make_samplers(seed)

        # parameter init from one concrete batch
        init_batch = next(iter(self._train_batches()))
        self.rng, init_key = jax.random.split(self.rng)
        variables = self.model_train.init(
            init_key, *self._model_args(init_batch, 1.0, init_key)
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        if from_checkpoint:
            payload = load_checkpoint(from_checkpoint)
            restored = restore_into(
                payload, params=params, batch_stats=batch_stats, partial=True
            )
            params = restored["params"]
            batch_stats = restored["batch_stats"]
            self.epoch = int(payload["epoch"]) + 1
            self.loss_state = TacotronLossState.from_state_dict(
                {k: float(v) for k, v in payload["criterion"].items()}
            )

        opt_state = self.tx.init(params)
        step0 = jnp.zeros((), jnp.int32)
        if from_checkpoint:
            step0 = jnp.asarray(int(payload["step"]), jnp.int32)
            try:
                opt_state = restore_into(payload, opt_state=opt_state)["opt_state"]
            except (ValueError, KeyError, TypeError) as e:
                # structure mismatch is expected when fine-tuning a changed
                # architecture; anything else (I/O, corruption) must raise
                print(
                    "WARNING: optimizer state in checkpoint does not match "
                    f"the current model ({e}); starting with fresh Adam "
                    "moments.",
                    flush=True,
                )

        rep = replicate(self.mesh)
        self._rep = rep
        self.state = TrainState(
            params=jax.device_put(params, rep),
            batch_stats=jax.device_put(batch_stats, rep),
            opt_state=jax.device_put(opt_state, rep),
            # explicitly replicated: in multi-process SPMD every jit input
            # must be a global array, not a process-local one
            step=jax.device_put(step0, rep),
        )

        self._lr_schedule = step_decay_schedule(hp)
        # ga_active is STATIC: the expired-guided-attention step compiles a
        # second variant without the [B, F, T] penalty (and lets XLA drop the
        # alignment stacking), matching the reference's skip
        # (modules/tacotron2.py:444-445)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,),
                                   static_argnames=("ga_active",))
        self._eval_step = jax.jit(self._eval_step_impl,
                                  static_argnames=("ga_active",))

        self.logger = None
        if log_dir is not None:
            stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H%M%S")
            self.logger = MetricsLogger(
                os.path.join(log_dir, f"{hp.version}-{stamp}"),
                flush_seconds=flush_seconds,
            )
        self.checkpoint_dir = checkpoint_dir
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)

    # -- data ------------------------------------------------------------------

    def _make_samplers(self, seed: int):
        hp = self.hp
        train_langs = [it["language"] for it in self.data.train.items]
        dev_langs = [it["language"] for it in self.data.dev.items]
        dp = self.mesh.shape["data"]
        if hp.multi_language and hp.balanced_sampling and hp.perfect_sampling:
            self.train_sampler = PerfectBatchSampler(
                train_langs, len(hp.languages), hp.batch_size,
                data_parallel_shards=dp, shuffle=True, drop_last=True,
                seed=seed,
            )
            self.eval_sampler = PerfectBatchSampler(
                dev_langs, len(hp.languages), hp.batch_size,
                data_parallel_shards=dp, shuffle=False, drop_last=False,
                seed=seed,
            )
        elif hp.multi_language and hp.balanced_sampling:
            self.train_sampler = BalancedBatchSampler(
                train_langs, hp.batch_size, drop_last=True, seed=seed
            )
            self.eval_sampler = SimpleBatchSampler(
                len(self.data.dev), hp.batch_size, shuffle=False,
                drop_last=False, seed=seed,
            )
        else:
            self.train_sampler = SimpleBatchSampler(
                len(self.data.train), hp.batch_size, shuffle=True,
                drop_last=True, seed=seed,
            )
            self.eval_sampler = SimpleBatchSampler(
                len(self.data.dev), hp.batch_size, shuffle=False,
                drop_last=False, seed=seed,
            )

    def _train_batches(self):
        from multilingual_text_to_speech_tpu.data.prefetch import prefetch

        return prefetch(
            batch_iterator(self.data.train, self.train_sampler, self.collate),
            depth=2,
        )

    def _eval_batches(self):
        return batch_iterator(self.data.dev, self.eval_sampler, self.collate)

    def _scalar(self, value) -> jnp.ndarray:
        """A replicated scalar jit input (stable sharding across processes,
        no recompilation as the value changes per step)."""
        return jax.device_put(np.float32(value), self._rep)

    def _gather(self, x) -> np.ndarray:
        """Model output -> host numpy; with multiple processes the batch axis
        spans hosts, so all-gather the global array first."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    def _model_args(self, batch: Batch, tf_ratio, rng):
        return (
            batch.utterances, batch.utterance_lengths,
            batch.mel_spectrograms, batch.spectrogram_lengths,
            batch.speakers, batch.languages, tf_ratio, rng,
        )

    # -- steps -------------------------------------------------------------------

    def _loss_from_outputs(self, outputs, batch: Batch, params, ga_var, ga_active):
        hp = self.hp
        post_target = (
            batch.linear_spectrograms if hp.predict_linear
            else batch.mel_spectrograms
        )
        classifier_kernel = None
        if hp.reversal_classifier and hp.reversal_classifier_type == "cosine":
            classifier_kernel = params["classifier"]["fc"]["kernel"]
        return tacotron_loss(
            outputs,
            hp=hp,
            input_lengths=batch.utterance_lengths,
            target_lengths=batch.spectrogram_lengths,
            pre_target=batch.mel_spectrograms,
            post_target=post_target,
            stop_target=batch.stop_tokens,
            speakers=batch.speakers,
            guided_att_variance=ga_var,
            guided_att_active=ga_active,
            classifier_kernel=classifier_kernel,
        )

    def _classifier_accuracy(self, outputs, batch: Batch):
        """Masked speaker-classifier accuracy (reference: train.py:72-80)."""
        pred = jnp.argmax(outputs["speaker_prediction"], axis=-1)
        mask = lengths_to_mask(
            batch.utterance_lengths, pred.shape[1]
        )
        matches = (pred == batch.speakers[:, None]) & mask
        return jnp.sum(matches) / jnp.maximum(jnp.sum(mask), 1)

    def _dropout_rng(self, rng):
        return dropout_stream_key(self.hp, rng)

    def _train_step_impl(self, state: TrainState, batch: Batch, tf_ratio,
                         ga_var, rng, *, ga_active: bool = True):
        hp = self.hp

        def loss_fn(params):
            variables = {"params": params}
            mutable = []
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
                mutable = ["batch_stats"]
            out = self.model_train.apply(
                variables, *self._model_args(batch, tf_ratio, rng),
                mutable=mutable, rngs={"dropout": self._dropout_rng(rng)},
            )
            out, mut = out if mutable else (out, {})
            total, losses = self._loss_from_outputs(
                out, batch, params, ga_var, ga_active
            )
            return total, (losses, mut, out)

        (_, (losses, mut, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = self.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)

        acc = (
            self._classifier_accuracy(out, batch)
            if hp.reversal_classifier else jnp.zeros(())
        )
        new_state = TrainState(
            params=new_params,
            batch_stats=mut.get("batch_stats", state.batch_stats),
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, losses, grad_norm, acc

    def _eval_step_impl(self, state: TrainState, batch: Batch, tf_ratio,
                        ga_var, rng, *, ga_active: bool = True):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out = self.model_eval.apply(
            variables, *self._model_args(batch, tf_ratio, rng),
            rngs={"dropout": self._dropout_rng(rng)},
        )
        # same gate as training: eval loss drops the guided-attention term
        # once guided_att_steps expire (reference returns 0 in eval too)
        total, losses = self._loss_from_outputs(
            out, batch, state.params, ga_var, ga_active
        )
        acc = (
            self._classifier_accuracy(out, batch)
            if self.hp.reversal_classifier else jnp.zeros(())
        )
        return out, losses, acc

    # -- epoch loops ---------------------------------------------------------------

    def train_epoch(self, logging_start_epoch: int = 0,
                    profile_steps: int = 0,
                    profile_dir: Optional[str] = None) -> int:
        """One training epoch (reference: train.py:29-95). Returns steps run.

        With ``profile_steps > 0`` a jax.profiler trace of that many steps is
        written to ``profile_dir`` (the TPU build's answer to the reference's
        lone per-step duration scalar; SURVEY.md §5 tracing).
        """
        hp = self.hp
        steps = 0
        t0 = time.time()
        profiling = False
        for batch in self._train_batches():
            if profile_steps and steps == 0:
                jax.profiler.start_trace(
                    profile_dir or os.path.join(
                        self.logger.log_dir if self.logger else ".", "profile"
                    )
                )
                profiling = True
            step = int(self.state.step)
            tf = teacher_forcing_ratio(hp, step)
            ga_active = self.loss_state.guided_att_steps > 0
            self.rng, step_rng = jax.random.split(self.rng)

            batch = shard_batch(batch, self.mesh)
            self.state, losses, grad_norm, acc = self._train_step(
                self.state, batch,
                self._scalar(tf),
                self._scalar(self.loss_state.guided_att_variance),
                jax.device_put(step_rng, self._rep), ga_active=ga_active,
            )

            if self.logger is not None and self.epoch >= logging_start_epoch:
                self.logger.training(
                    step,
                    {k: float(v) for k, v in losses.items()},
                    float(grad_norm),
                    float(self._lr_schedule(step)),
                    time.time() - t0,
                    float(acc),
                )
            self.loss_state = self.loss_state.update()
            t0 = time.time()
            steps += 1
            if profiling and steps >= profile_steps:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready()
                    if hasattr(x, "block_until_ready") else x,
                    self.state.params,
                )
                jax.profiler.stop_trace()
                profiling = False
        if profiling:
            jax.profiler.stop_trace()
        return steps

    def evaluate(self) -> float:
        """Eval epoch: teacher-forced + free-running passes, DTW-MCD
        (reference: train.py:98-170). Returns summed eval loss."""
        hp = self.hp
        eval_losses: Dict[str, float] = {}
        mcd, mcd_count = 0.0, 0
        cla, cla_count = 0.0, 0
        n_batches = 0
        last = None

        ga_active = self.loss_state.guided_att_steps > 0
        for batch in self._eval_batches():
            self.rng, k1, k2 = jax.random.split(self.rng, 3)
            sharded = shard_batch(batch, self.mesh)
            ga_var = self._scalar(self.loss_state.guided_att_variance)
            out_forced, losses, acc = self._eval_step(
                self.state, sharded, self._scalar(1.0), ga_var,
                jax.device_put(k1, self._rep), ga_active=ga_active,
            )
            out_free, _, _ = self._eval_step(
                self.state, sharded, self._scalar(0.0), ga_var,
                jax.device_put(k2, self._rep), ga_active=ga_active,
            )

            post_free = self._gather(out_free["post_prediction"])
            stop_probs_np = np.asarray(
                jax.nn.sigmoid(jnp.asarray(self._gather(out_free["stop_token"])))
            )

            for j in range(post_free.shape[0]):
                gen = post_free[j].T       # [bins, F]
                ref = np.asarray(batch.mel_spectrograms[j]).T
                stop_idx = np.where(stop_probs_np[j] > 0.5)[0]
                cut = (
                    min(int(stop_idx.min()) + hp.stop_frames, gen.shape[1])
                    if len(stop_idx) else gen.shape[1]
                )
                gen = gen[:, :cut]
                ref = ref[:, : int(batch.spectrogram_lengths[j])]
                if hp.normalize_spectrogram:
                    gen = audio_ops.denormalize_spectrogram(
                        gen, hp, not hp.predict_linear
                    )
                    ref = audio_ops.denormalize_spectrogram(ref, hp, True)
                if hp.predict_linear:
                    gen = audio_ops.linear_to_mel(gen, hp)
                mcd = (
                    mcd_count * mcd
                    + audio_ops.mel_cepstral_distortion(gen, ref, hp, "dtw")
                ) / (mcd_count + 1)
                mcd_count += 1

            if hp.reversal_classifier:
                cla = (cla_count * cla + float(acc)) / (cla_count + 1)
                cla_count += 1

            for k, v in losses.items():
                eval_losses[k] = eval_losses.get(k, 0.0) + float(v)
            n_batches += 1
            last = (batch, out_forced, out_free, stop_probs_np)

        for k in eval_losses:
            eval_losses[k] /= max(n_batches, 1)

        if last is not None:
            # gathers are collectives: run them on EVERY process, then only
            # the logging process renders
            batch, out_forced, out_free, stop_probs_np = last
            free_np = self._gather(out_free["post_prediction"])
            forced_np = self._gather(out_forced["post_prediction"])
            align_np = self._gather(out_free["alignment"])
        if self.logger is not None and last is not None:
            from multilingual_text_to_speech_tpu.text import SymbolTable

            # RANDOM eval sample, like the reference (utils/logging.py:101)
            self.rng, pick = jax.random.split(self.rng)
            idx = int(jax.random.randint(
                pick, (), 0, batch.utterances.shape[0]
            ))
            f_len = int(batch.spectrogram_lengths[idx])
            s_len = int(batch.utterance_lengths[idx])
            source_text = SymbolTable(hp).decode(
                np.asarray(batch.utterances[idx])
            )

            # denormalized generated + forced spectrograms [bins, F]
            # (reference crops BOTH to the target length, logging.py:102-104)
            is_mel = not hp.predict_linear
            gen = free_np[idx][:f_len].T
            forced = forced_np[idx][:f_len].T
            target = np.asarray(batch.mel_spectrograms[idx][:f_len]).T
            if hp.normalize_spectrogram:
                gen = audio_ops.denormalize_spectrogram(gen, hp, is_mel)
                forced = audio_ops.denormalize_spectrogram(forced, hp, is_mel)
                target = audio_ops.denormalize_spectrogram(target, hp, True)

            # Griffin-Lim audio of the generated AND the teacher-forced
            # prediction (reference: utils/logging.py:116-119, train.py:168)
            audio_generated = audio_ops.inverse_spectrogram(gen, hp, mel=is_mel)
            audio_forced = audio_ops.inverse_spectrogram(forced, hp, mel=is_mel)

            self.logger.evaluation(
                self.epoch + 1, eval_losses, mcd, cla,
                alignment=align_np[idx][:f_len, :s_len],
                target_spec=target.T,
                predicted_spec=gen.T,
                forced_spec=forced.T,
                stop_probs=stop_probs_np[idx],
                stop_target=np.asarray(batch.stop_tokens[idx]),
                audio_generated=np.asarray(audio_generated),
                audio_forced=np.asarray(audio_forced),
                source_text=source_text,
                sample_rate=hp.sample_rate,
            )
        return float(sum(eval_losses.values()))

    def save(self, eval_loss: float) -> str:
        path = os.path.join(
            self.checkpoint_dir,
            f"{self.hp.version}_loss-{self.epoch}-{eval_loss:2.3f}",
        )
        save_checkpoint(
            path,
            epoch=self.epoch,
            step=int(self.state.step),
            params=jax.device_get(self.state.params),
            batch_stats=jax.device_get(self.state.batch_stats),
            opt_state=jax.device_get(self.state.opt_state),
            hp=self.hp,
            criterion_state=self.loss_state.state_dict(),
        )
        return path

    def fit(self, epochs: Optional[int] = None,
            logging_start_epoch: int = 0) -> float:
        """Full training loop (reference: train.py:292-310)."""
        hp = self.hp
        epochs = epochs if epochs is not None else hp.epochs
        best_eval = float("inf")
        while self.epoch < epochs:
            self.train_epoch(logging_start_epoch)
            eval_loss = self.evaluate()
            best_eval = min(best_eval, eval_loss)
            if self.checkpoint_dir and (self.epoch + 1) % hp.checkpoint_each_epochs == 0:
                self.save(eval_loss)
            self.epoch += 1
        return best_eval
