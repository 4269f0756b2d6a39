"""Autoregressive Tacotron 2 decoder as a single ``lax.scan``.

Rebuild of ``/root/reference/modules/tacotron2.py:79-219``.  The reference
decodes with a Python loop over frames (★ hot loop, tacotron2.py:180-207) —
thousands of kernel launches per utterance.  Here one compiled scan runs the
whole frame loop on device; each step is two fused-gate LSTM matmuls, the
attention energy, and the frame/stop heads.

Inference runs the SAME scanned cell in fixed-size chunks
(``hp.decode_chunk_frames``) driven from the host: after each chunk one
boolean ("all samples stopped?") is transferred, giving early exit at chunk
granularity while every compiled shape stays static.

Stochasticity (prenet dropout — deliberately active at inference, reference
tacotron2.py:40 — zoneout, per-step teacher forcing draws) uses explicit
per-step PRNG keys threaded through the scan, not implicit RNG state.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multilingual_text_to_speech_tpu.models.attention import (
    ForwardAttention,
    ForwardAttentionWithTransition,
    LocationSensitiveAttention,
    init_attention_state,
)
from multilingual_text_to_speech_tpu.models.rnn import (
    DropoutLSTMCell,
    ZoneoutLSTMCell,
    dropout,
)

Carry = Dict[str, Any]

# text buckets whose T-blocked-fold padding has been logged (trace-time,
# once per distinct bucket length per process)
_LOGGED_PAD_BUCKETS: set = set()


class Prenet(nn.Module):
    """Decoder pre-net: linear+ReLU stack whose dropout stays active at
    inference for output variety (reference: modules/tacotron2.py:15-46)."""

    output_dim: int = 256
    num_layers: int = 2
    dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        for i in range(self.num_layers):
            key, sub = jax.random.split(key)
            x = nn.Dense(self.output_dim, dtype=self.dtype, name=f"fc{i}")(x)
            x = jax.nn.relu(x.astype(jnp.float32))
            x = dropout(x, self.dropout_rate, sub)  # always on
        return x


def _make_attention(attention_type: str, hp_like, dtype):
    if attention_type == "location_sensitive":
        return LocationSensitiveAttention(
            representation_dim=hp_like.attention_dimension,
            kernel_size=hp_like.attention_kernel_size,
            location_channels=hp_like.attention_location_dimension,
            smoothing=False,
            dtype=dtype,
            name="attention",
        )
    if attention_type == "forward":
        return ForwardAttention(
            representation_dim=hp_like.attention_dimension, dtype=dtype,
            name="attention",
        )
    if attention_type == "forward_transition_agent":
        return ForwardAttentionWithTransition(
            representation_dim=hp_like.attention_dimension, dtype=dtype,
            name="attention",
        )
    raise ValueError(f"unknown attention type: {attention_type}")


class DecoderCell(nn.Module):
    """One autoregressive step (reference loop body, tacotron2.py:180-198).

    carry: h/c of both LSTMs, context, previous raw frame, attention state.
    xs per step: (teacher flag, shifted-target frame, PRNG key).
    broadcast: memory, memory_transform, mask.
    """

    hp_model: Any                 # attribute bag with model dims (HParams)
    train: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        carry: Carry,
        teacher_t: jnp.ndarray,        # [] bool
        target_t: jnp.ndarray,         # [B, M] shifted target frame (zeros at inference)
        rng_t: jax.Array,              # PRNG key
        memory: jnp.ndarray,           # [B, T, Mem]
        memory_transform: jnp.ndarray, # [B, T, A]
        mask: jnp.ndarray,             # [B, T]
    ) -> Tuple[Carry, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        hp = self.hp_model
        k_pre, k_att, k_gen = jax.random.split(rng_t, 3)

        raw_prev = jnp.where(teacher_t, target_t, carry["frame"])
        prev_frame = Prenet(
            output_dim=hp.prenet_dimension,
            num_layers=hp.prenet_layers,
            dropout_rate=hp.dropout,
            dtype=self.dtype,
            name="prenet",
        )(raw_prev, k_pre)

        if hp.decoder_regularization == "zoneout":
            def make_cell(name):
                return ZoneoutLSTMCell(
                    hp.decoder_dimension, hp.zoneout_hidden, hp.zoneout_cell,
                    dtype=self.dtype, name=name,
                )
        else:
            def make_cell(name):
                return DropoutLSTMCell(
                    hp.decoder_dimension, hp.dropout_hidden,
                    dtype=self.dtype, name=name,
                )

        att_in = jnp.concatenate([prev_frame, carry["context"]], axis=-1)
        h_att, c_att = make_cell("attention_lstm")(
            att_in, carry["h_att"], carry["c_att"], k_att, self.train
        )

        context, weights, att_state = _make_attention(
            hp.attention_type, hp, self.dtype
        )(h_att, memory, memory_transform, mask, carry["att_state"], prev_frame)

        gen_in = jnp.concatenate([h_att, context], axis=-1)
        h_gen, c_gen = make_cell("generator_lstm")(
            gen_in, carry["h_gen"], carry["c_gen"], k_gen, self.train
        )

        proto = jnp.concatenate([h_gen, context], axis=-1).astype(self.dtype)
        frame = nn.Dense(hp.num_mels, dtype=self.dtype,
                         name="frame_prediction")(proto).astype(jnp.float32)
        stop = nn.Dense(1, dtype=self.dtype,
                        name="stop_prediction")(proto).astype(jnp.float32)[..., 0]

        new_carry = {
            "h_att": h_att, "c_att": c_att,
            "h_gen": h_gen, "c_gen": c_gen,
            "context": context, "frame": frame,
            "att_state": att_state,
        }
        return new_carry, (frame, stop, weights)


class Decoder(nn.Module):
    """Decoder wrapper: speaker/language conditioning, memory projection,
    scan orchestration (reference: modules/tacotron2.py:102-219)."""

    hp_model: Any
    train: bool = False
    dtype: jnp.dtype = jnp.float32
    # device mesh for data-parallel training through the fused Pallas
    # decode (shard_map over the 'data' axis); None = single-device
    mesh: Any = None

    def setup(self):
        hp = self.hp_model
        if hp.multi_speaker and hp.speaker_embedding_dimension > 0:
            self.speaker_embedding = nn.Embed(
                hp.speaker_number, hp.speaker_embedding_dimension,
                embedding_init=nn.initializers.xavier_uniform(),
            )
        if hp.multi_language and hp.language_embedding_dimension > 0:
            self.language_embedding = nn.Embed(
                hp.language_number, hp.language_embedding_dimension,
                embedding_init=nn.initializers.xavier_uniform(),
            )
        self.memory_proj = nn.Dense(
            hp.attention_dimension, use_bias=False, dtype=self.dtype,
            name="memory",
        )
        scan = nn.scan(
            DecoderCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(0, 0, 0, nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
        )
        # `train` is a construction-time attribute: a train-mode and an
        # eval-mode Decoder share one parameter tree (identical structure).
        self.cell = scan(self.hp_model, self.train, self.dtype, name="cell")

    # -- memory conditioning -------------------------------------------------

    def prepare_memory(
        self,
        encoded: jnp.ndarray,                 # [B, T, C]
        speakers: Optional[jnp.ndarray],      # [B] or [B, T] int
        languages: Optional[jnp.ndarray],     # [B] or [B, T] int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        hp = self.hp_model
        t = encoded.shape[1]

        def expand(ids):
            if ids.ndim == 1:
                ids = jnp.broadcast_to(ids[:, None], (ids.shape[0], t))
            return ids

        memory = encoded
        if hp.multi_speaker and hp.speaker_embedding_dimension > 0:
            emb = self.speaker_embedding(expand(speakers))
            memory = jnp.concatenate([memory, emb.astype(memory.dtype)], axis=-1)
        if hp.multi_language and hp.language_embedding_dimension > 0:
            emb = self.language_embedding(expand(languages))
            memory = jnp.concatenate([memory, emb.astype(memory.dtype)], axis=-1)
        # the scan re-reads memory/memory_transform every frame: keep them in
        # the compute dtype to halve the per-step HBM traffic
        memory = memory.astype(self.dtype)
        return memory, self.memory_proj(memory).astype(self.dtype)

    def initial_carry(self, batch_size: int, max_len: int,
                      memory_dim: int) -> Carry:
        hp = self.hp_model
        z = lambda d: jnp.zeros((batch_size, d), jnp.float32)
        return {
            "h_att": z(hp.decoder_dimension), "c_att": z(hp.decoder_dimension),
            "h_gen": z(hp.decoder_dimension), "c_gen": z(hp.decoder_dimension),
            "context": z(memory_dim), "frame": z(hp.num_mels),
            "att_state": init_attention_state(hp.attention_type, batch_size, max_len),
        }

    # -- training ------------------------------------------------------------

    def __call__(
        self,
        encoded: jnp.ndarray,           # [B, T, C]
        text_lengths: jnp.ndarray,      # [B]
        target: jnp.ndarray,            # [B, F, M]
        teacher_forcing_ratio: float | jnp.ndarray,
        speakers: Optional[jnp.ndarray],
        languages: Optional[jnp.ndarray],
        rng: jax.Array,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        b, t = encoded.shape[0], encoded.shape[1]
        frames = target.shape[1]

        memory, memory_transform = self.prepare_memory(encoded, speakers, languages)
        mask = jnp.arange(t)[None, :] < text_lengths[:, None]

        rng_tf, rng_steps = jax.random.split(rng)
        # per-step Bernoulli shared across the batch (tacotron2.py:171)
        teacher = jax.random.bernoulli(rng_tf, teacher_forcing_ratio, (frames,))
        # shifted target: frame fed at step i is target[i-1] (zero at i=0)
        shifted = jnp.concatenate(
            [jnp.zeros_like(target[:, :1]), target[:, :-1]], axis=1
        )

        if self._use_fused_train(b, t, memory.shape[-1]):
            # fused Pallas chunk kernels with a custom VJP: weights and
            # attention memory stay VMEM-resident across the scan in both
            # the forward and the backward pass (ops/pallas_train_decoder.py)
            from multilingual_text_to_speech_tpu.ops import (
                pallas_train_decoder,
            )

            decode = pallas_train_decoder.make_train_decode_fn(
                self.hp_model, dtype=self.dtype,
                interpret=self._fused_train_interpret(),
                train=self.train,
            )
            cell_params = self.variables["params"]["cell"]
            # 32-multiple text buckets above 128 pad to the next 64
            # multiple for the T-blocked fold (exact for ls: the masked
            # -inf softmax zeroes padded positions; alignments sliced
            # back below, cotangents flow through the pad transpose)
            t_fused = pallas_train_decoder.padded_t_len(
                t, self.hp_model.attention_type)
            if t_fused != t:
                pad = t_fused - t
                if t not in _LOGGED_PAD_BUCKETS:  # once per bucket shape
                    _LOGGED_PAD_BUCKETS.add(t)
                    import logging

                    logging.info(
                        "fused train decoder: padding %d-symbol bucket to "
                        "%d for the T-blocked fold (+%.0f%% attention "
                        "compute on this bucket)", t, t_fused,
                        100.0 * pad / t)
                memory = jnp.pad(memory, ((0, 0), (0, pad), (0, 0)))
                memory_transform = jnp.pad(
                    memory_transform, ((0, 0), (0, pad), (0, 0)))
                mask = jnp.pad(mask, ((0, 0), (0, pad)))
            if self.mesh is not None and self.mesh.size > 1:
                # the XLA SPMD partitioner cannot shard the Pallas custom
                # call by itself, so the decode runs per-shard via
                # shard_map; shard_map's transpose psums the replicated-in
                # parameter cotangents (the DP gradient all-reduce)
                from jax.sharding import PartitionSpec as P

                mp = self.mesh.shape.get("model", 1)
                if b % self.mesh.size == 0:
                    # batch divides the WHOLE mesh: flatten (data, model)
                    # into one data-parallel axis — the model-axis devices
                    # do useful decode work instead of idling/duplicating,
                    # and the transpose's psum over both axes IS the DP
                    # gradient reduction
                    axes = ("data", "model")

                    def sharded(cp, mem, mt_, msk, shf, tch, key):
                        idx = (jax.lax.axis_index("data") * mp
                               + jax.lax.axis_index("model"))
                        key = jax.random.fold_in(key, idx)
                        return decode(cp, mem, mt_, msk, shf, tch, key)
                else:
                    # batch divides only the data axis: every model-axis
                    # device recomputes its data-shard's decode with
                    # IDENTICAL rng (outputs replicated over 'model').
                    # The transpose delivers each output cotangent to the
                    # model axis WITHOUT duplication, so the psum'd
                    # parameter cotangents come out exact — verified
                    # against single-device autodiff in
                    # test_shard_map_grad_parity[replicate]
                    axes = ("data",)

                    def sharded(cp, mem, mt_, msk, shf, tch, key):
                        key = jax.random.fold_in(
                            key, jax.lax.axis_index("data"))
                        return decode(cp, mem, mt_, msk, shf, tch, key)

                fn = jax.shard_map(
                    sharded, mesh=self.mesh,
                    in_specs=(P(), P(axes), P(axes), P(axes),
                              P(axes), P(), P()),
                    out_specs=(P(axes), P(axes), P(axes)),
                    check_vma=False,
                )
                spec, stops, aligns = fn(
                    cell_params, memory, memory_transform, mask,
                    shifted, teacher, rng_steps)
            else:
                spec, stops, aligns = decode(
                    cell_params, memory, memory_transform,
                    mask, shifted, teacher, rng_steps,
                )
            if t_fused != t:   # padded weights are exactly zero (ls)
                aligns = aligns[:, :, :t]
            return spec, stops, aligns

        step_rngs = jax.random.split(rng_steps, frames)

        carry = self.initial_carry(b, t, memory.shape[-1])
        _, (spec, stops, aligns) = self.cell(
            carry,
            teacher,
            jnp.swapaxes(shifted, 0, 1),   # [F, B, M]
            step_rngs,
            memory, memory_transform, mask,
        )
        return (
            jnp.swapaxes(spec, 0, 1),      # [B, F, M]
            jnp.swapaxes(stops, 0, 1),     # [B, F]
            jnp.swapaxes(aligns, 0, 1),    # [B, F, T]
        )

    @staticmethod
    def _mesh_shard_batch(mesh, batch: int) -> int | None:
        """Per-shard decode batch for the fused kernels on this mesh, or
        None if the batch fits neither sharding scheme.

        Scheme 1 (preferred): batch divides the whole mesh — flatten
        (data, model) into one DP axis.  Scheme 2: batch divides only the
        data axis — model-axis devices replicate their data shard's decode
        (with gradient rescale).  Otherwise: XLA scan fallback."""
        if mesh is None or mesh.size == 1:
            return batch
        dp = mesh.shape.get("data", 1)
        if batch % mesh.size == 0:
            return batch // mesh.size
        if batch % dp == 0:
            return batch // dp
        return None

    def _fused_train_interpret(self) -> bool:
        import os

        return os.environ.get("MTTS_PALLAS_TRAIN_DECODER", "") == "interpret"

    def _use_fused_train(self, batch: int, t_len: int,
                         mem_dim: int) -> bool:
        """Route training decode through the fused Pallas kernels when the
        config/hardware supports it (same gate shape as the Synthesizer's
        inference kernel; MTTS_PALLAS_TRAIN_DECODER: ""/auto, "off", or
        "interpret" to force the interpreter on non-TPU backends)."""
        import os

        # applies to BOTH modes of the teacher-forced forward: training
        # (custom-VJP kernels) and eval/GTA (forward-only, deterministic
        # zoneout interpolation). Inference decode_chunk has its own kernel.
        if self.is_initializing():
            return False
        from multilingual_text_to_speech_tpu.ops import pallas_train_decoder

        force = os.environ.get("MTTS_PALLAS_TRAIN_DECODER", "")
        hp = self.hp_model
        n_dev = len(jax.devices())
        # single chip, or an explicit mesh — then shard_map runs the kernel
        # per shard (the XLA SPMD partitioner cannot shard the custom call
        # by itself); data-parallel AND tensor-parallel meshes are covered
        # (see _mesh_shard_batch for the two sharding schemes).
        # "interpret" (a debug/test override) only relaxes the hardware
        # checks, never the mesh-suitability ones: a non-divisible batch
        # must always fall back to the XLA scan.
        if self.mesh is not None:
            shard_batch_size = self._mesh_shard_batch(self.mesh, batch)
            mesh_ok = shard_batch_size is not None
            shard_batch_size = shard_batch_size or batch
        else:
            # plain apply (no sharded inputs): runs on the default device
            mesh_ok = n_dev == 1 or force == "interpret"
            shard_batch_size = batch
        # shape/VMEM checks run at the PADDED length the fused branch
        # will actually decode (64-multiple routing pad above 128, ls)
        t_len = pallas_train_decoder.padded_t_len(t_len, hp.attention_type)
        return (
            bool(getattr(hp, "use_pallas_train_decoder", False))
            and pallas_train_decoder.supports(hp)
            and pallas_train_decoder.supports_shapes(shard_batch_size, t_len)
            # byte-model fit check at the actual dims: long texts at large
            # hidden dims bust the backward kernel's VMEM well below the
            # flat 256-symbol bound — those must take the XLA scan, not
            # crash in Mosaic (interpret mode has no VMEM limit)
            and (force == "interpret" or pallas_train_decoder.fits_vmem(
                hp, shard_batch_size, t_len, mem_dim,
                int(hp.attention_dimension), dtype=self.dtype,
                train=self.train))
            and force != "off"
            and mesh_ok
            and (jax.devices()[0].platform == "tpu" or force == "interpret")
        )

    # -- inference (chunked) ---------------------------------------------------

    def decode_chunk(
        self,
        carry: Carry,
        memory: jnp.ndarray,
        memory_transform: jnp.ndarray,
        mask: jnp.ndarray,
        rng: jax.Array,
        chunk_frames: int,
    ) -> Tuple[Carry, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Run `chunk_frames` free-running steps; the host driver checks the
        stop tokens between chunks for early exit.

        Alignments are NOT returned: dropping them lets XLA eliminate the
        per-step [B, T] output stacking inside the scan (profiled at several
        us/step of pure HBM writes at serving batch sizes)."""
        hp = self.hp_model
        b = memory.shape[0]
        teacher = jnp.zeros((chunk_frames,), bool)
        dummy_target = jnp.zeros((chunk_frames, b, hp.num_mels), jnp.float32)
        step_rngs = jax.random.split(rng, chunk_frames)
        carry, (spec, stops, _aligns) = self.cell(
            carry, teacher, dummy_target, step_rngs,
            memory, memory_transform, mask,
        )
        return carry, (
            jnp.swapaxes(spec, 0, 1),
            jnp.swapaxes(stops, 0, 1),
        )
