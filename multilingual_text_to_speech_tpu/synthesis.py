"""Synthesis driver: text -> spectrogram -> (Griffin-Lim) waveform.

Rebuild of ``/root/reference/synthesize.py`` including the language-spec
mini-language for code-switching and accent control (synthesize.py:15-38):

    MONO:                 "id|text"
    multi:                "id|text|speaker|de"
    per-character langs:  "id|text|speaker|de-10,fr-9,de"
    accent blending:      "id|text|speaker|de-10,fr*0.75:de*0.25-9,de"

TPU design: the autoregressive decode runs in fixed-size compiled chunks
(``hp.decode_chunk_frames``); between chunks the host checks one boolean for
early stop.  Text is padded to ``hp.bucket_text_multiple`` so the compile
cache covers all utterance lengths with a handful of programs (the grouped
encoders are padding-invariant thanks to per-layer length masking).
"""

from __future__ import annotations

import functools
import logging
import os
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multilingual_text_to_speech_tpu.models.tacotron import Tacotron
from multilingual_text_to_speech_tpu.ops import audio as audio_ops
from multilingual_text_to_speech_tpu.text import SymbolTable, clean_text
from multilingual_text_to_speech_tpu.training.checkpoint import (
    load_checkpoint,
    restore_into,
)


def parse_language_spec(spec: str, hp, t_length: int) -> np.ndarray:
    """Parse the code-switching/accent spec into per-character weights
    ``[1, T, L]`` (reference: synthesize.py:55-70).

    Segments are ``lang[-length]`` separated by commas; a segment language
    may be a weighted blend ``l1*w1:l2*w2``; the last segment takes all
    remaining characters.
    """
    num_langs = hp.language_number if hp.language_number else len(hp.languages)
    weights: List[List[float]] = []
    remaining = t_length
    for token in spec.split(","):
        parts = token.split("-")
        lang_weights = [0.0] * num_langs
        for component in parts[0].split(":"):
            sub = component.split("*")
            if sub[0] not in hp.languages:
                raise ValueError(
                    f"unknown language '{sub[0]}' in spec '{spec}'; "
                    f"this model knows {hp.languages}"
                )
            lang_weights[hp.languages.index(sub[0])] = (
                1.0 if len(sub) == 1 else float(sub[1])
            )
        seg_len = int(parts[1]) if len(parts) == 2 else remaining
        weights += [lang_weights] * seg_len
        remaining -= seg_len
        if remaining < 0:
            # checked per segment: a trailing remainder segment would
            # otherwise absorb the deficit and silently emit extra rows
            raise ValueError(
                f"language spec '{spec}' covers {t_length - remaining} "
                f"characters but the text has only {t_length}"
            )
    if remaining > 0:
        raise ValueError(
            f"language spec '{spec}' covers {t_length - remaining} of "
            f"{t_length} characters — the last segment should omit its "
            "length to take the remainder"
        )
    return np.asarray([weights], dtype=np.float32)  # [1, T, L]



def _pure_language(weights: np.ndarray) -> Optional[int]:
    """If the per-character weights [1, T, L] are one single one-hot language
    for every character, return that language index; else None."""
    w = weights[0]
    lang = int(np.argmax(w[0]))
    target = np.zeros(w.shape[1], w.dtype)
    target[lang] = 1.0
    return lang if bool(np.all(w == target)) else None


def _plan_row_groups(langs: List[int], max_overhead: float = 0.125):
    """Plan a language-sorted, run-padded batch for row-group encoding.

    Returns ``(slots, group_langs, rows_per_group)`` where ``slots`` is a
    list of original indices (None = padding slot) laid out so every
    ``rows_per_group`` consecutive slots share one language, and
    ``group_langs[r]`` is that language.  Picks the largest row-group size
    whose padding overhead stays under ``max_overhead`` (larger row groups
    amortize the per-row-group kernel gather; Bp=1 is always exact)."""
    n = len(langs)
    counts: dict = {}
    for l in langs:
        counts[l] = counts.get(l, 0) + 1
    bp = 1
    for cand in (64, 48, 32, 24, 16, 12, 8, 6, 4, 3, 2):
        padded = sum(-(-c // cand) * cand for c in counts.values())
        if padded <= n * (1.0 + max_overhead):
            bp = cand
            break
    slots: List[Optional[int]] = []
    group_langs: List[int] = []
    for lang in sorted(counts):
        idx = [i for i, l in enumerate(langs) if l == lang]
        pad = (-len(idx)) % bp
        slots += idx + [None] * pad
        group_langs += [lang] * ((len(idx) + pad) // bp)
    return slots, group_langs, bp


def _speaker_index(hp, name: str) -> int:
    """Speaker name -> index with a helpful error (reference indexes blindly,
    synthesize.py:74)."""
    speakers = list(getattr(hp, "unique_speakers", []))
    if name not in speakers:
        raise ValueError(
            f"unknown speaker '{name}'; this model knows {speakers}"
        )
    return speakers.index(name)


def _bucket(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


class Synthesizer:
    """Holds an eval-mode model + params and drives chunked decoding.

    Build from a checkpoint (hp embedded, reference build_model parity:
    utils/__init__.py:29-37) or directly from (hp, variables)."""

    def __init__(self, hp, variables, max_chunks: Optional[int] = None):
        self.hp = hp
        self.variables = variables
        compute_dtype = (
            jnp.bfloat16 if getattr(hp, "compute_dtype", "float32") == "bfloat16"
            else jnp.float32
        )
        self.model = Tacotron(hp, train=False, dtype=compute_dtype)
        self.chunk = int(getattr(hp, "decode_chunk_frames", 64))
        self.max_chunks = max_chunks or (
            (hp.max_output_length + self.chunk - 1) // self.chunk
        )
        self._encode = jax.jit(
            functools.partial(self.model.apply,
                              method=Tacotron.encode_for_inference)
        )
        self._decode_chunk = self._build_decode_chunk(compute_dtype)
        self._postnet = jax.jit(
            functools.partial(self.model.apply, method=Tacotron.apply_postnet)
        )

    def _build_decode_chunk(self, compute_dtype):
        """Pick the AR decode implementation for this config/hardware.

        On TPU with a supported config (location-sensitive attention), the
        fused whole-chunk Pallas kernel (ops/pallas_decoder.py) replaces the
        XLA scan: decoder weights and attention memory stay VMEM-resident
        across the chunk instead of streaming from HBM every step.  Both
        paths share the same ``(variables, carry, memory, mt, mask, rng)``
        call shape and carry pytree, so callers and chunk chaining are
        implementation-agnostic.
        """
        from multilingual_text_to_speech_tpu.ops import pallas_decoder

        xla_decode = jax.jit(
            functools.partial(self.model.apply,
                              method=Tacotron.decode_chunk),
            static_argnames=("chunk_frames",),
        )
        # MTTS_PALLAS_DECODER: "" (auto), "off", or "interpret" (force the
        # fused path through the Pallas interpreter on non-TPU backends —
        # used by tests to exercise the wrapper + fallback off-device)
        force = os.environ.get("MTTS_PALLAS_DECODER", "")
        use_fused = (
            bool(getattr(self.hp, "use_pallas_decoder", False))
            and pallas_decoder.supports(self.hp)
            and force != "off"
            and (jax.devices()[0].platform == "tpu" or force == "interpret")
        )
        if not use_fused:
            return xla_decode

        fused = pallas_decoder.make_decode_fn(
            self.hp, self.variables, compute_dtype,
            interpret=(force == "interpret"))

        @functools.partial(jax.jit, static_argnames=("chunk_frames",))
        def fused_decode(variables, carry, memory, mt, mask, rng,
                         chunk_frames=self.chunk):
            del variables  # weights were extracted into the kernel bundle
            return fused(carry, memory, mt, mask, rng,
                         chunk_frames=chunk_frames)

        warned: set = set()

        def decode(variables, carry, memory, mt, mask, rng,
                   chunk_frames=self.chunk):
            # very long texts outgrow the kernel's VMEM-resident attention
            # operands (>512 bucketed symbols, or whatever the VMEM byte
            # model reports for these dims) — fall back to the XLA scan
            t_len = memory.shape[1]
            ok = pallas_decoder.supports_shapes(t_len) and (
                pallas_decoder.fits_vmem(
                    t_len, memory.shape[-1], mt.shape[-1],
                    carry["h_att"].shape[-1], carry["frame"].shape[-1],
                    int(self.hp.prenet_dimension), chunk_frames,
                    compute_dtype,
                    quantized=bool(getattr(self.hp, "pallas_decoder_int8",
                                           False)),
                    att_kind=pallas_decoder.att_kind_of(self.hp),
                    n_prenet=int(self.hp.prenet_layers)))
            if not ok:
                if t_len not in warned:  # log once per text-length bucket
                    warned.add(t_len)
                    logging.warning(
                        "text length %d exceeds the fused decoder's VMEM "
                        "budget; decoding on the (slower) XLA scan path",
                        t_len)
                return xla_decode(variables, carry, memory, mt, mask, rng,
                                  chunk_frames=chunk_frames)
            return fused_decode(variables, carry, memory, mt, mask, rng,
                                chunk_frames=chunk_frames)

        return decode

    @classmethod
    def from_checkpoint(cls, path: str, **kwargs) -> "Synthesizer":
        payload = load_checkpoint(path)
        hp = payload["hp"]
        model = Tacotron(hp, train=False)
        # build template variables to restore into; the grouped encoders'
        # training contract needs a language-interleaved batch of size L
        b = max(hp.language_number, 1) if hp.multi_language else 1
        t = hp.bucket_text_multiple
        dummy_text = jnp.zeros((b, t), jnp.int32)
        dummy_target = jnp.zeros((b, hp.bucket_frame_multiple, hp.num_mels))
        speakers = jnp.zeros((b,), jnp.int32) if hp.multi_speaker else None
        languages = jnp.arange(b, dtype=jnp.int32) if hp.multi_language else None
        template = jax.jit(model.init)(
            jax.random.PRNGKey(0), dummy_text, jnp.full((b,), t), dummy_target,
            jnp.full((b,), hp.bucket_frame_multiple), speakers, languages,
            0.0, jax.random.PRNGKey(0),
        )
        restored = restore_into(
            payload,
            params=template["params"],
            batch_stats=template.get("batch_stats", {}),
        )
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
        return cls(hp, variables, **kwargs)

    # -- core ----------------------------------------------------------------

    def spectrogram_from_ids(
        self,
        sequence: np.ndarray,                 # [T] int
        speaker: Optional[int] = None,
        language_weights: Optional[np.ndarray] = None,  # [1, T, L]
        seed: int = 0,
    ) -> np.ndarray:
        """Run encoder + chunked AR decode + postnet; returns the
        DENORMALIZED spectrogram in reference layout [bins, frames]."""
        hp = self.hp
        t = len(sequence)
        t_pad = _bucket(t, hp.bucket_text_multiple)

        text = np.zeros((1, t_pad), np.int32)
        text[0, :t] = sequence
        lang = None
        pure = (_pure_language(language_weights)
                if language_weights is not None else None)
        if language_weights is not None and pure is None:
            lang = np.zeros((1, t_pad, language_weights.shape[2]), np.float32)
            lang[:, :t] = language_weights
            # padding needs a nonzero weight row for normalization stability
            lang[:, t:] = language_weights[:, -1:]
        spk = (
            jnp.asarray([speaker], jnp.int32) if speaker is not None else None
        )

        if pure is not None:
            # single-language utterance: row-group encode (1 row group) —
            # pays one language's encoder instead of all g of them
            memory, mt, mask, carry = self._encode(
                self.variables, jnp.asarray(text), jnp.asarray([t]), spk,
                jnp.asarray([pure], jnp.int32),
                group_langs=jnp.asarray([pure], jnp.int32),
            )
        else:
            memory, mt, mask, carry = self._encode(
                self.variables, jnp.asarray(text), jnp.asarray([t]), spk,
                jnp.asarray(lang) if lang is not None else None,
            )

        key = jax.random.PRNGKey(seed)
        frames: List[np.ndarray] = []
        total = 0
        for i in range(self.max_chunks):
            key, sub = jax.random.split(key)
            carry, (spec, stop) = self._decode_chunk(
                self.variables, carry, memory, mt, mask, sub,
                chunk_frames=self.chunk,
            )
            stop_np = np.asarray(jax.nn.sigmoid(stop[0]))
            spec_np = np.asarray(spec[0])
            hit = np.where(stop_np >= 0.5)[0]
            if len(hit):
                # emit hp.stop_frames frames after the first stop
                # (reference: tacotron2.py:200-207)
                cut = min(int(hit[0]) + 1 + hp.stop_frames, spec_np.shape[0])
                frames.append(spec_np[:cut])
                total += cut
                break
            frames.append(spec_np)
            total += spec_np.shape[0]
            if total >= hp.max_output_length:
                break

        pre = np.concatenate(frames, axis=0)[None]           # [1, F, M]
        f_pad = _bucket(pre.shape[1], hp.bucket_frame_multiple)
        pre_padded = np.zeros((1, f_pad, pre.shape[2]), np.float32)
        pre_padded[:, : pre.shape[1]] = pre
        post = self._postnet(
            self.variables, jnp.asarray(pre_padded),
            jnp.asarray([pre.shape[1]]),
        )
        post = np.asarray(post[0, : pre.shape[1]]).T          # [bins, F]

        if hp.normalize_spectrogram:
            post = audio_ops.denormalize_spectrogram(
                post, hp, not hp.predict_linear
            )
        return post

    def spectrograms_from_batch(
        self,
        sequences,                      # list of [T_i] int arrays
        speakers=None,                  # list of ints or None
        language_weights=None,          # list of [1, T_i, L] or None
        seed: int = 0,
    ):
        """Batched synthesis — the TPU-native upgrade over the reference's
        batch-1 loop (synthesize.py:112-123): all utterances decode together
        in compiled chunks; each sample is cropped at its own stop token.
        Returns a list of denormalized [bins, F_i] spectrograms."""
        hp = self.hp
        n_in = len(sequences)
        t_pad = _bucket(max(len(s) for s in sequences), hp.bucket_text_multiple)

        # ---- language plan: one-hot languages take the row-group encode
        # path (language-sorted batch, each sample pays ONLY its own
        # language's grouped encoder); true fractional accent blends keep
        # the reference-style all-groups mixing path -----------------------
        pure: Optional[List[int]] = None
        if language_weights is not None:
            cand = [_pure_language(w) for w in language_weights]
            if all(c is not None for c in cand):
                pure = cand  # type: ignore[assignment]
        if pure is not None:
            slots, group_langs, _ = _plan_row_groups(pure)
        else:
            slots, group_langs = list(range(n_in)), None
        b = len(slots)

        text = np.zeros((b, t_pad), np.int32)
        lengths = np.ones(b, np.int32)       # padding slots: length-1 dummies
        for s_i, i in enumerate(slots):
            if i is None:
                continue
            seq = sequences[i]
            text[s_i, : len(seq)] = seq
            lengths[s_i] = len(seq)

        lang = None
        lang_ids = None
        if pure is not None:
            lang_ids = np.zeros(b, np.int32)
            for s_i, i in enumerate(slots):
                lang_ids[s_i] = pure[i] if i is not None else 0
            # padding slots inherit their row group's language
            rows = b // len(group_langs)
            for s_i, i in enumerate(slots):
                if i is None:
                    lang_ids[s_i] = group_langs[s_i // rows]
        elif language_weights is not None:
            num_l = language_weights[0].shape[2]
            lang = np.zeros((b, t_pad, num_l), np.float32)
            for i, w in enumerate(language_weights):
                lang[i, : w.shape[1]] = w[0]
                lang[i, w.shape[1]:] = w[0, -1]  # nonzero rows in padding
        spk = None
        if speakers is not None:
            spk_arr = np.zeros(b, np.int32)
            for s_i, i in enumerate(slots):
                spk_arr[s_i] = speakers[i] if i is not None else 0
            spk = jnp.asarray(spk_arr)

        if pure is not None:
            memory, mt, mask, carry = self._encode(
                self.variables, jnp.asarray(text), jnp.asarray(lengths), spk,
                jnp.asarray(lang_ids),
                group_langs=jnp.asarray(group_langs, jnp.int32),
            )
        else:
            memory, mt, mask, carry = self._encode(
                self.variables, jnp.asarray(text), jnp.asarray(lengths), spk,
                jnp.asarray(lang) if lang is not None else None,
            )

        key = jax.random.PRNGKey(seed)
        chunks: List[np.ndarray] = []
        stop_at = np.full(b, -1, np.int64)   # absolute frame of first stop
        for s_i, i in enumerate(slots):
            if i is None:
                stop_at[s_i] = 0             # padding decodes but never waits
        total = 0
        for _ in range(self.max_chunks):
            key, sub = jax.random.split(key)
            carry, (spec, stop) = self._decode_chunk(
                self.variables, carry, memory, mt, mask, sub,
                chunk_frames=self.chunk,
            )
            chunks.append(np.asarray(spec))
            stop_np = np.asarray(jax.nn.sigmoid(stop)) >= 0.5  # [B, chunk]
            for i in range(b):
                if stop_at[i] < 0:
                    hit = np.where(stop_np[i])[0]
                    if len(hit):
                        stop_at[i] = total + int(hit[0])
            total += self.chunk
            pending = stop_at < 0
            done_enough = (~pending) & (stop_at + 1 + hp.stop_frames <= total)
            if done_enough.all() or total >= hp.max_output_length:
                break

        pre = np.concatenate(chunks, axis=1)   # [B, F_total, M]
        cuts = np.where(
            stop_at >= 0,
            np.minimum(stop_at + 1 + hp.stop_frames, pre.shape[1]),
            pre.shape[1],
        ).astype(np.int64)

        # batched postnet at one padded length, then per-sample crop
        f_pad = _bucket(int(cuts.max()), hp.bucket_frame_multiple)
        pre_padded = np.zeros((b, f_pad, pre.shape[2]), np.float32)
        for i in range(b):
            pre_padded[i, : cuts[i]] = pre[i, : cuts[i]]
        post = np.asarray(self._postnet(
            self.variables, jnp.asarray(pre_padded), jnp.asarray(cuts)
        ))

        out: List[Optional[np.ndarray]] = [None] * n_in
        for s_i, i in enumerate(slots):
            if i is None:
                continue
            spec = post[s_i, : cuts[s_i]].T  # [bins, F_i]
            if hp.normalize_spectrogram:
                spec = audio_ops.denormalize_spectrogram(
                    spec, hp, not hp.predict_linear
                )
            out[i] = spec
        return out

    def synthesize_batch_lines(self, lines, seed: int = 0):
        """Parse stdin-format lines and synthesize them as ONE batch."""
        hp = self.hp
        table = SymbolTable(hp)
        sequences, speakers, weights = [], [], []
        for line in lines:
            item = line.split("|")
            text = clean_text(item[1], hp)
            sequences.append(np.asarray(table.encode(text), np.int32))
            if hp.multi_language:
                weights.append(
                    parse_language_spec(item[3], hp, len(text) + 1)
                )
            if hp.multi_speaker:
                speakers.append(_speaker_index(hp, item[2]))
        return self.spectrograms_from_batch(
            sequences,
            speakers if hp.multi_speaker else None,
            weights if hp.multi_language else None,
            seed,
        )

    def synthesize_line(self, input_line: str, seed: int = 0) -> np.ndarray:
        """Process one stdin-format line (reference: synthesize.py:41-84)."""
        hp = self.hp
        item = input_line.split("|")
        text = clean_text(item[1], hp)
        table = SymbolTable(hp)
        sequence = np.asarray(table.encode(text), np.int32)

        language_weights = None
        if hp.multi_language:
            language_weights = parse_language_spec(
                item[3], hp, len(text) + 1
            )
        speaker = None
        if hp.multi_speaker:
            speaker = _speaker_index(hp, item[2])

        return self.spectrogram_from_ids(
            sequence, speaker, language_weights, seed
        )

    def vocode(self, spectrogram_db: np.ndarray, seed: int = 0) -> np.ndarray:
        """Griffin-Lim spectrogram -> waveform (reference: synthesize.py:132)."""
        return audio_ops.inverse_spectrogram(
            spectrogram_db, self.hp, mel=not self.hp.predict_linear,
            key=jax.random.PRNGKey(seed),
        )

    def vocode_batch(self, spectrograms, seed: int = 0):
        """Batched Griffin-Lim over a list of [bins, F_i] spectrograms —
        one vmapped device program, cropped per sample."""
        hp = self.hp
        hop = audio_ops.ms_to_frames(hp.stft_shift_ms, hp)
        frames = [s.shape[1] for s in spectrograms]
        f_max = max(frames)
        bins = spectrograms[0].shape[0]
        batch = np.full(
            (len(spectrograms), bins, f_max),
            -100.0, np.float32,  # silence padding in dB
        )
        for i, s in enumerate(spectrograms):
            batch[i, :, : s.shape[1]] = s
        wavs = audio_ops.inverse_spectrogram_batch(
            batch, hp, mel=not hp.predict_linear, key=jax.random.PRNGKey(seed)
        )
        return [w[: hop * max(f - 1, 1)] for w, f in zip(wavs, frames)]
