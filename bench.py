"""Benchmark: batched autoregressive mel synthesis throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: mel frames generated per second per chip on the flagship
(generated-encoder multilingual) Tacotron 2, batched free-running decode in
compiled chunks.  Baseline: the driver north-star of 50x real-time per chip
(real-time = 80 mel frames/sec at the 12.5 ms hop), i.e. 4000 frames/sec.
The reference synthesizes batch-1 with a Python frame loop.

Measurement notes: on tunneled devices `block_until_ready` can be a no-op
and host round-trips cost tens of ms, so each timed run chains all decode
chunks through the carry and is forced with ONE tiny host readback; the
measured round-trip latency is subtracted.
"""

from __future__ import annotations

import json
import time

import numpy as np


BASELINE_FRAMES_PER_SEC = 50 * 80.0  # 50x real-time north-star per chip


def _sync(x) -> float:
    """Force completion with a host readback (works even where
    block_until_ready is unreliable)."""
    return float(x)


def main(int8: bool = True):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_hp
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron

    hp = _flagship_hp()
    # throughput-serving chunk size: fewer dispatches per utterance
    # (interactive synthesis defaults to 64 for finer early-exit).
    # On-chip A/B (tools/hw_results/chunk_ab_2026-08-19.log): 256 is
    # 1.012x of 128 (single 240-row block held longer); 512 is 0.967x
    # (the byte model splits it into 120-row blocks).
    hp.decode_chunk_frames = 256
    # W8A8 int8 LSTM-gate matmuls in the fused serving decoder: the shipped
    # serving default (config.py pallas_decoder_int8=True; quality case in
    # PARITY.md "int8 serving mode").  `--no-int8` benches the exact-bf16
    # path.  The emitted JSON records which mode produced the number.
    hp.pallas_decoder_int8 = bool(int8)

    compute_dtype = jnp.bfloat16 if hp.compute_dtype == "bfloat16" else jnp.float32
    model = Tacotron(hp, train=False, dtype=compute_dtype)

    n_langs = len(hp.languages)
    batch = 48 * n_langs           # 240 streams (grouped-encoder divisible)
    text_len = 128
    decode_frames = 512            # 6.4 s of speech per stream per run

    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(3, hp.total_symbols(), (batch, text_len)),
                       jnp.int32)
    text_lengths = jnp.full((batch,), text_len, jnp.int32)
    speakers = jnp.asarray(rng.randint(0, hp.speaker_number, batch), jnp.int32)
    # language-SORTED batch (the Synthesizer's serving layout): each language
    # is one row group and every sample pays only its own language's encoder
    # (synthesis.py::_plan_row_groups; one-hot languages never need the
    # g-fold accent-mixing expansion)
    languages = jnp.asarray(np.arange(batch) // (batch // n_langs), jnp.int32)
    group_langs = jnp.arange(n_langs, dtype=jnp.int32)

    key = jax.random.PRNGKey(0)
    dummy_target = jnp.zeros((batch, 64, hp.num_mels), jnp.float32)
    variables = jax.jit(model.init, static_argnames=())(
        key, text, text_lengths, dummy_target,
        jnp.full((batch,), 64, jnp.int32), speakers, languages, 0.0, key,
    )

    encode = jax.jit(lambda v, t, tl, s, l: model.apply(
        v, t, tl, s, l, group_langs=group_langs,
        method=Tacotron.encode_for_inference))

    from multilingual_text_to_speech_tpu.ops import pallas_decoder

    if (getattr(hp, "use_pallas_decoder", False)
            and pallas_decoder.supports(hp)
            # mirror synthesis.py's per-call gate: long texts outgrow the
            # folded attention operands' VMEM and must take the XLA scan
            and pallas_decoder.supports_shapes(text_len)
            and jax.devices()[0].platform == "tpu"):
        # fused whole-chunk Pallas decoder: weights + attention memory stay
        # VMEM-resident across the chunk (ops/pallas_decoder.py)
        fused = pallas_decoder.make_decode_fn(hp, variables, compute_dtype)
        decode_chunk = jax.jit(
            lambda v, carry, m, mt, mask, r: fused(carry, m, mt, mask, r))
    else:
        decode_chunk = jax.jit(
            lambda v, carry, m, mt, mask, r: model.apply(
                v, carry, m, mt, mask, r, hp.decode_chunk_frames,
                method=Tacotron.decode_chunk),
        )

    n_chunks = decode_frames // hp.decode_chunk_frames

    def run(seed: int) -> float:
        """One full decode; returns a scalar depending on every chunk."""
        memory, mt, mask, carry = encode(
            variables, text, text_lengths, speakers, languages
        )
        k = jax.random.PRNGKey(seed)
        acc = None
        for _ in range(n_chunks):
            k, sub = jax.random.split(k)
            carry, (spec, stop) = decode_chunk(
                variables, carry, memory, mt, mask, sub
            )
            s = spec[0, -1, 0]
            acc = s if acc is None else acc + s
        return _sync(acc)

    run(0)  # warmup + compile

    # Preferred measurement: DEVICE time from a jax.profiler trace — immune
    # to the host<->device tunnel latency/variance of wall-clock timing.
    device_secs = _profiled_device_secs(lambda: run(1))

    if device_secs is not None:
        frames_per_sec = batch * decode_frames / device_secs
    else:
        # fallback: wall clock minus measured round-trip latency
        one = jax.jit(lambda x: x + 1)
        _sync(one(jnp.float32(0)))
        t0 = time.perf_counter()
        for _ in range(5):
            _sync(one(jnp.float32(0)))
        latency = (time.perf_counter() - t0) / 5

        times = []
        for i in range(3):
            t0 = time.perf_counter()
            run(i + 2)
            times.append(time.perf_counter() - t0)
        best = max(min(times) - latency, 1e-6)
        frames_per_sec = batch * decode_frames / best

    print(json.dumps({
        "metric": "batched_ar_mel_synthesis_throughput",
        "value": round(frames_per_sec, 1),
        "unit": "mel_frames_per_sec_per_chip",
        "vs_baseline": round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 3),
        # self-description: exactly which serving configuration this is
        "config": {
            "compute_dtype": hp.compute_dtype,
            "lstm_gates_int8": bool(hp.pallas_decoder_int8),
            "batch_streams": batch,
            "chunk_frames": hp.decode_chunk_frames,
        },
    }))


def _profiled_device_secs(run_fn):
    """Run ``run_fn`` under a jax.profiler trace and return the summed
    DEVICE-side time (seconds) of the jitted computations, or None if
    tracing fails.  Wall clock through the device tunnel jitters by tens of
    milliseconds between runs; device events do not."""
    import glob
    import gzip
    import tempfile

    import jax

    try:
        trace_dir = tempfile.mkdtemp(prefix="bench_trace_")
        jax.profiler.start_trace(trace_dir)
        run_fn()
        jax.profiler.stop_trace()

        trace_file = sorted(glob.glob(
            f"{trace_dir}/**/*.trace.json.gz", recursive=True))[-1]
        data = json.load(gzip.open(trace_file))
        events = data["traceEvents"]
        pids = {
            e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        device_us = sum(
            e.get("dur", 0)
            for e in events
            if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), "")
            and e.get("name", "").startswith("jit_")
        )
        return device_us / 1e6 if device_us > 0 else None
    except Exception:
        return None


def train_bench():
    """Secondary benchmark (``python bench.py --train``): full training-step
    throughput on the flagship model — forward, composite loss, grads, clip,
    Adam — in utterance-seconds of audio trained per wall second."""
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_hp, _make_batch
    from multilingual_text_to_speech_tpu.models.tacotron import (
        Tacotron,
        tacotron_loss,
    )
    from multilingual_text_to_speech_tpu.training.trainer import (
        dropout_stream_key,
        make_optimizer,
    )

    hp = _flagship_hp()
    model = Tacotron(hp, train=True, dtype=jnp.bfloat16)
    batch, text_len, frames = 50, 128, 512  # generated_switching batch size

    arrays = _make_batch(hp, batch, text_len, frames)
    (text, text_lengths, target, target_lengths, stop,
     speakers, languages) = arrays

    key = jax.random.PRNGKey(0)
    variables = jax.jit(model.init)(
        key, text, text_lengths, target, target_lengths, speakers, languages,
        1.0, key,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(hp)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, rng):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                text, text_lengths, target, target_lengths,
                speakers, languages, 1.0, rng,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_stream_key(hp, rng)},
            )
            total, _ = tacotron_loss(
                out, hp=hp, input_lengths=text_lengths,
                target_lengths=target_lengths, pre_target=target,
                post_target=target, stop_target=stop, speakers=speakers,
                guided_att_variance=0.25,
            )
            return total, mut

        (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return (loss, optax.apply_updates(params, updates),
                mut.get("batch_stats", batch_stats), new_opt)

    loss, params, batch_stats, opt_state = train_step(
        params, batch_stats, opt_state, key)
    float(loss)  # force warmup

    # preferred: device time from a profiler trace (same as the main bench)
    state = {"params": params, "bs": batch_stats, "opt": opt_state}

    def one_step(i):
        loss, state["params"], state["bs"], state["opt"] = train_step(
            state["params"], state["bs"], state["opt"],
            jax.random.PRNGKey(i))
        float(loss)

    device_secs = _profiled_device_secs(lambda: one_step(1))
    if device_secs is not None:
        best = device_secs
    else:
        # fallback only: wall clock minus measured round-trip latency
        one = jax.jit(lambda x: x + 1)
        float(one(jnp.float32(0)))
        t0 = time.perf_counter()
        for _ in range(5):
            float(one(jnp.float32(0)))
        latency = (time.perf_counter() - t0) / 5

        times = []
        for i in range(3):
            t0 = time.perf_counter()
            one_step(i + 2)
            times.append(time.perf_counter() - t0)
        best = max(min(times) - latency, 1e-6)
    # 512 frames/utt at 80 frames/s = 6.4 s of audio per stream
    audio_secs = batch * frames / 80.0
    print(json.dumps({
        "metric": "train_step_throughput",
        "value": round(audio_secs / best, 2),
        "unit": "audio_seconds_trained_per_sec_per_chip",
        "vs_baseline": round(best, 4),  # raw step seconds for reference
        "config": {"compute_dtype": "bfloat16", "batch": batch,
                   "frames": frames, "fused_train_decoder": True},
    }))


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "--train":
        train_bench()
    else:
        main(int8="--no-int8" not in sys.argv[1:])
