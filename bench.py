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


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_hp
    from multilingual_text_to_speech_tpu.models.tacotron import Tacotron

    hp = _flagship_hp()
    # throughput-serving chunk size: fewer dispatches per utterance
    # (interactive synthesis defaults to 64 for finer early-exit)
    hp.decode_chunk_frames = 128

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
    languages = jnp.asarray(np.arange(batch) % n_langs, jnp.int32)

    key = jax.random.PRNGKey(0)
    dummy_target = jnp.zeros((batch, 64, hp.num_mels), jnp.float32)
    variables = jax.jit(model.init, static_argnames=())(
        key, text, text_lengths, dummy_target,
        jnp.full((batch,), 64, jnp.int32), speakers, languages, 0.0, key,
    )

    encode = jax.jit(lambda v, t, tl, s, l: model.apply(
        v, t, tl, s, l, method=Tacotron.encode_for_inference))
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
            carry, (spec, stop, _) = decode_chunk(
                variables, carry, memory, mt, mask, sub
            )
            s = spec[0, -1, 0]
            acc = s if acc is None else acc + s
        return _sync(acc)

    run(0)  # warmup + compile

    # measure host<->device round-trip latency to subtract
    one = jax.jit(lambda x: x + 1)
    _sync(one(jnp.float32(0)))
    t0 = time.perf_counter()
    for _ in range(5):
        _sync(one(jnp.float32(0)))
    latency = (time.perf_counter() - t0) / 5

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)

    best = max(min(times) - latency, 1e-6)
    frames_per_sec = batch * decode_frames / best

    print(json.dumps({
        "metric": "batched_ar_mel_synthesis_throughput",
        "value": round(frames_per_sec, 1),
        "unit": "mel_frames_per_sec_per_chip",
        "vs_baseline": round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
