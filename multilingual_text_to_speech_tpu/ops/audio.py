"""High-level audio DSP mirroring the reference API, on-device where it counts.

Feature-parity rebuild of ``/root/reference/utils/audio.py`` with librosa
semantics reimplemented in JAX (see ops/stft.py, ops/mel.py).  Functions take
``hp`` explicitly instead of reading a global config.

Reference quirk *not* replicated: ``get_mfcc`` at utils/audio.py:122-124
recurses into itself (dead code); here it computes the mel spectrogram first.
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from multilingual_text_to_speech_tpu.ops import mel as mel_ops
from multilingual_text_to_speech_tpu.ops import stft as stft_ops
from multilingual_text_to_speech_tpu.ops.dtw import dtw_path
from multilingual_text_to_speech_tpu.ops.io import load, save  # re-export  # noqa: F401


def ms_to_frames(ms: float, hp) -> int:
    """Milliseconds -> samples (utils/audio.py:25-27)."""
    return int(hp.sample_rate * ms / 1000)


def duration(data, hp) -> float:
    """Duration of a waveform in seconds."""
    return len(data) / hp.sample_rate


# ---------------------------------------------------------------------------
# pre/de-emphasis
# ---------------------------------------------------------------------------

def preemphasis(y: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """FIR y[n] = x[n] - coef*x[n-1] (scipy.signal.lfilter([1,-c],[1],y))."""
    y = jnp.asarray(y)
    return jnp.concatenate([y[:1], y[1:] - coef * y[:-1]])


def deemphasis(y: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """IIR y[n] = x[n] + coef*y[n-1] — a first-order linear recurrence,
    evaluated in O(log N) on device with an associative scan."""
    y = jnp.asarray(y, dtype=jnp.float32)

    # y[n] = a*y[n-1] + x[n] composes as (a1,b1)∘(a2,b2) = (a1*a2, a2*b1+b2)
    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    a = jnp.full_like(y, coef)
    _, out = jax.lax.associative_scan(combine, (a, y))
    return out


# ---------------------------------------------------------------------------
# spectrograms
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=(
    "sample_rate", "num_fft", "num_mels", "window", "hop", "mel",
    "use_preemphasis", "preemphasis_coef"))
def _spectrogram_impl(y, *, sample_rate, num_fft, num_mels, window, hop, mel,
                      use_preemphasis, preemphasis_coef):
    if use_preemphasis:
        y = preemphasis(y, preemphasis_coef)
    S = jnp.abs(stft_ops.stft(y, num_fft, hop, window))
    if mel:
        S = mel_ops.linear_to_mel_spec(S, sample_rate, num_fft, num_mels)
    return mel_ops.amplitude_to_db(S)


def spectrogram(y, hp, mel: bool = False) -> np.ndarray:
    """Waveform -> log-magnitude (optionally mel) spectrogram
    (utils/audio.py:66-73). Runs on device, returns numpy [bins, T]."""
    out = _spectrogram_impl(
        jnp.asarray(y, dtype=jnp.float32),
        sample_rate=hp.sample_rate,
        num_fft=hp.num_fft,
        num_mels=hp.num_mels,
        window=ms_to_frames(hp.stft_window_ms, hp),
        hop=ms_to_frames(hp.stft_shift_ms, hp),
        mel=mel,
        use_preemphasis=bool(hp.use_preemphasis),
        preemphasis_coef=float(hp.preemphasis),
    )
    return np.asarray(out)


def mel_spectrogram(y, hp) -> np.ndarray:
    return spectrogram(y, hp, mel=True)


def linear_to_mel(S_db, hp) -> np.ndarray:
    """dB linear spectrogram -> dB mel spectrogram (utils/audio.py:81-85).
    Note: not identical to the direct mel path because of the db->amplitude
    round-trip — the reference has the same property."""
    S = mel_ops.db_to_amplitude(jnp.asarray(S_db, dtype=jnp.float32))
    M = mel_ops.linear_to_mel_spec(S, hp.sample_rate, hp.num_fft, hp.num_mels)
    return np.asarray(mel_ops.amplitude_to_db(M))


def inverse_spectrogram(s_db, hp, mel: bool = False, key=None) -> np.ndarray:
    """Log-magnitude spectrogram -> waveform via Griffin-Lim
    (utils/audio.py:88-97): db->amplitude, optional mel->linear NNLS,
    S**griffin_lim_power, GL iterations, deemphasis, peak normalize."""
    if key is None:
        key = jax.random.PRNGKey(0)
    S = mel_ops.db_to_amplitude(jnp.asarray(s_db, dtype=jnp.float32))
    if mel:
        S = mel_ops.mel_to_linear_nnls(S, hp.sample_rate, hp.num_fft, hp.num_mels)
    wf = ms_to_frames(hp.stft_window_ms, hp)
    hf = ms_to_frames(hp.stft_shift_ms, hp)
    y = stft_ops.griffin_lim(
        S ** hp.griffin_lim_power,
        key,
        n_fft=hp.num_fft,
        hop_length=hf,
        win_length=wf,
        n_iter=hp.griffin_lim_iters,
    )
    if hp.use_preemphasis:
        y = deemphasis(y, hp.preemphasis)
    y = y / jnp.max(y)
    return np.asarray(y)


def inverse_mel_spectrogram(s_db, hp, key=None) -> np.ndarray:
    return inverse_spectrogram(s_db, hp, mel=True, key=key)


def inverse_spectrogram_batch(s_db_batch, hp, mel: bool = False,
                              key=None) -> np.ndarray:
    """Batched Griffin-Lim: ``[B, bins, F]`` -> waveforms ``[B, samples]``.

    All utterances vocode in ONE vmapped on-device program (the reference
    runs 60 host-side librosa iterations per utterance).  Pad spectrograms
    to a common frame count first; crop waveforms to ``hop * (F_i - 1)``
    per sample afterwards."""
    if key is None:
        key = jax.random.PRNGKey(0)
    S = mel_ops.db_to_amplitude(jnp.asarray(s_db_batch, dtype=jnp.float32))
    if mel:
        S = jax.vmap(
            lambda M: mel_ops.mel_to_linear_nnls(
                M, hp.sample_rate, hp.num_fft, hp.num_mels
            )
        )(S)
    wf = ms_to_frames(hp.stft_window_ms, hp)
    hf = ms_to_frames(hp.stft_shift_ms, hp)
    keys = jax.random.split(key, S.shape[0])
    y = jax.vmap(
        lambda mag, k: stft_ops.griffin_lim(
            mag ** hp.griffin_lim_power, k, n_fft=hp.num_fft,
            hop_length=hf, win_length=wf, n_iter=hp.griffin_lim_iters,
        )
    )(S, keys)
    if hp.use_preemphasis:
        y = jax.vmap(lambda w: deemphasis(w, hp.preemphasis))(y)
    y = y / jnp.max(y, axis=1, keepdims=True)
    return np.asarray(y)


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------

def _norm_constants(hp, is_mel: bool):
    stats = hp.mel_normalization() if is_mel else hp.lin_normalization()
    if stats is None:
        kind = "mel" if is_mel else "lin"
        raise ValueError(
            f"hp.{kind}_normalize_mean/variance are unset — compute them from "
            "the training set (dataset.get_normalization_constants) or load a "
            "checkpoint, before normalizing spectrograms."
        )
    return stats


def normalize_spectrogram(S, hp, is_mel: bool):
    """Per-channel (S - mean) / variance (utils/audio.py:105-108)."""
    mean, var = _norm_constants(hp, is_mel)
    return (S - mean) / var


def denormalize_spectrogram(S, hp, is_mel: bool):
    """Per-channel S * variance + mean (utils/audio.py:111-114)."""
    mean, var = _norm_constants(hp, is_mel)
    return S * var + mean


# ---------------------------------------------------------------------------
# MFCC / MCD
# ---------------------------------------------------------------------------

def get_spectrogram_mfcc(S, hp) -> np.ndarray:
    """MFCCs of a dB mel spectrogram (librosa.feature.mfcc(S=S/10),
    utils/audio.py:117-119)."""
    return np.asarray(
        mel_ops.mfcc_from_db_mel(jnp.asarray(S, dtype=jnp.float32) / 10.0, hp.num_mfcc)
    )


def get_mfcc(y, hp) -> np.ndarray:
    """MFCCs of a waveform (fixes the reference's infinite recursion at
    utils/audio.py:122-124)."""
    return get_spectrogram_mfcc(mel_spectrogram(y, hp), hp)


def mel_cepstral_distortion(
    S1, S2, hp, mode: Literal["cut", "stretch", "dtw"] = "dtw"
) -> float:
    """MCD between two dB mel spectrograms (utils/audio.py:127-160).

    Modes: 'cut' truncates the longer sequence, 'stretch' resamples the
    shorter one by nearest-index, 'dtw' aligns with exact DTW (reference
    uses approximate fastdtw)."""

    def mcd(a: np.ndarray, b: np.ndarray) -> float:
        diff = a - b
        return float(np.mean(np.sqrt(np.sum(diff * diff, axis=0))))

    x = get_spectrogram_mfcc(S1, hp)[1:]  # drop c0
    y = get_spectrogram_mfcc(S2, hp)[1:]

    if mode == "cut":
        n = min(x.shape[1], y.shape[1])
        x, y = x[:, :n], y[:, :n]
    elif mode == "stretch":
        if x.shape[1] > y.shape[1]:
            m = x.shape[1]
            y = y[:, [i * y.shape[1] // m for i in range(m)]]
        else:
            m = y.shape[1]
            x = x[:, [i * x.shape[1] // m for i in range(m)]]
    elif mode == "dtw":
        px, py = dtw_path(x.T, y.T)
        x, y = x[:, px], y[:, py]
    else:
        raise ValueError(f"unknown MCD mode: {mode}")

    return mcd(x, y)


# reference spelling kept as an alias (utils/audio.py:127)
mel_cepstral_distorision = mel_cepstral_distortion


# ---------------------------------------------------------------------------
# silence trimming
# ---------------------------------------------------------------------------

def trim_silence(data: np.ndarray, window_ms: float, hop_ms: float, hp,
                 top_db: float = 50, margin_ms: float = 0):
    """Trim leading/trailing silence (librosa.effects.trim semantics:
    frame RMS power in dB relative to the signal peak, threshold top_db;
    utils/audio.py:30-36)."""
    wf = ms_to_frames(window_ms, hp)
    hf = ms_to_frames(hop_ms, hp)
    mf = ms_to_frames(margin_ms, hp)
    if mf != 0:
        data = data[mf:-mf]

    data = np.asarray(data, dtype=np.float32)
    if len(data) < wf:
        return data, (0, len(data))

    # frame RMS (librosa.feature.rms with center=True pads by wf//2)
    padded = np.pad(data, wf // 2)
    n_frames = 1 + (len(padded) - wf) // hf
    idx = np.arange(n_frames)[:, None] * hf + np.arange(wf)[None, :]
    rms = np.sqrt(np.mean(padded[idx] ** 2, axis=1))

    power_db = 20.0 * np.log10(np.maximum(rms, 1e-10) / max(np.max(rms), 1e-10))
    non_silent = power_db > -top_db

    if not non_silent.any():
        return data[0:0], (0, 0)
    nz = np.flatnonzero(non_silent)
    start = int(nz[0] * hf)
    end = min(len(data), int((nz[-1] + 1) * hf))
    return data[start:end], (start, end)
