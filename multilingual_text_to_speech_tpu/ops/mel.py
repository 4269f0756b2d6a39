"""Mel filterbanks, dB scaling and DCT — librosa-compatible, in JAX/numpy.

Matches the librosa calls made by the reference DSP layer
(``/root/reference/utils/audio.py:44-51,66-85,117-119``):
Slaney mel scale with area normalization (librosa.filters.mel defaults),
``amplitude_to_db(ref=np.max, top_db=None)``, orthonormal type-II DCT MFCCs.

Filterbank/DCT matrices are built once on the host (numpy, float32) and then
used inside jitted programs as constants — the projections themselves are
single MXU matmuls.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

_AMIN = 1e-5  # librosa.amplitude_to_db amin


def hz_to_mel(frequencies: np.ndarray) -> np.ndarray:
    """Slaney (htk=False) Hz->mel: linear below 1 kHz, log above."""
    frequencies = np.asanyarray(frequencies, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = frequencies >= min_log_hz
    mels = np.where(
        log_t,
        min_log_mel + np.log(np.maximum(frequencies, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz(mels: np.ndarray) -> np.ndarray:
    """Slaney mel->Hz inverse."""
    mels = np.asanyarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(
        log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank ``[n_mels, 1 + n_fft//2]``
    (librosa.filters.mel with default htk=False, norm='slaney')."""
    if fmax is None:
        fmax = sample_rate / 2.0

    n_bins = 1 + n_fft // 2
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)

    mel_pts = np.linspace(hz_to_mel(np.array(fmin)), hz_to_mel(np.array(fmax)), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney area normalization: each filter integrates to ~constant energy.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=8)
def dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal type-II DCT matrix ``[n_out, n_in]``
    (scipy.fftpack.dct(type=2, norm='ortho') as used by librosa.feature.mfcc)."""
    n = np.arange(n_in, dtype=np.float64)
    k = np.arange(n_out, dtype=np.float64)[:, None]
    mat = 2.0 * np.cos(np.pi * k * (2.0 * n[None, :] + 1.0) / (2.0 * n_in))
    scale = np.empty((n_out, 1))
    scale[0] = np.sqrt(1.0 / (4.0 * n_in))
    scale[1:] = np.sqrt(1.0 / (2.0 * n_in))
    return (mat * scale).astype(np.float32)


def amplitude_to_db(x: jnp.ndarray, ref: jnp.ndarray | None = None) -> jnp.ndarray:
    """librosa.amplitude_to_db(x, ref=np.max, top_db=None).

    20*log10(max(amin,|x|)) - 20*log10(max(amin, ref)); ref defaults to the
    max over the input (the reference pins ref=np.max at utils/audio.py:46).
    """
    x = jnp.abs(x)
    if ref is None:
        ref = jnp.max(x)
    log_spec = 20.0 * jnp.log10(jnp.maximum(_AMIN, x))
    return log_spec - 20.0 * jnp.log10(jnp.maximum(_AMIN, ref))


def db_to_amplitude(x: jnp.ndarray) -> jnp.ndarray:
    """librosa.db_to_amplitude: 10**(x/20)."""
    return jnp.power(10.0, x / 20.0)


def linear_to_mel_spec(S: jnp.ndarray, sample_rate: int, n_fft: int, n_mels: int) -> jnp.ndarray:
    """Project a magnitude spectrogram ``[bins, T]`` onto mel ``[n_mels, T]``
    (librosa.feature.melspectrogram with S= given, i.e. no squaring)."""
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    return jnp.dot(fb, S, preferred_element_type=jnp.float32)


def mel_to_linear_nnls(
    M: jnp.ndarray,
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    n_iter: int = 50,
) -> jnp.ndarray:
    """Approximate inverse mel projection via multiplicative-update NNLS.

    librosa.feature.inverse.mel_to_stft solves a non-negative least-squares
    problem on the host; the multiplicative update
    ``x <- x * (A^T b) / (A^T A x)`` converges to the same stationary points
    and is a pure sequence of matmuls — TPU-friendly, jittable.
    """
    A = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))  # [m, bins]
    At_b = jnp.dot(A.T, M, preferred_element_type=jnp.float32)   # [bins, T]
    AtA = jnp.dot(A.T, A, preferred_element_type=jnp.float32)    # [bins, bins]

    # init from the transpose projection (scaled least-norm guess)
    x = jnp.maximum(At_b, 1e-10)

    def body(_, x):
        denom = jnp.dot(AtA, x, preferred_element_type=jnp.float32)
        return x * At_b / jnp.maximum(denom, 1e-10)

    import jax

    x = jax.lax.fori_loop(0, n_iter, body, x)
    return x


def mfcc_from_db_mel(S_db_mel: jnp.ndarray, n_mfcc: int) -> jnp.ndarray:
    """MFCCs from a dB-scaled mel spectrogram ``[n_mels, T]`` -> ``[n_mfcc, T]``
    (librosa.feature.mfcc(S=...) == ortho DCT-II along the mel axis)."""
    D = jnp.asarray(dct_matrix(n_mfcc, S_db_mel.shape[0]))
    return jnp.dot(D, S_db_mel, preferred_element_type=jnp.float32)
