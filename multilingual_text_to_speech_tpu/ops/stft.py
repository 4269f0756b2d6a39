"""Short-time Fourier transform and inverse, librosa-compatible, in JAX.

Semantics match ``librosa.stft`` / ``librosa.istft`` as used by the reference
(``/root/reference/utils/audio.py:66-97``): periodic Hann window, ``center=True``
reflect padding, window zero-padded (centered) up to ``n_fft``, overlap-add
inverse with squared-window normalization.

TPU notes: frames are materialized with one gather (index matrix
``[frames, n_fft]``) feeding a single batched ``rfft`` — no Python loops, fully
jittable and vmappable over a batch axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic (fftbins=True) Hann window, as scipy.signal.get_window('hann', n)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def pad_center(window: jnp.ndarray, size: int) -> jnp.ndarray:
    """Zero-pad a window symmetrically up to `size` (librosa.util.pad_center)."""
    n = window.shape[0]
    lpad = (size - n) // 2
    return jnp.pad(window, (lpad, size - n - lpad))


def num_frames(length: int, n_fft: int, hop_length: int, center: bool = True) -> int:
    """Number of STFT frames for a signal of `length` samples."""
    if center:
        length = length + n_fft  # n_fft//2 padding on both sides
    return 1 + (length - n_fft) // hop_length


def frame_signal(y: jnp.ndarray, n_fft: int, hop_length: int,
                 center: bool = True, pad_mode: str = "reflect") -> jnp.ndarray:
    """Slice a 1-D signal into overlapping frames ``[frames, n_fft]``."""
    if center:
        y = jnp.pad(y, (n_fft // 2, n_fft // 2), mode=pad_mode)
    n = y.shape[0]
    frames = 1 + (n - n_fft) // hop_length
    idx = (
        jnp.arange(frames, dtype=jnp.int32)[:, None] * hop_length
        + jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    )
    return y[idx]


def stft(
    y: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """Complex STFT, shape ``[1 + n_fft//2, frames]`` (librosa layout)."""
    if win_length is None:
        win_length = n_fft
    window = pad_center(hann_window(win_length, y.dtype), n_fft)
    frames = frame_signal(y, n_fft, hop_length, center, pad_mode)
    spec = jnp.fft.rfft(frames * window[None, :], n=n_fft, axis=-1)
    return spec.T


def istft(
    spec: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    center: bool = True,
    length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT via windowed overlap-add with squared-window normalization.

    `spec` is complex ``[1 + n_fft//2, frames]``; returns a 1-D signal.
    """
    if win_length is None:
        win_length = n_fft
    window = pad_center(hann_window(win_length, jnp.float32), n_fft)

    frames = spec.shape[1]
    ytmp = jnp.fft.irfft(spec.T, n=n_fft, axis=-1)  # [frames, n_fft]
    ytmp = ytmp * window[None, :]

    total = n_fft + hop_length * (frames - 1)
    # Overlap-add: scatter each frame at offset i*hop. Implemented as a
    # segment-sum over a flattened index map — one XLA scatter-add.
    idx = (
        jnp.arange(frames, dtype=jnp.int32)[:, None] * hop_length
        + jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    y = jnp.zeros(total, dtype=ytmp.dtype).at[idx].add(ytmp.reshape(-1))

    # Sum of squared windows at each sample for normalization.
    wsq = (window * window)[None, :] * jnp.ones((frames, 1), window.dtype)
    norm = jnp.zeros(total, dtype=window.dtype).at[idx].add(wsq.reshape(-1))
    y = jnp.where(norm > 1e-9, y / jnp.where(norm > 1e-9, norm, 1.0), y)

    if center:
        y = y[n_fft // 2: total - n_fft // 2]
    if length is not None:
        y = y[:length]
    return y


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length",
                                             "n_iter", "momentum"))
def griffin_lim(
    magnitude: jnp.ndarray,
    key: jax.Array,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    n_iter: int = 60,
    momentum: float = 0.99,
) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction (librosa.griffinlim semantics:
    random phase init, momentum-accelerated updates).

    Runs entirely on device as a ``lax.fori_loop`` of batched STFT/iSTFT —
    the reference runs 60 iterations of librosa FFTs on the host CPU
    (``utils/audio.py:88-97``); here the whole loop is one XLA program.
    """
    if win_length is None:
        win_length = n_fft

    angles = jnp.exp(
        2j * jnp.pi * jax.random.uniform(key, magnitude.shape)
    ).astype(jnp.complex64)
    magnitude = magnitude.astype(jnp.float32)

    def body(_, state):
        angles, rebuilt_prev = state
        inverse = istft(magnitude * angles, n_fft, hop_length, win_length)
        rebuilt = stft(inverse, n_fft, hop_length, win_length)
        angles = rebuilt - (momentum / (1.0 + momentum)) * rebuilt_prev
        angles = angles / (jnp.abs(angles) + 1e-16)
        return angles, rebuilt

    angles, _ = jax.lax.fori_loop(
        0, n_iter, body, (angles, jnp.zeros_like(angles))
    )
    return istft(magnitude * angles, n_fft, hop_length, win_length)
