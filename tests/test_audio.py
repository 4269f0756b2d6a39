"""Audio DSP golden tests.

The environment has no librosa, so each JAX op is checked against an
independent straight-from-the-formula numpy implementation (explicit frame
loops, np.fft) plus analytic properties (sinusoid bins, round-trips,
orthonormality)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multilingual_text_to_speech_tpu.config import HParams
from multilingual_text_to_speech_tpu.ops import audio, mel as mel_ops, stft as stft_ops
from multilingual_text_to_speech_tpu.ops.dtw import dtw_path


# ---------------------------------------------------------------------------
# independent numpy reference (librosa formulas, loop-based)
# ---------------------------------------------------------------------------

def np_hann(n):
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def np_stft(y, n_fft, hop, win_length):
    window = np_hann(win_length)
    lpad = (n_fft - win_length) // 2
    window = np.pad(window, (lpad, n_fft - win_length - lpad))
    y = np.pad(y, n_fft // 2, mode="reflect")
    frames = 1 + (len(y) - n_fft) // hop
    out = np.empty((1 + n_fft // 2, frames), dtype=np.complex128)
    for t in range(frames):
        seg = y[t * hop : t * hop + n_fft] * window
        out[:, t] = np.fft.rfft(seg, n=n_fft)
    return out


RNG = np.random.RandomState(0)
SIGNAL = (RNG.randn(22050) * 0.1).astype(np.float32)  # 1s of noise


def test_hann_window_matches_numpy():
    np.testing.assert_allclose(
        np.asarray(stft_ops.hann_window(1102)), np_hann(1102), atol=1e-6
    )


def test_stft_matches_reference_formula():
    n_fft, hop, win = 1102, 275, 1102
    ours = np.asarray(stft_ops.stft(jnp.asarray(SIGNAL), n_fft, hop, win))
    ref = np_stft(SIGNAL.astype(np.float64), n_fft, hop, win)
    assert ours.shape == ref.shape == (552, ref.shape[1])
    np.testing.assert_allclose(np.abs(ours), np.abs(ref), atol=2e-3)


def test_stft_sinusoid_peak_bin():
    # a pure tone must peak at the nearest rfft bin
    sr, n_fft, hop = 22050, 1102, 275
    f = 1000.0
    t = np.arange(sr) / sr
    y = np.sin(2 * np.pi * f * t).astype(np.float32)
    S = np.abs(np.asarray(stft_ops.stft(jnp.asarray(y), n_fft, hop, n_fft)))
    peak_bin = int(S[:, S.shape[1] // 2].argmax())
    expected = int(round(f * n_fft / sr))
    assert abs(peak_bin - expected) <= 1


def test_istft_roundtrip():
    n_fft, hop = 1102, 275
    spec = stft_ops.stft(jnp.asarray(SIGNAL), n_fft, hop, n_fft)
    rec = np.asarray(stft_ops.istft(spec, n_fft, hop, n_fft, length=len(SIGNAL)))
    # interior must match nearly exactly (edges depend on reflect padding)
    sl = slice(n_fft, len(SIGNAL) - n_fft)
    np.testing.assert_allclose(rec[sl], SIGNAL[sl], atol=1e-4)


def test_mel_filterbank_properties():
    fb = mel_ops.mel_filterbank(22050, 1102, 80)
    assert fb.shape == (80, 552)
    assert (fb >= 0).all()
    # every filter has support, triangles overlap with neighbours
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: peak amplitude decreases with bandwidth (approx)
    peaks = fb.max(axis=1)
    assert peaks[0] > peaks[-1]


def test_mel_scale_invertible():
    f = np.array([0.0, 500.0, 1000.0, 4000.0, 11025.0])
    np.testing.assert_allclose(mel_ops.mel_to_hz(mel_ops.hz_to_mel(f)), f, rtol=1e-10)


def test_amplitude_db_roundtrip():
    x = jnp.asarray(np.abs(RNG.randn(10, 10)).astype(np.float32) + 0.1)
    db = mel_ops.amplitude_to_db(x, ref=1.0)
    back = mel_ops.db_to_amplitude(db)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4)


def test_amplitude_to_db_ref_max():
    x = jnp.asarray(np.array([[1.0, 10.0], [100.0, 1000.0]], np.float32))
    db = np.asarray(mel_ops.amplitude_to_db(x))
    assert db.max() == pytest.approx(0.0, abs=1e-5)  # ref = max
    assert db.min() == pytest.approx(-60.0, abs=1e-3)


def test_dct_orthonormal():
    D = mel_ops.dct_matrix(80, 80)
    np.testing.assert_allclose(D @ D.T, np.eye(80), atol=1e-4)


def test_dct_matches_scipy():
    from scipy.fftpack import dct

    x = RNG.randn(80, 7).astype(np.float32)
    ours = mel_ops.dct_matrix(13, 80) @ x
    ref = dct(x, axis=0, type=2, norm="ortho")[:13]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_spectrogram_shapes_and_finiteness():
    hp = HParams()
    S_mel = audio.spectrogram(SIGNAL, hp, mel=True)
    S_lin = audio.spectrogram(SIGNAL, hp, mel=False)
    frames = 1 + (len(SIGNAL) + 1102 - 1102) // 275
    assert S_mel.shape == (80, frames)
    assert S_lin.shape == (552, frames)
    assert np.isfinite(S_mel).all() and np.isfinite(S_lin).all()
    assert S_mel.max() <= 1e-4  # dB relative to max


def test_preemphasis_deemphasis_inverse():
    y = jnp.asarray(SIGNAL)
    z = audio.deemphasis(audio.preemphasis(y, 0.97), 0.97)
    np.testing.assert_allclose(np.asarray(z), SIGNAL, atol=1e-4)


def test_deemphasis_matches_scipy_lfilter():
    from scipy.signal import lfilter

    ours = np.asarray(audio.deemphasis(jnp.asarray(SIGNAL[:1000]), 0.97))
    ref = lfilter([1], [1, -0.97], SIGNAL[:1000].astype(np.float64))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_griffin_lim_reconstructs_tone():
    # GL on a clean tone magnitude must produce a waveform whose spectrum
    # correlates strongly with the original
    hp = HParams()
    hp.use_preemphasis = False
    sr = hp.sample_rate
    t = np.arange(sr // 2) / sr
    y = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    S_db = audio.spectrogram(y, hp, mel=False)
    rec = audio.inverse_spectrogram(S_db, hp, mel=False, key=jax.random.PRNGKey(1))
    S2_db = audio.spectrogram(rec.astype(np.float32), hp, mel=False)
    n = min(S_db.shape[1], S2_db.shape[1])
    a, b = S_db[:, :n].ravel(), S2_db[:, :n].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.9


def test_normalize_denormalize_roundtrip():
    hp = HParams()
    hp.mel_normalize_mean = RNG.randn(80, 1).astype(np.float32)
    hp.mel_normalize_variance = (np.abs(RNG.randn(80, 1)) + 0.5).astype(np.float32)
    S = RNG.randn(80, 11).astype(np.float32)
    out = audio.denormalize_spectrogram(audio.normalize_spectrogram(S, hp, True), hp, True)
    np.testing.assert_allclose(out, S, atol=1e-5)


def test_mcd_zero_for_identical():
    hp = HParams()
    S = RNG.randn(80, 50).astype(np.float32)
    for mode in ("cut", "stretch", "dtw"):
        assert audio.mel_cepstral_distortion(S, S, hp, mode) == pytest.approx(0.0, abs=1e-4)


def test_mcd_positive_and_modes_handle_length_mismatch():
    hp = HParams()
    S1 = RNG.randn(80, 50).astype(np.float32)
    S2 = RNG.randn(80, 70).astype(np.float32)
    for mode in ("cut", "stretch", "dtw"):
        v = audio.mel_cepstral_distortion(S1, S2, hp, mode)
        assert v > 0


def test_dtw_path_valid_and_optimal_simple():
    x = np.array([[0.0], [1.0], [2.0]])
    y = np.array([[0.0], [0.0], [1.0], [2.0]])
    px, py = dtw_path(x, y)
    # path is monotone, starts at (0,0), ends at (-1,-1)
    assert px[0] == 0 and py[0] == 0
    assert px[-1] == 2 and py[-1] == 3
    assert (np.diff(px) >= 0).all() and (np.diff(py) >= 0).all()
    # optimal alignment has zero cost here
    cost = np.abs(x[px] - y[py]).sum()
    assert cost == pytest.approx(0.0)


def test_mel_to_linear_nnls_quality():
    # project a random linear magnitude to mel, invert, re-project: the mel
    # representations must match closely (NNLS fits within the mel span)
    sr, n_fft, n_mels = 22050, 1102, 80
    S = np.abs(RNG.randn(552, 20)).astype(np.float32)
    M = np.asarray(mel_ops.linear_to_mel_spec(jnp.asarray(S), sr, n_fft, n_mels))
    S_rec = mel_ops.mel_to_linear_nnls(jnp.asarray(M), sr, n_fft, n_mels, n_iter=100)
    M2 = np.asarray(mel_ops.linear_to_mel_spec(S_rec, sr, n_fft, n_mels))
    rel = np.abs(M2 - M).mean() / np.abs(M).mean()
    assert rel < 0.05


def test_wav_io_roundtrip(tmp_path):
    from multilingual_text_to_speech_tpu.ops.io import load_wav, save_wav

    path = str(tmp_path / "t.wav")
    save_wav(SIGNAL, path, 22050)
    back = load_wav(path, 22050)
    assert len(back) == len(SIGNAL)
    np.testing.assert_allclose(back, SIGNAL, atol=1e-3)


def test_trim_silence():
    hp = HParams()
    pad = np.zeros(11025, np.float32)
    tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(11025) / 22050)).astype(np.float32)
    y = np.concatenate([pad, tone, pad])
    trimmed, (start, end) = audio.trim_silence(y, 50, 12.5, hp)
    # keeps the tone, drops most of the silence
    assert len(trimmed) < len(y) * 0.6
    assert len(trimmed) >= len(tone) * 0.9


def test_inverse_spectrogram_batch():
    hp = HParams()
    hp.use_preemphasis = False
    hp.griffin_lim_iters = 8
    sr = hp.sample_rate
    t = np.arange(sr // 4) / sr
    tones = [440.0, 880.0]
    specs = np.stack([
        audio.spectrogram((0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32),
                          hp, mel=False)
        for f in tones
    ])
    wavs = audio.inverse_spectrogram_batch(specs, hp, mel=False,
                                           key=jax.random.PRNGKey(0))
    assert wavs.shape[0] == 2
    for i, f in enumerate(tones):
        S2 = audio.spectrogram(wavs[i].astype(np.float32), hp, mel=False)
        peak = int(S2.mean(axis=1).argmax())
        expected = int(round(f * hp.num_fft / sr))
        assert abs(peak - expected) <= 1, (f, peak, expected)
