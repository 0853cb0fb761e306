"""Kaldi-compatible log-mel filterbank, on device.

Replaces ``torchaudio.compliance.kaldi.fbank`` (reference
data/audio_mapper.py:49-62), which ran on CPU dataloader workers; here the
waveform->fbank transform is pure jnp so XLA fuses it into the step and it
runs on TPU as part of preprocessing.

Algorithm (kaldi feat pipeline, dither=0):
  snip_edges framing (frame 25 ms / shift 10 ms), per-frame DC removal,
  raw log energy floor, preemphasis 0.97, povey window
  ((0.5 - 0.5 cos)^0.85), zero-pad to next pow2, |rfft|^2,
  kaldi-mel triangular banks (mel = 1127 ln(1 + f/700), low 20 Hz,
  high = nyquist), log(max(x, eps)).

Two presets used by the reference:
  * BEATs: 128 mel bins, waveform scaled by 2**15 first, htk_compat=False
  * AST: 64 bins (melbins cfg), htk_compat=True, hanning window
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

EPS = 1.1920928955078125e-07  # float32 machine epsilon (kaldi's std::numeric_limits<float>::epsilon)


def _mel(f):
    return 1127.0 * np.log(1.0 + f / 700.0)


@functools.lru_cache(maxsize=8)
def mel_banks(num_bins: int, fft_len: int, sample_rate: float,
              low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Kaldi MelBanks weights, shape (num_fft_bins, num_bins) fp32.

    num_fft_bins = fft_len // 2 (the nyquist bin carries zero weight in
    torchaudio's banks — it pads a zero column — so excluding it is exact).
    """
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    num_fft_bins = fft_len // 2
    fft_bin_width = sample_rate / fft_len
    mel_low = _mel(low_freq)
    mel_high = _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.arange(num_bins)[:, None]
    left = mel_low + bins * mel_delta
    center = mel_low + (bins + 1) * mel_delta
    right = mel_low + (bins + 2) * mel_delta

    freqs = fft_bin_width * np.arange(num_fft_bins)[None, :]
    mel_f = _mel(freqs)
    up = (mel_f - left) / (center - left)
    down = (right - mel_f) / (right - center)
    w = np.maximum(0.0, np.minimum(up, down))
    return w.astype(np.float32).T  # (num_fft_bins, num_bins)


def _window(window_type: str, n: int) -> np.ndarray:
    a = 2 * math.pi / (n - 1)
    i = np.arange(n)
    if window_type == "povey":
        return ((0.5 - 0.5 * np.cos(a * i)) ** 0.85).astype(np.float32)
    if window_type == "hanning":
        return (0.5 - 0.5 * np.cos(a * i)).astype(np.float32)
    if window_type == "hamming":
        return (0.54 - 0.46 * np.cos(a * i)).astype(np.float32)
    raise ValueError(window_type)


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def kaldi_fbank(waveform, *, sample_rate: int = 16000, num_mel_bins: int = 128,
                frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0,
                window_type: str = "povey", preemphasis: float = 0.97,
                remove_dc_offset: bool = True, low_freq: float = 20.0,
                high_freq: float = 0.0, use_power: bool = True,
                use_energy: bool = False, energy_floor: float = 1.0,
                raw_energy: bool = True, htk_compat: bool = False):
    """Log-mel fbank of a mono waveform.

    waveform: (..., num_samples) float (kaldi int16 scale for BEATs parity —
    multiply by 2**15 before calling, as the reference does at
    data/audio_mapper.py:59).
    Returns (..., num_frames, num_mel_bins [+1 if use_energy]) float32.

    ``htk_compat`` matches torchaudio.compliance.kaldi.fbank semantics: it
    only changes where the energy column goes (last vs first) and only when
    ``use_energy`` is true — with use_energy=False (both VAST presets,
    audio_mapper.py:46-62) it is a numeric no-op. Golden parity vs the
    torchaudio algorithm is asserted in tests/test_fbank_golden.py.
    """
    frame_len = int(sample_rate * frame_length_ms / 1000)
    frame_shift = int(sample_rate * frame_shift_ms / 1000)
    fft_len = _next_pow2(frame_len)

    n = waveform.shape[-1]
    num_frames = 1 + (n - frame_len) // frame_shift  # snip_edges
    if num_frames < 1:
        raise ValueError(f"waveform too short: {n} samples < frame {frame_len}")

    idx = (np.arange(num_frames) * frame_shift)[:, None] + np.arange(frame_len)[None, :]
    frames = waveform[..., idx]  # (..., num_frames, frame_len)
    frames = frames.astype(jnp.float32)

    if remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    log_energy = None
    if use_energy and raw_energy:
        log_energy = _log_energy(frames, energy_floor)

    if preemphasis:
        first = frames[..., :1] - preemphasis * frames[..., :1]
        rest = frames[..., 1:] - preemphasis * frames[..., :-1]
        frames = jnp.concatenate([first, rest], axis=-1)

    frames = frames * jnp.asarray(_window(window_type, frame_len))
    if use_energy and not raw_energy:
        log_energy = _log_energy(frames, energy_floor)
    spec = jnp.fft.rfft(frames, n=fft_len, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2) if use_power else jnp.abs(spec)
    power = power[..., : fft_len // 2]  # nyquist column is zero-weighted

    banks = jnp.asarray(mel_banks(num_mel_bins, fft_len, float(sample_rate),
                                  low_freq, high_freq))
    mel = power @ banks
    out = jnp.log(jnp.maximum(mel, EPS))
    if use_energy:
        e = log_energy[..., None]
        # energy column: htk_compat puts it last, kaldi-style first
        out = (jnp.concatenate([out, e], axis=-1) if htk_compat
               else jnp.concatenate([e, out], axis=-1))
    return out


def _log_energy(frames, energy_floor: float):
    """Per-frame log energy with floor (torchaudio _get_log_energy)."""
    e = jnp.log(jnp.maximum(jnp.sum(frames ** 2, axis=-1), EPS))
    if energy_floor == 0.0:
        return e
    return jnp.maximum(e, math.log(energy_floor))


def beats_fbank(waveform_int16_scale):
    """BEATs preset (data/audio_mapper.py:55-62): 128 bins, 16 kHz."""
    return kaldi_fbank(waveform_int16_scale, num_mel_bins=128)


def ast_fbank(waveform, sample_rate: int, num_mel_bins: int = 64):
    """AST preset (data/audio_mapper.py:46-52): hanning window,
    htk_compat=True + use_energy=False (htk_compat is numerically inert
    without the energy column — see kaldi_fbank)."""
    return kaldi_fbank(waveform, sample_rate=sample_rate,
                       num_mel_bins=num_mel_bins, window_type="hanning",
                       htk_compat=True)
