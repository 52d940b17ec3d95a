"""Pure-stdlib WAV (RIFF / 16-bit PCM) codec for the X4 audio surface.

The audio analogue of ``imagecodec``: this container has no soundfile /
librosa, so the real decode path is the stdlib ``wave`` module — an
actual RIFF parser, not a stub — and test fixtures are generated with
the matching encoder. Anything beyond 16-bit PCM WAV (mp3, flac, ...)
raises a clear error; at production scale the decode kernel swaps for a
soundfile-backed one without touching any Spark plumbing (same contract
as imagecodec's Pillow hook).
"""

from __future__ import annotations

import io
import wave

import numpy as np


def encode_wav(samples: np.ndarray, *, sample_rate: int = 16000,
               channels: int = 1) -> bytes:
    """16-bit PCM WAV bytes from an int16 sample array (interleaved when
    ``channels`` > 1). Float inputs in [-1, 1] are scaled to int16."""
    x = np.asarray(samples)
    if x.dtype.kind == "f":
        x = np.clip(x, -1.0, 1.0)
        x = (x * 32767.0).astype("<i2")
    else:
        x = x.astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(int(channels))
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(x.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Parse a WAV payload → {sample_rate, channels, n_frames,
    duration_s, samples}; samples are float64 in [-1, 1], channels
    mixed down to mono (mean) for feature extraction."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        sr = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    if sw != 2:
        raise ValueError(f"decode_wav: only 16-bit PCM supported, got "
                         f"{8 * sw}-bit")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return {
        "sample_rate": int(sr),
        "channels": int(nch),
        "n_frames": int(n),
        "duration_s": (n / sr) if sr else 0.0,
        "samples": x,
    }


def energy_envelope(samples: np.ndarray, bins: int) -> np.ndarray:
    """Per-window RMS energy over ``bins`` equal time windows,
    normalized to sum 1 (all-silence → zeros) — the deterministic,
    lib-free audio feature (the histogram analogue of imagecodec's
    luminance feature)."""
    if len(samples) == 0:
        return np.zeros(bins)
    edges = np.linspace(0, len(samples), bins + 1).astype(int)
    rms = np.array([
        np.sqrt(np.mean(samples[a:b] ** 2)) if b > a else 0.0
        for a, b in zip(edges[:-1], edges[1:])
    ])
    total = rms.sum()
    return rms / total if total > 0 else rms


def zero_crossing_rate(samples: np.ndarray) -> float:
    """Fraction of consecutive sample pairs that change sign — the
    classic cheap spectral proxy (high for noise/fricatives, low for
    tones/silence)."""
    if len(samples) < 2:
        return 0.0
    return float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
