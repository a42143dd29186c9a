"""Pure-numpy audio kernels — the REAL (non-stub) audio path.

The container has no soundfile/ffmpeg, so compressed codecs stay behind
the ``NotImplementedError`` seams in ``stages/multimodal.py``.
Uncompressed RIFF/WAVE PCM-16 mono however is a pure byte layout,
decodable with numpy alone — so waveform feature extraction (duration,
energy, zero crossings, peak, active-frame count) runs end-to-end on
REAL samples in this sandbox. Deployment swaps :func:`decode_wav` for a
soundfile-backed decoder; every kernel downstream of the decoded
``int16`` sample array is already the production one.

Design notes (scale):

- All features are single-pass vectorized numpy over the whole clip;
  no per-sample Python.
- Every feature is an exact integer (energy = Σx² in int64, strict
  sign-change count, sample counts), so structural claims about a
  deterministic corpus — zero-crossing invariance under integer
  amplitude scaling, exact k² energy ratios — gate bit-exactly.

Reference parity: the reference repo has no audio path; this module is
the beyond-reference multimodal analogue of ``functions/imaging.py``
(the build brief's audio feature-extract seam made real on the one
codec a no-dependency sandbox can decode).
"""

from __future__ import annotations

import math
import struct

import numpy as np

_RIFF = struct.Struct("<4sI4s")          # 'RIFF' size 'WAVE'
_FMT = struct.Struct("<4sIHHIIHH")       # 'fmt ' 16 tag ch rate bps align bits
_DATA = struct.Struct("<4sI")            # 'data' size


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode an ``int16`` mono sample array as RIFF/WAVE PCM-16."""
    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("encode_wav expects 1-D int16 samples")
    data = samples.tobytes()
    fmt = _FMT.pack(b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16)
    head = _RIFF.pack(b"RIFF", 4 + len(fmt) + _DATA.size + len(data),
                      b"WAVE")
    return head + fmt + _DATA.pack(b"data", len(data)) + data


def decode_wav(payload: bytes) -> tuple:
    """Decode RIFF/WAVE PCM-16 mono → ``(int16 samples, rate)``.

    Strict seam: anything that is not PCM-16 mono (compressed codecs,
    stereo, other bit depths) raises ``NotImplementedError`` — the
    deployment decoder (soundfile/ffmpeg) replaces this function, not
    the kernels downstream of the sample array.
    """
    if len(payload) < _RIFF.size or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = _RIFF.size, len(payload)
    rate = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if cid == b"fmt ":
            tag, ch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8)
            if tag != 1 or ch != 1 or bits != 16:
                raise NotImplementedError(
                    f"decode_wav: only PCM-16 mono (tag={tag} ch={ch} "
                    f"bits={bits}); swap in the soundfile decoder")
        elif cid == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt chunk")
            raw = payload[pos + 8:pos + 8 + size]
            return np.frombuffer(raw, np.int16), rate
        pos += 8 + size + (size & 1)
    raise ValueError("no data chunk")


def wav_features(payload: bytes) -> dict:
    """REAL waveform features from a WAV payload — all exact integers.

    - ``n_samples`` / ``sample_rate`` / ``duration_ms`` (floor);
    - ``energy``: Σx² in int64 (exact — |x|≤2¹⁵, so any clip under
      ~2³³ samples fits);
    - ``zero_crossings``: strict sign changes (x[i]·x[i+1] < 0) —
      invariant under positive integer amplitude scaling;
    - ``peak_abs``: max |x|;
    - ``n_active_frames``: 256-sample frames with any nonzero sample
      (silence detection).
    """
    x, rate = decode_wav(payload)
    xi = x.astype(np.int64)
    n = int(x.size)
    nz = xi != 0
    if n:
        n_frames = (n + 255) // 256
        pad = np.zeros(n_frames * 256, bool)
        pad[:n] = nz
        active = int(pad.reshape(n_frames, 256).any(axis=1).sum())
    else:
        active = 0
    return {
        "n_samples": n,
        "sample_rate": int(rate),
        "duration_ms": n * 1000 // rate,
        "energy": int((xi * xi).sum()),
        "zero_crossings": int((xi[:-1] * xi[1:] < 0).sum()) if n else 0,
        "peak_abs": int(np.abs(xi).max()) if n else 0,
        "n_active_frames": active,
    }


def synth_tone(seed: int, rate: int = 8000, n: int = 4000) -> np.ndarray:
    """Deterministic base waveform for tests/gates: seed 0 is silence;
    seed k ≥ 1 is a 9000-amplitude sine at ``100 + 37·k`` Hz (phase
    0.3 rad so no analytic zero lands on a sample). Amplitude variants
    for the scaling claims multiply the RETURNED int16 array by an
    integer k ≤ 3 (9000·3 < 2¹⁵, no clipping), which preserves signs
    exactly."""
    if seed == 0:
        return np.zeros(n, np.int16)
    f = 100 + 37 * seed
    t = np.arange(n, dtype=np.float64) / rate
    return np.round(
        9000.0 * np.sin(2.0 * math.pi * f * t + 0.3)).astype(np.int16)
