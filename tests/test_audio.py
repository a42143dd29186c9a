"""functions/audio.py WAV codec + feature kernels and the
stages/multimodal.AudioFeaturizer actor path — the REAL audio seam
(PCM-16 mono decodable with numpy alone; soundfile swaps decode_wav)."""

import numpy as np
import pyarrow as pa
import pytest

from web_mass_scraper_ocr_ray.functions.audio import (
    decode_wav,
    encode_wav,
    synth_tone,
    wav_features,
)
from web_mass_scraper_ocr_ray.stages import multimodal as mm


class TestWavCodec:
    def test_roundtrip_bytes_exact(self):
        x = synth_tone(3)
        y, rate = decode_wav(encode_wav(x, rate=8000))
        assert rate == 8000
        assert np.array_equal(x, y)

    def test_rejects_non_riff(self):
        with pytest.raises(ValueError):
            decode_wav(b"not audio at all")

    def test_strict_seam_on_non_pcm16_mono(self):
        # stereo header → the NotImplementedError deployment seam
        import struct

        fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 8000,
                          32000, 4, 16)
        data = struct.pack("<4sI", b"data", 0)
        payload = struct.pack("<4sI4s", b"RIFF",
                              4 + len(fmt) + len(data), b"WAVE") \
            + fmt + data
        with pytest.raises(NotImplementedError):
            decode_wav(payload)

    def test_odd_chunk_padding_skipped(self):
        # an odd-sized junk chunk before fmt/data must be skipped with
        # its pad byte (RIFF word alignment)
        import struct

        junk = struct.pack("<4sI", b"JUNK", 3) + b"abc\x00"
        x = np.array([1, -2, 3], np.int16)
        w = encode_wav(x)
        payload = w[:12] + junk + w[12:]
        head = struct.pack("<4sI4s", b"RIFF", len(payload) - 8, b"WAVE")
        y, _ = decode_wav(head + payload[12:])
        assert np.array_equal(x, y)


class TestWavFeatures:
    def test_silence(self):
        f = wav_features(encode_wav(synth_tone(0)))
        assert f["energy"] == 0
        assert f["zero_crossings"] == 0
        assert f["peak_abs"] == 0
        assert f["n_active_frames"] == 0
        assert f["duration_ms"] == 500

    def test_energy_scales_exactly_quadratically(self):
        base = synth_tone(5).astype(np.int32)
        e1 = wav_features(encode_wav(base.astype(np.int16)))["energy"]
        e3 = wav_features(encode_wav((base * 3).astype(np.int16)))["energy"]
        assert e3 == 9 * e1

    def test_zero_crossings_amplitude_invariant_and_near_frequency(self):
        for seed in (1, 4, 9):
            base = synth_tone(seed).astype(np.int32)
            z1 = wav_features(encode_wav(base.astype(np.int16)))[
                "zero_crossings"]
            z2 = wav_features(encode_wav((base * 2).astype(np.int16)))[
                "zero_crossings"]
            assert z1 == z2
            f = 100 + 37 * seed  # crossings ≈ 2f per sec × 0.5 s = f
            assert abs(z1 - f) <= 2

    def test_active_frames_counts_partial_tail(self):
        # 300 nonzero samples → frames 0 and (partial) 1 active
        x = np.ones(300, np.int16)
        assert wav_features(encode_wav(x))["n_active_frames"] == 2


@pytest.mark.usefixtures("ray_session")
class TestAudioFeaturizerStage:
    def _media(self):
        rows = [
            (1, encode_wav(synth_tone(2)), "audio/wav"),
            (2, encode_wav(synth_tone(0)), "audio/wav"),
            (3, b"not-audio", "text/plain"),      # passthrough → nulls
        ]
        return pa.table({
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
            "mime": pa.array([r[2] for r in rows], pa.string()),
        })

    def test_actor_pool_features(self):
        import ray.data as rd

        out = rd.from_arrow(self._media()).map_batches(
            mm.AudioFeaturizer, fn_constructor_kwargs={"strict": True},
            batch_format="pyarrow", concurrency=1,
        ).to_pandas().set_index("media_id")
        expect = wav_features(encode_wav(synth_tone(2)))
        for c in ("n_samples", "energy", "zero_crossings", "peak_abs"):
            assert out.loc[1, c] == expect[c]
        assert out.loc[2, "energy"] == 0
        assert out.loc[3, "energy"] is None or np.isnan(out.loc[3, "energy"])

    def test_strict_raises_on_garbage_audio(self):
        feat = mm.AudioFeaturizer(strict=True)
        batch = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"\xff\xfb fake mp3"], pa.binary()),
            "mime": pa.array(["audio/mpeg"], pa.string()),
        })
        with pytest.raises(NotImplementedError):
            feat(batch)

    def test_lenient_nulls_on_garbage_audio(self):
        feat = mm.AudioFeaturizer(strict=False)
        batch = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"\xff\xfb fake mp3"], pa.binary()),
            "mime": pa.array(["audio/mpeg"], pa.string()),
        })
        out = feat(batch)
        assert out.column("energy").to_pylist() == [None]
