"""Remote-image download path (S6 online) — retry / rate-limit /
size-cap logic driven through injected transports (no network here);
the OCR-stage wiring is exercised end-to-end with a fake transport."""

import base64

import pyarrow as pa

from web_mass_scraper_ocr_ray.sources.images import ImageDownloader


def _transport_returning(status=200, mime="image/png",
                         payload=b"STUB1:remote words here"):
    calls = []

    def t(url, timeout):
        calls.append(url)
        return status, mime, iter([payload[:8], payload[8:]])

    t.calls = calls
    return t


class TestImageDownloader:
    def test_success_reassembles_chunks(self):
        t = _transport_returning()
        d = ImageDownloader(transport=t, rate=1e9)
        mime, payload = d.download("https://img.example.com/a.png")
        assert mime == "image/png"
        assert payload == b"STUB1:remote words here"
        assert len(t.calls) == 1

    def test_http_error_retries_then_none(self):
        t = _transport_returning(status=503)
        slept = []
        d = ImageDownloader(transport=t, rate=1e9, retry_count=3,
                            retry_delay=0.25, sleep=slept.append)
        assert d.download("https://img.example.com/a.png") is None
        assert len(t.calls) == 3                 # IMAGE_RETRY_COUNT attempts
        assert slept == [0.25, 0.25]             # backoff BETWEEN attempts

    def test_transport_exception_retries(self):
        attempts = []

        def flaky(url, timeout):
            attempts.append(url)
            if len(attempts) < 3:
                raise TimeoutError("slow")
            return 200, "image/png", iter([b"STUB1:ok"])

        d = ImageDownloader(transport=flaky, rate=1e9, retry_count=3)
        mime, payload = d.download("https://img.example.com/b.png")
        assert payload == b"STUB1:ok" and len(attempts) == 3

    def test_size_cap_fails_without_retry(self):
        t = _transport_returning(payload=b"x" * 4096)
        d = ImageDownloader(transport=t, rate=1e9, max_bytes=1024,
                            retry_count=3)
        assert d.download("https://img.example.com/big.png") is None
        assert len(t.calls) == 1  # oversized: re-fetching is pointless

    def test_rate_limited_per_host(self):
        t = _transport_returning()
        d = ImageDownloader(transport=t, rate=1e9)
        d.download("https://a.example.com/1.png")
        d.download("https://b.example.com/2.png")
        # one limiter per normalized hostname
        assert set(d.limiters._limiters) == {"a_example_com", "b_example_com"}


class TestOCRStageOnline:
    def _refs(self):
        data_url = "data:image/png;base64," + base64.b64encode(
            b"STUB1:inline"
        ).decode()
        return [[
            {"src": "r.png", "image_url": "https://img.example.com/r.png",
             "payload_kind": "remote"},
            {"src": "d.png", "image_url": data_url, "payload_kind": "data"},
        ]]

    def _batch(self):
        from web_mass_scraper_ocr_ray.stages.extract import IMAGE_REF_TYPE

        return pa.table({
            "url": pa.array(["https://h.example.com/p"], pa.string()),
            "images": pa.array(self._refs(), pa.list_(IMAGE_REF_TYPE)),
        })

    def test_offline_routes_remote_to_failed(self):
        from web_mass_scraper_ocr_ray.stages.ocr_stage import OCRStage

        out = OCRStage()( self._batch() )
        row = out.to_pylist()[0]
        assert row["failed_images"] == ["https://img.example.com/r.png"]
        assert len(row["images"]) == 1  # only the data url OCR'd

    def test_online_fetches_and_ocrs_remote(self):
        from web_mass_scraper_ocr_ray.stages.ocr_stage import OCRStage

        stage = OCRStage(
            fetch_remote_images=True,
            image_transport=_transport_returning(
                payload=b"STUB1:fetched remote text"
            ),
            image_fetch_kwargs={"rate": 1e9},
        )
        row = stage(self._batch()).to_pylist()[0]
        assert row["failed_images"] == []
        texts = [i["text"] for i in row["images"]]
        assert "fetched remote text" in texts and "inline" in texts
        assert row["ocr_attempts"] == 2 and row["ocr_successes"] == 2

    def test_online_download_failure_falls_back(self):
        from web_mass_scraper_ocr_ray.stages.ocr_stage import OCRStage

        stage = OCRStage(
            fetch_remote_images=True,
            image_transport=_transport_returning(status=404),
            image_fetch_kwargs={"rate": 1e9, "retry_count": 2},
        )
        row = stage(self._batch()).to_pylist()[0]
        assert row["failed_images"] == ["https://img.example.com/r.png"]
