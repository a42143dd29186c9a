"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Per the build brief: image/audio/video are opaque ``binary`` columns
with typed metadata; decode / feature-extract / resize / frame-sample
are actor-pool ``map_batches`` stages. Compressed codec libraries
(PIL/ffmpeg) are NOT in this container, so those decode kernels are
STUBS behind the same interface (deterministic fakes /
NotImplementedError seams) — but uncompressed BMP is a pure byte
layout, so :mod:`..functions.imaging` provides a REAL numpy decode +
DCT-pHash path that runs end-to-end in-sandbox
(``PerceptualHasher(kernel="dct")``, ``MediaDecoder`` real BMP dims).
The Ray-side plumbing — schema, batch size, actor signature, output
layout — is identical for stub and real kernels.

Schema convention::

    media: media_id int64, payload binary, mime string, meta struct<...>

The stub decoder derives deterministic pseudo-metadata from payload
bytes (stable across runs/processes) so tests can assert exact values.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import pyarrow as pa

MEDIA_META_TYPE = pa.struct(
    [
        ("kind", pa.string()),          # image|audio|video|unknown
        ("n_bytes", pa.int64()),
        ("width", pa.int64()),          # images/video (stub-derived)
        ("height", pa.int64()),
        ("duration_ms", pa.int64()),    # audio/video (stub-derived)
        ("ok", pa.bool_()),
    ]
)


def _stub_dims(payload: bytes) -> tuple:
    """Deterministic fake dimensions from a content digest."""
    d = hashlib.md5(payload).digest()
    return 16 + d[0] * 8, 16 + d[1] * 8  # 16..2056 px


class MediaDecoder:
    """Actor-pool decode stage (stub kernels).

    A real deployment swaps ``_decode_image``/``_decode_audio`` for
    PIL/ffmpeg-backed kernels loaded once per actor in ``__init__`` —
    the Ray plumbing is identical. ``strict=True`` surfaces the seam:
    any non-stub payload raises NotImplementedError instead of faking.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _decode_one(self, payload: Optional[bytes], mime: str) -> dict:
        meta = {"kind": "unknown", "n_bytes": 0, "width": 0, "height": 0,
                "duration_ms": 0, "ok": False}
        if payload is None or not mime:
            return meta
        meta["n_bytes"] = len(payload)
        if mime == "application/pdf":
            kind = "document"  # PDF/layout-parse route (north_star);
            # real impl: layout-block extraction per actor, order kept
        else:
            kind = mime.split("/", 1)[0]
        if kind not in ("image", "audio", "video", "document"):
            return meta
        meta["kind"] = kind
        if kind == "image" and payload.startswith(b"BM"):
            # REAL path: BMP headers are decodable without codec libs
            try:
                from ..functions.imaging import bmp_dims

                w, h = bmp_dims(bytes(payload))
                meta["width"], meta["height"] = w, h
                meta["ok"] = True
                return meta
            except ValueError:
                meta["ok"] = False
                return meta
        if self.strict and not payload.startswith(b"STUB1:"):
            raise NotImplementedError(
                "real media decode requires codec libraries not present "
                "in this container (stub contract: payload starts STUB1: "
                "or is an uncompressed BMP)"
            )
        if kind == "image":
            w, h = _stub_dims(payload)
            meta["width"], meta["height"] = w, h
        elif kind == "document":
            # stub layout parse: deterministic page count from size;
            # real path: per-actor PDF engine emitting layout blocks in
            # reading order (the OCRStage pattern, same plumbing)
            meta["width"], meta["height"] = 612, 792  # US-Letter pts
            meta["duration_ms"] = 0
            meta["ok"] = payload.startswith(b"STUB1:") or payload.startswith(
                b"%PDF"
            )
            return meta
        else:
            meta["duration_ms"] = 1 + len(payload) % 60_000
        meta["ok"] = True
        return meta

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        mimes = batch.column("mime").to_pylist()
        metas = [self._decode_one(p, m) for p, m in zip(payloads, mimes)]
        # payload dropped after decode — heavy bytes never travel past
        # the decode stage (same rule as html in extract, §7.4.4)
        out = batch.drop_columns(["payload"])
        return out.append_column("meta", pa.array(metas, MEDIA_META_TYPE))


class FrameSampler:
    """Video frame-sample stub: emits k deterministic frame offsets per
    row (list<int64> of millisecond timestamps). Real impl: ffmpeg
    keyframe probe per actor."""

    def __init__(self, k: int = 4):
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = batch.column("meta").to_pylist()
        offsets = []
        for m in metas:
            dur = m["duration_ms"] or 0
            if m["kind"] != "video" or dur <= 0:
                offsets.append([])
            else:
                step = max(dur // (self.k + 1), 1)
                offsets.append([step * (i + 1) for i in range(self.k)])
        return batch.append_column(
            "frame_offsets_ms", pa.array(offsets, pa.list_(pa.int64()))
        )


class PerceptualHasher:
    """Image perceptual-hash stage (two kernels, real plumbing).

    ``kernel="stub"`` derives a deterministic 64-bit hash (16 hex chars
    of the payload's md5) so dedup semantics and the SQL oracle are
    exact without any codec. ``kernel="dct"`` is the REAL classic DCT
    pHash (functions/imaging.PHashKernel: area-resize 32×32 → DCT-II →
    8×8 low-frequency block → median threshold) over BMP payloads —
    runs on real pixels in-sandbox; a PIL deployment only swaps
    ``imaging.decode_image``. The DCT basis + resize weights are
    precomputed once per ACTOR here in ``__init__`` (the stateful-stage
    rule), not per batch. ``strict`` surfaces the seam like
    :class:`MediaDecoder`. Non-image / undecodable rows get a null
    phash (they pass through for downstream routing).

    Identical images share a phash → exact-dup groups via one groupby;
    NEAR-dup extends by banding the 64 bits 4×16 and reusing the
    simhash candidate machinery (stages/dedup.py) — same shuffle shape.
    """

    def __init__(self, strict: bool = False, kernel: str = "stub"):
        self.strict = strict
        self.kernel = kernel
        if kernel == "dct":
            from ..functions.imaging import PHashKernel

            self._ph = PHashKernel()
        elif kernel != "stub":
            raise ValueError(f"unknown phash kernel {kernel!r}")

    def _hash_one(self, p: bytes) -> Optional[str]:
        if self.kernel == "dct":
            try:
                return self._ph.hash_payload(p)
            except ValueError:
                if self.strict:
                    raise NotImplementedError(
                        "non-BMP image payload: real decode of compressed "
                        "formats requires PIL (swap imaging.decode_image)")
                return None
        if self.strict and not p.startswith(b"STUB1:"):
            raise NotImplementedError(
                "real image decode requires PIL — use kernel='dct' for "
                "BMP payloads or inject a PIL-backed decode_image")
        return hashlib.md5(p).hexdigest()[:16]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        mimes = batch.column("mime").to_pylist()
        out = []
        for p, m in zip(payloads, mimes):
            if not (m or "").startswith("image/") or p is None:
                out.append(None)
                continue
            out.append(self._hash_one(bytes(p)))
        return batch.append_column("phash", pa.array(out, pa.string()))


def synth_media_dataset(sf_dir: str):
    """Deterministic media table derived from documents.parquet:
    payload = STUB1:<text bytes>, mime cycles image/audio/video."""
    import pyarrow.parquet as pq
    import ray.data as rd

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    mimes_cycle = ("image/png", "audio/wav", "video/mp4")
    tbl = pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "payload": pa.array(
            [b"STUB1:" + t.encode("utf-8") for t in texts], pa.binary()
        ),
        "mime": pa.array([mimes_cycle[i % 3] for i in ids], pa.string()),
    })
    return rd.from_arrow(tbl)


def decode_media(media_ds, concurrency=None, batch_size: int = 256,
                 strict: bool = False):
    """The headline multimodal pipeline: actor-pool decode (+ sampling).

    Small batch_size by design — payload batches are bytes-heavy
    (batch_size × payload_size must fit a worker heap).
    ``concurrency`` defaults to an autoscaling range sized to the
    cluster (a fixed pool starves large clusters)."""
    if concurrency is None:
        from ._pool import autoscale_actors

        concurrency = autoscale_actors()
    decoded = media_ds.map_batches(
        MediaDecoder, fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
    return decoded.map_batches(
        FrameSampler, batch_format="pyarrow", concurrency=concurrency
    )


class AudioFeaturizer:
    """REAL audio feature stage (functions/audio.py): decode RIFF/WAVE
    PCM-16 mono and emit exact-integer waveform features (n_samples,
    sample_rate, duration_ms, energy, zero_crossings, peak_abs,
    n_active_frames). Runs on real samples in-sandbox; a soundfile
    deployment swaps only ``audio.decode_wav``. Mirrors
    :class:`PerceptualHasher`'s seam contract: non-audio rows pass
    through with null features; undecodable audio is null unless
    ``strict``, where the NotImplementedError seam surfaces."""

    _COLS = ("n_samples", "sample_rate", "duration_ms", "energy",
             "zero_crossings", "peak_abs", "n_active_frames")

    def __init__(self, strict: bool = False):
        from ..functions.audio import wav_features

        self._features = wav_features
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        mimes = batch.column("mime").to_pylist()
        rows = []
        for p, m in zip(payloads, mimes):
            if not (m or "").startswith("audio/") or p is None:
                rows.append(None)
                continue
            try:
                rows.append(self._features(bytes(p)))
            except NotImplementedError:
                if self.strict:
                    raise
                rows.append(None)
            except ValueError:
                if self.strict:
                    raise NotImplementedError(
                        "non-WAV audio payload: real decode of compressed "
                        "formats requires soundfile (swap audio.decode_wav)")
                rows.append(None)
        out = batch
        for c in self._COLS:
            out = out.append_column(
                c, pa.array([r[c] if r else None for r in rows],
                            pa.int64()))
        return out


class ImageResizer:
    """REAL image thumbnail stage: decode BMP → exact area-average
    resample to (out_h, out_w) (functions/imaging.resize_area — real
    pixels, float64 interval-overlap weights, no PIL) → re-encode the
    grayscale thumbnail as BMP. The brief's decode/resize plumbing,
    end-to-end real in-sandbox; a PIL deployment swaps only
    ``imaging.decode_image``.

    Stateful-stage rule: the (in_dims → weight matrices) cache lives on
    the ACTOR (bounded by distinct input dims), so repeated dims pay
    the weight build once per actor, not per image. Area resampling is
    mass-preserving, so the mean gray level is invariant up to float
    rounding — emitted as milli-level ints (mean_milli_in/out) for the
    claim gate. Non-image / undecodable rows pass through with nulls
    (strict surfaces the seam, like :class:`MediaDecoder`).
    """

    def __init__(self, out_h: int = 16, out_w: int = 16,
                 strict: bool = False):
        from ..functions import imaging

        self._img = imaging
        self.out_h, self.out_w = out_h, out_w
        self.strict = strict
        self._wcache = {}

    def _resize_one(self, p: bytes):
        img = self._img
        gray = img.to_gray_u8(img.decode_image(p))
        h, w = gray.shape
        wh_ww = self._wcache.get((h, w))
        if wh_ww is None:
            wh_ww = self._wcache[(h, w)] = (
                img._area_weights(h, self.out_h),
                img._area_weights(w, self.out_w))
        small = img.resize_area(gray, self.out_h, self.out_w,
                                wh=wh_ww[0], ww=wh_ww[1])
        import numpy as np

        small_u8 = np.clip(np.rint(small), 0, 255).astype(np.uint8)
        rgb = np.repeat(small_u8[:, :, None], 3, axis=2)
        return {
            "thumb": img.encode_bmp(rgb),
            "in_h": h, "in_w": w,
            "out_h": self.out_h, "out_w": self.out_w,
            "mean_milli_in": int(round(float(gray.mean()) * 1000)),
            "mean_milli_out": int(round(float(small.mean()) * 1000)),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        mimes = batch.column("mime").to_pylist()
        rows = []
        for p, m in zip(payloads, mimes):
            if not (m or "").startswith("image/") or p is None:
                rows.append(None)
                continue
            try:
                rows.append(self._resize_one(bytes(p)))
            except ValueError:
                if self.strict:
                    raise NotImplementedError(
                        "non-BMP image payload: real decode of compressed "
                        "formats requires PIL (swap imaging.decode_image)")
                rows.append(None)
        out = batch.append_column(
            "thumb", pa.array(
                [r["thumb"] if r else None for r in rows], pa.binary()))
        for c in ("in_h", "in_w", "out_h", "out_w",
                  "mean_milli_in", "mean_milli_out"):
            out = out.append_column(
                c, pa.array([r[c] if r else None for r in rows],
                            pa.int64()))
        return out
