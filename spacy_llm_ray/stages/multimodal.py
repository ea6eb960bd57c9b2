"""Multimodal column stages (image/audio/video as opaque binary columns).

Images and audio are REAL here, no external codecs needed:

- PPM (P6 color / P5 gray) and uncompressed 24/32-bit BMP decode to numpy
  via header parsing + ``np.frombuffer`` (pure numpy),
- WAV decodes via the stdlib ``wave`` module (8/16/32-bit PCM),
- resize is a numpy nearest-neighbor kernel,
- encoders round-trip for tests (``encode_ppm`` / ``encode_wav``).

``ImageDecodeStage`` sniffs the payload magic (P6/P5/BM) and dispatches;
unknown formats (JPEG/PNG/...) fall back to a deterministic md5-seeded fake
unless ``strict=True`` (raises, telling the user to plug a codec via
``decode_fn``). VIDEO: uncompressed RGB AVI decodes for real
(``decode_avi_rgb`` — pure-numpy RIFF walk) and ``VideoFrameSampleStage``
samples frames deterministically; compressed codecs (H.264/VP9/...) still
need ffmpeg and keep the same strict/fake gate.

Batch-size guidance: binary payloads make rows wide — size ``batch_size`` so
batch x concurrency fits worker heap, and keep these stages in
``batch_format="pyarrow"`` (binary columns do not round-trip pandas cleanly).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Callable, Optional, Tuple

import numpy as np
import pyarrow as pa

MEDIA_META_TYPE = pa.struct(
    [
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("sample_rate", pa.int32()),
    ]
)


# ---------------------------------------------------------------- codecs

def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6, RGB) / PGM (P5, gray) to (h, w, 3) uint8.
    Header: magic, then whitespace-separated width/height/maxval with
    ``#`` comments allowed."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    color = payload[:2] == b"P6"
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    n = w * h * (3 if color else 1)
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    if color:
        return arr.reshape(h, w, 3).copy()
    g = arr.reshape(h, w)
    return np.stack([g, g, g], axis=-1)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 payload (test round-trip helper)."""
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img.astype(np.uint8)
    ).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode uncompressed 24/32-bit BMP (BITMAPINFOHEADER) to (h, w, 3)
    uint8. Handles 4-byte row padding and bottom-up row order."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("BMP core header unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    bytes_pp = bpp // 8
    row_stride = (w * bytes_pp + 3) & ~3
    rows = []
    for r in range(h):
        off = data_offset + r * row_stride
        row = np.frombuffer(payload, dtype=np.uint8, count=w * bytes_pp, offset=off)
        rows.append(row.reshape(w, bytes_pp))
    img = np.stack(rows)
    if bottom_up:
        img = img[::-1]
    # BMP stores BGR(A): reorder to RGB.
    return img[:, :, 2::-1].copy()


def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """Decode PCM WAV via stdlib ``wave``: (samples float32 in [-1, 1],
    mono-mixed), sample_rate."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        n_ch = f.getnchannels()
        width = f.getsampwidth()
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
    if width == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float32 [-1, 1] mono -> 16-bit PCM WAV payload (test helper)."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def resize_nearest(img: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize to (h, w) via numpy index maps."""
    h, w = size
    src_h, src_w = img.shape[:2]
    ri = (np.arange(h) * src_h // h).clip(0, src_h - 1)
    ci = (np.arange(w) * src_w // w).clip(0, src_w - 1)
    return img[ri][:, ci]


def fake_decode_image(payload: bytes, size: int = 16) -> np.ndarray:
    """Deterministic fallback for formats with no available codec:
    (size, size, 3) uint8 derived from an md5-seeded generator."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(size, size, 3), dtype=np.uint8)


def sniff_decode_image(payload: bytes) -> Optional[np.ndarray]:
    """Magic-sniffing decode for the formats with built-in codecs; None if
    the format is not supported here."""
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    return None


# ---------------------------------------------------------------- stages

class ImageDecodeStage:
    """binary ``data`` column -> fixed-size ``pixels`` tensor column +
    ``meta`` struct. Actor-pool stage (codec state loads once per actor).
    PPM/BMP decode for real; unknown formats use the deterministic fake
    (or raise with ``strict=True``)."""

    def __init__(
        self,
        data_col: str = "data",
        out_col: str = "pixels",
        size: int = 16,
        decode_fn: Optional[Callable[[bytes], np.ndarray]] = None,
        strict: bool = False,
    ):
        self._decode_fn = decode_fn
        self._data_col = data_col
        self._out_col = out_col
        self._size = size
        self._strict = strict

    def _decode(self, payload: bytes) -> Tuple[np.ndarray, str, int, int]:
        if self._decode_fn is not None:
            img = np.asarray(self._decode_fn(payload))
            mime = "image/custom"
        else:
            img = sniff_decode_image(payload)
            if img is None:
                if self._strict:
                    raise NotImplementedError(
                        "no codec for this image format here (PPM/BMP are "
                        "built in); pass decode_fn for e.g. JPEG/PNG"
                    )
                return fake_decode_image(payload, self._size), "image/fake", \
                    self._size, self._size
            mime = "image/x-portable-pixmap" if payload[:1] == b"P" else "image/bmp"
        h, w = img.shape[:2]
        if (h, w) != (self._size, self._size):
            img = resize_nearest(img, (self._size, self._size))
        return img, mime, w, h

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self._data_col].to_pylist()
        decoded = [self._decode(p) for p in payloads]
        pixels = np.stack([d[0] for d in decoded]) if decoded else (
            np.zeros((0, self._size, self._size, 3), dtype=np.uint8)
        )
        flat = pa.FixedSizeListArray.from_arrays(
            pa.array(pixels.reshape(-1), type=pa.uint8()),
            self._size * self._size * 3,
        )
        metas = [
            {"mime": mime, "width": w, "height": h, "n_frames": 1,
             "sample_rate": 0}
            for _, mime, w, h in decoded
        ]
        return batch.append_column(self._out_col, flat).append_column(
            "meta", pa.array(metas, type=MEDIA_META_TYPE)
        )


class ImageFeatureStage:
    """pixels tensor -> small feature vector (channel means/stds) — the shape
    of a batched embedding/feature-extraction stage."""

    def __init__(self, pixels_col: str = "pixels", out_col: str = "features", size: int = 16):
        self._pixels_col = pixels_col
        self._out_col = out_col
        self._size = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .arrow_utils import list_column_matrix

        # Flat-buffer reshape of the FixedSizeList pixel column (r3 VERDICT
        # #4 convention) — no per-pixel to_pylist Python hop.
        arr = list_column_matrix(batch[self._pixels_col], dtype=np.float64)
        if arr.size:
            arr = arr.reshape(len(arr), self._size, self._size, 3)
            # Integer-exact accumulation: pixels are uint8, so float64 sum
            # and sum-of-squares are EXACT (no rounding), making mean/std
            # independent of batch shape and reduction order — a float32
            # mean/std here differs in the 4th decimal between batch sizes,
            # which breaks the encoder-side gold comparison.
            npx = self._size * self._size  # power of two -> exact division
            sums = arr.sum(axis=(1, 2))
            sumsq = (arr * arr).sum(axis=(1, 2))
            mean = sums / npx
            var = np.maximum(sumsq / npx - mean * mean, 0.0)
            feats = np.concatenate([mean, np.sqrt(var)], axis=1).astype(
                np.float32
            )
        else:
            feats = np.zeros((0, 6), dtype=np.float32)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1), type=pa.float32()), 6
        )
        return batch.append_column(self._out_col, col)


class AudioFeatureStage:
    """binary WAV ``data`` column -> (duration_s, rms, zero-crossing rate)
    features + ``meta``. Real decode via stdlib ``wave``."""

    def __init__(self, data_col: str = "data", strict: bool = True):
        self._data_col = data_col
        self._strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, rmss, zcrs, metas = [], [], [], []
        for payload in batch[self._data_col].to_pylist():
            try:
                x, rate = decode_wav(payload)
            except Exception:
                if self._strict:
                    raise
                x, rate = np.zeros(0, dtype=np.float32), 0
            n = len(x)
            durs.append(n / rate if rate else 0.0)
            rmss.append(float(np.sqrt((x ** 2).mean())) if n else 0.0)
            zcrs.append(
                float((np.diff(np.signbit(x)) != 0).mean()) if n > 1 else 0.0
            )
            metas.append(
                {"mime": "audio/wav", "width": 0, "height": 0,
                 "n_frames": n, "sample_rate": rate}
            )
        return (
            batch.append_column("duration_s", pa.array(durs, type=pa.float64()))
            .append_column("rms", pa.array(rmss, type=pa.float64()))
            .append_column("zcr", pa.array(zcrs, type=pa.float64()))
            .append_column("meta", pa.array(metas, type=MEDIA_META_TYPE))
        )


def frame_sample_indices(n_frames: int, every: int) -> list:
    """Deterministic frame sampling plan for a video payload."""
    return list(range(0, max(0, n_frames), max(1, every)))


# --------------------------------------------------------------- video (AVI)
# Real video decode for the one container expressible in pure numpy:
# uncompressed RGB AVI (RIFF / BI_RGB 'DIB ' streams — the format ffmpeg
# writes with `-c:v rawvideo -pix_fmt bgr24`). Compressed codecs
# (H.264/VP9/...) still need ffmpeg and keep the strict/fake gate in
# VideoFrameSampleStage, same policy as ImageDecodeStage for JPEG/PNG.


def encode_avi_rgb(frames: np.ndarray, fps: int = 10) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames as an uncompressed AVI."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    row_pad = (-(w * 3)) % 4
    frame_size = (w * 3 + row_pad) * h

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return tag + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) % 2 else b""
        )

    # BGR, bottom-up rows, 4-byte-aligned — the DIB layout.
    movi_items = []
    for f in frames:
        bgr = f[::-1, :, ::-1]
        rows = bgr.reshape(h, w * 3)
        if row_pad:
            rows = np.concatenate(
                [rows, np.zeros((h, row_pad), dtype=np.uint8)], axis=1
            )
        movi_items.append(chunk(b"00db", rows.tobytes()))
    movi = b"movi" + b"".join(movi_items)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(1, fps),  # dwMicroSecPerFrame
        frame_size * fps,  # dwMaxBytesPerSec
        0, 0,  # padding, flags (no AVIF_HASINDEX — we write no idx1 chunk)
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl = b"hdrl" + chunk(b"avih", avih) + chunk(b"LIST", strl)
    riff_body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_rgb(payload: bytes) -> Tuple[np.ndarray, int]:
    """Decode an uncompressed (BI_RGB) AVI -> ((n, h, w, 3) uint8 RGB, fps).
    Raises ValueError on non-AVI or compressed payloads."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    w = h = bits = None
    bottom_up = True
    compression = None
    fps = 0
    frames_raw = []
    in_vids = False  # last-seen strh was the video stream's

    def walk(buf: bytes, pos: int, end: int):
        nonlocal w, h, bits, bottom_up, compression, fps, in_vids
        end = min(end, len(buf))
        while pos + 8 <= end:
            tag = buf[pos:pos + 4]
            size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            body_start = pos + 8
            if tag == b"LIST":
                walk(buf, body_start + 4, body_start + size)
            elif tag == b"strh":
                # strf chunks are typed by the PRECEDING strh: an audio strl
                # listed first must not have its WAVEFORMATEX parsed as a
                # BITMAPINFOHEADER.
                in_vids = buf[body_start:body_start + 4] == b"vids"
                if in_vids:
                    rate = struct.unpack(
                        "<I", buf[body_start + 24:body_start + 28]
                    )[0]
                    scale = struct.unpack(
                        "<I", buf[body_start + 20:body_start + 24]
                    )[0]
                    fps = rate // max(1, scale)
            elif tag == b"strf" and in_vids and w is None:
                (_, w_, h_, _, bits_, comp) = struct.unpack(
                    "<IiiHHI", buf[body_start:body_start + 20]
                )
                # Negative biHeight = top-down DIB (no row flip needed).
                w, h, bits, compression = w_, abs(h_), bits_, comp
                bottom_up = h_ > 0
            elif tag[2:] in (b"db", b"dc"):
                frames_raw.append(buf[body_start:body_start + size])
            pos = body_start + size + (size % 2)

    try:
        walk(payload, 12, len(payload))
    except struct.error as err:
        # Truncated/corrupt chunk headers must hit the same ValueError gate
        # the strict/fake dispatch in VideoFrameSampleStage catches.
        raise ValueError(f"malformed AVI payload: {err}") from err
    if w is None or not frames_raw:
        raise ValueError("no video stream found in AVI")
    if compression != 0 or bits != 24:
        raise ValueError(
            f"compressed/non-24-bit AVI (biCompression={compression}, "
            f"bits={bits}) needs an external codec (ffmpeg)"
        )
    stride = (w * 3) + ((-(w * 3)) % 4)
    out = []
    for raw in frames_raw:
        if len(raw) < stride * h:
            raise ValueError("truncated AVI frame chunk")
        rows = np.frombuffer(raw, dtype=np.uint8)[: stride * h].reshape(h, stride)
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        rgb = bgr[:, :, ::-1]
        out.append(rgb[::-1] if bottom_up else rgb)
    return np.stack(out), fps


class VideoFrameSampleStage:
    """binary video column -> deterministic sampled-frame features:
    n_frames, fps, n_sampled, mean RGB over the sampled frames. Real decode
    for uncompressed AVI; other containers fall back to a deterministic
    md5-seeded fake unless ``strict=True`` (same gate as ImageDecodeStage —
    plug a real codec via ``decode_fn`` where ffmpeg exists)."""

    def __init__(
        self,
        data_col: str = "video",
        every: int = 2,
        strict: bool = False,
        decode_fn: Optional[Callable] = None,
    ):
        self._col = data_col
        self._every = every
        self._strict = strict
        self._decode = decode_fn or self._default_decode

    @staticmethod
    def _fake(payload: bytes) -> Tuple[np.ndarray, int]:
        seed = int.from_bytes(hashlib.md5(payload).digest()[:4], "little")
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, size=(4, 8, 8, 3), dtype=np.uint8), 10

    def _default_decode(self, payload: bytes) -> Tuple[np.ndarray, int]:
        try:
            return decode_avi_rgb(payload)
        except ValueError:
            if self._strict:
                raise
            return self._fake(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_frames, fps_col, n_sampled = [], [], []
        means = []
        for payload in batch[self._col].to_pylist():
            frames, fps = self._decode(payload)
            idx = frame_sample_indices(len(frames), self._every)
            sampled = frames[idx]
            n_frames.append(len(frames))
            fps_col.append(fps)
            n_sampled.append(len(idx))
            means.append(sampled.mean(axis=(0, 1, 2)).tolist())
        return (
            batch.append_column("n_frames", pa.array(n_frames, type=pa.int32()))
            .append_column("fps", pa.array(fps_col, type=pa.int32()))
            .append_column("n_sampled", pa.array(n_sampled, type=pa.int32()))
            .append_column(
                "video_mean_rgb", pa.array(means, type=pa.list_(pa.float64()))
            )
        )


def _media_raw_items(n: int = 32, seed: int = 13):
    """Raw (pre-encode) synthetic media content — the single source for both
    the binary table and the encoder-side feature gold. The rng call ORDER
    is part of the determinism contract: payloads must stay byte-identical
    across calls and versions. Yields (img, tone_f32, clip, fps)."""
    rng = np.random.RandomState(seed)
    for i in range(n):
        h, w = 8 + (i % 5) * 4, 8 + (i % 3) * 8
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        t = np.arange(0, 1600 + 100 * (i % 4)) / 16000.0
        tone = (0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        clip = rng.randint(
            0, 256, size=(3 + (i % 4), 6, 6 + (i % 2), 3), dtype=np.uint8
        )
        yield img, tone, clip, 8 + (i % 3)


def make_fake_media_table(n: int = 32, seed: int = 13) -> pa.Table:
    """Deterministic synthetic media table: real PPM images (varying sizes
    and content) + real WAV tones + real uncompressed AVI clips, as binary
    columns."""
    img_payloads, wav_payloads, avi_payloads = [], [], []
    for img, tone, clip, fps in _media_raw_items(n, seed):
        img_payloads.append(encode_ppm(img))
        wav_payloads.append(encode_wav(tone))
        avi_payloads.append(encode_avi_rgb(clip, fps=fps))
    return pa.table(
        {
            "media_id": pa.array(list(range(n)), type=pa.int64()),
            "data": pa.array(img_payloads, type=pa.binary()),
            "audio": pa.array(wav_payloads, type=pa.binary()),
            "video": pa.array(avi_payloads, type=pa.binary()),
        }
    )


def media_features_gold(
    n: int = 32, seed: int = 13, size: int = 16, every: int = 2
) -> pa.Table:
    """ENCODER-SIDE expected features for ``make_fake_media_table(n, seed)``
    (r3 VERDICT #5: the media value oracle). Computed from the RAW arrays
    before any container encoding — never through decode_ppm / decode_wav /
    decode_avi_rgb — replicating the feature stages' arithmetic dtype-for-
    dtype, so a value comparison against the decode-side pipeline verifies
    every decode path bit-exactly. PPM and uncompressed AVI round-trip
    losslessly; WAV's one lossy step (int16 quantization) is the ENCODER's,
    replicated here from ``encode_wav``'s formula."""
    import pyarrow.compute as pc

    cols: dict = {k: [] for k in (
        "media_id", "mean_r", "mean_g", "mean_b", "std_r", "std_g", "std_b",
        "duration_s", "rms", "zcr", "n_frames", "fps", "n_sampled",
        "vid_mean_r", "vid_mean_g", "vid_mean_b",
    )}
    for i, (img, tone, clip, fps) in enumerate(_media_raw_items(n, seed)):
        cols["media_id"].append(i)
        # Image: same resize kernel + the integer-exact float64 sum/sumsq
        # formula ImageFeatureStage uses (batch-shape-invariant, so the
        # per-item gold matches the batched stage bit-for-bit).
        resized = img if img.shape[:2] == (size, size) else resize_nearest(
            img, (size, size)
        )
        arr = resized.astype(np.float64)
        npx = size * size
        mean = arr.sum(axis=(0, 1)) / npx
        var = np.maximum((arr * arr).sum(axis=(0, 1)) / npx - mean * mean, 0.0)
        feats = np.round(
            np.concatenate([mean, np.sqrt(var)])
            .astype(np.float32)
            .astype(np.float64),
            4,
        )
        for j, c in enumerate(("mean_r", "mean_g", "mean_b", "std_r", "std_g", "std_b")):
            cols[c].append(feats[j])
        # Audio: encode_wav's quantization + the PCM scaling contract
        # (int16 / 32768), then AudioFeatureStage's float32 reductions.
        pcm = (np.clip(tone, -1.0, 1.0) * 32767.0).astype("<i2")
        x = pcm.astype(np.float32) / 32768.0
        cols["duration_s"].append(len(x) / 16000 if len(x) else 0.0)
        cols["rms"].append(float(np.sqrt((x ** 2).mean())) if len(x) else 0.0)
        cols["zcr"].append(
            float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
        )
        # Video: same sampling plan + uint8 -> float64 mean as
        # VideoFrameSampleStage over the raw clip.
        idx = frame_sample_indices(len(clip), every)
        cols["n_frames"].append(len(clip))
        cols["fps"].append(fps)
        cols["n_sampled"].append(len(idx))
        vmean = np.round(clip[idx].mean(axis=(0, 1, 2)).astype(np.float64), 4)
        for j, c in enumerate(("vid_mean_r", "vid_mean_g", "vid_mean_b")):
            cols[c].append(vmean[j])
    out = {
        "media_id": pa.array(cols["media_id"], type=pa.int64()),
    }
    for c in ("mean_r", "mean_g", "mean_b", "std_r", "std_g", "std_b",
              "vid_mean_r", "vid_mean_g", "vid_mean_b"):
        out[c] = pa.array(cols[c], type=pa.float64())
    for c in ("duration_s", "rms", "zcr"):
        # The query rounds these with pyarrow's kernel — use the identical
        # kernel here so ties round the same way.
        out[c] = pc.round(pa.array(cols[c], type=pa.float64()), ndigits=4)
    for c in ("n_frames", "fps", "n_sampled"):
        out[c] = pa.array(cols[c], type=pa.int64())
    return pa.table(out)
