"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
metadata columns alongside, processed by actor-pool ``map_batches``
stages with small batches (binary rows are wide) and
``batch_format="pyarrow"`` (binary columns do not round-trip pandas
object dtype safely).

Decode support is honest about the environment:

* **Real pure-python decoders** (no PIL/ffmpeg needed): PPM (P6) / PGM
  (P5) images, uncompressed 24/32-bit BI_RGB BMP images, 8-bit
  non-interlaced PNG (stdlib ``zlib`` IDAT inflate + all five scanline
  filters, gray/RGB/palette/alpha color types), and PCM 8/16-bit WAV
  audio — full header parse + numpy pixel/sample decode, tested against
  hand-built fixtures.
* DCT/entropy-coded formats (JPEG/MP3/...) need codec libraries that are
  NOT in this container; passing such payloads with ``fake=False`` raises
  a clear error, and ``fake=True`` swaps in a deterministic payload-hash
  stub so the pipeline shape stays testable for any bytes.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

DECODED_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ]
)


# ---------------------------------------------------------------------------
# pure-python byte-level decoders


def _pnm_tokens(b: bytes, n: int, start: int):
    """Read ``n`` whitespace-separated ASCII integer tokens from a PNM
    header (``#`` comments allowed), returning (values, next_offset)."""
    vals, i, ln = [], start, len(b)
    while len(vals) < n:
        while i < ln and b[i : i + 1].isspace():
            i += 1
        if i < ln and b[i] == 0x23:  # '#' comment to end of line
            while i < ln and b[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < ln and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        vals.append(int(b[i:j]))
        i = j
    return vals, i + 1  # single whitespace after maxval precedes raster


def decode_pnm(b: bytes) -> np.ndarray:
    """Decode binary PPM (P6, RGB) / PGM (P5, gray) → uint8 array
    (height, width, channels).  Pure python/numpy; maxval ≤ 255 only."""
    if b[:2] == b"P6":
        ch = 3
    elif b[:2] == b"P5":
        ch = 1
    else:
        raise ValueError("not a binary PPM/PGM payload")
    (w, h, maxval), off = _pnm_tokens(b, 3, 2)
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    need = w * h * ch
    raster = np.frombuffer(b, dtype=np.uint8, count=need, offset=off)
    return raster.reshape(h, w, ch)


def decode_bmp(b: bytes) -> np.ndarray:
    """Decode uncompressed (BI_RGB) 24/32-bit BMP → uint8 (h, w, 3).
    Handles bottom-up and top-down rows and 4-byte row padding."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP (bpp={bpp}, "
                         f"compression={comp})")
    top_down = h < 0
    h = abs(h)
    nb = bpp // 8
    stride = ((bpp * w + 31) // 32) * 4
    rows = np.frombuffer(
        b, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    px = rows[:, : w * nb].reshape(h, w, nb)
    if not top_down:
        px = px[::-1]
    return px[:, :, 2::-1]  # BGR(A) → RGB, alpha dropped


def decode_wav(b: bytes):
    """Decode PCM 8/16-bit WAV → (samples float32 in [-1, 1] shaped
    (n, channels), sample_rate).  Pure python RIFF chunk walk."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i, fmt, data = 12, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        sz = struct.unpack_from("<I", b, i + 4)[0]
        body = b[i + 8 : i + 8 + sz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(f"only PCM 8/16-bit WAV (format={audio_format}, "
                         f"bits={bits})")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    else:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.float32)
             - 128.0) / 128.0
    n = len(s) // channels
    return s[: n * channels].reshape(n, channels), rate


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(b: bytes) -> np.ndarray:
    """Decode PNG → uint8 (h, w, channels) with stdlib ``zlib`` only.

    Supports the crawl-common shapes: bit depth 8, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced.  All
    five scanline filters (None/Sub/Up/Average/Paeth) are unfiltered —
    Sub via a per-channel modular cumsum, Up vectorized across the row,
    Average/Paeth with the sequential per-pixel recurrence the spec
    requires (vector ops over the channel lanes inside)."""
    import zlib

    if b[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    i, idat, plte = 8, [], None
    w = h = depth = ctype = interlace = None
    while i + 8 <= len(b):
        ln = struct.unpack_from(">I", b, i)[0]
        cid = b[i + 4 : i + 8]
        body = b[i + 8 : i + 8 + ln]
        if cid == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif cid == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        i += 12 + ln  # length + type + body + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if depth != 8 or interlace != 0 or ctype not in (0, 2, 3, 4, 6):
        raise NotImplementedError(
            f"PNG depth={depth} ctype={ctype} interlace={interlace} "
            "not supported (8-bit non-interlaced only)"
        )
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        if f == 0:
            cur = line
        elif f == 1:  # Sub: modular prefix sum along pixels, per channel
            cur = (line.reshape(w, ch).cumsum(axis=0) % 256).reshape(-1)
        elif f == 2:  # Up
            cur = (line + prev) % 256
        elif f == 3:  # Average
            cur = np.empty(stride, np.int32)
            cur[:ch] = (line[:ch] + prev[:ch] // 2) % 256
            for x in range(ch, stride, ch):
                cur[x:x + ch] = (
                    line[x:x + ch]
                    + (cur[x - ch:x] + prev[x:x + ch]) // 2
                ) % 256
        elif f == 4:  # Paeth
            cur = np.empty(stride, np.int32)
            cur[:ch] = (line[:ch] + prev[:ch]) % 256  # left=0 → pred=up
            for x in range(ch, stride, ch):
                a = cur[x - ch:x]
                up = prev[x:x + ch]
                c = prev[x - ch:x]
                p = a + up - c
                pa_, pb, pc = np.abs(p - a), np.abs(p - up), np.abs(p - c)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pc), a, np.where(pb <= pc, up, c)
                )
                cur[x:x + ch] = (line[x:x + ch] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = cur
        prev = cur.astype(np.int32)
    img = out.reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        img = plte[img.reshape(h, w)]
    return img


def encode_png_gray(img: np.ndarray) -> bytes:
    """Minimal PNG encoder (8-bit grayscale, filter 0, stdlib ``zlib``)
    — the writer half of :func:`decode_png`, for thumbnails/fixtures."""
    import zlib

    h, w = img.shape
    raster = b"".join(
        b"\x00" + img[y].astype(np.uint8).tobytes() for y in range(h)
    )

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (_PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b""))


def decode_image_bytes(b: bytes) -> np.ndarray:
    """Dispatch on magic bytes → uint8 (h, w, c).  PPM/PGM/BMP/PNG are
    decoded for real; anything else needs codec libs absent from this
    container."""
    if b[:2] in (b"P6", b"P5"):
        return decode_pnm(b)
    if b[:2] == b"BM":
        return decode_bmp(b)
    if b[:8] == _PNG_MAGIC:
        return decode_png(b)
    raise NotImplementedError(
        "only PPM/PGM/BMP/PNG decode is available without PIL/turbojpeg "
        f"(payload magic {b[:2]!r}); use fake=True for other formats"
    )


def _grid_feature(img: np.ndarray, dim: int) -> np.ndarray:
    """Real image feature: grayscale mean-pooled onto ``dim`` cells of a
    row-major √dim grid (padding cells by intensity histogram when dim is
    not a perfect square → simply use a dim-bin histogram instead)."""
    gray = img.astype(np.float32).mean(axis=2) if img.ndim == 3 else img
    g = int(np.sqrt(dim))
    if g * g == dim and gray.shape[0] >= g and gray.shape[1] >= g:
        h, w = gray.shape
        ys = (np.arange(h) * g // h)
        xs = (np.arange(w) * g // w)
        sums = np.zeros((g, g), np.float64)
        cnts = np.zeros((g, g), np.int64)
        np.add.at(sums, (ys[:, None], xs[None, :]), gray)
        np.add.at(cnts, (ys[:, None], xs[None, :]), 1)
        return (sums / np.maximum(cnts, 1) / 255.0).reshape(-1).astype(
            np.float32
        )
    hist, _ = np.histogram(gray, bins=dim, range=(0.0, 256.0))
    return (hist / max(gray.size, 1)).astype(np.float32)


# ---------------------------------------------------------------------------
# actor-pool stages


class ImageDecodeStage:
    """Actor-pool stage: binary image payload → (dims, feature vector).

    ``fake=False`` decodes PPM/PGM/BMP payloads for real (pure-python
    header parse + numpy raster decode) and emits a mean-pooled-grid /
    histogram feature; other formats raise per payload (codec libs absent
    here — a real deployment would load PIL/turbojpeg in ``__init__``).
    ``fake=True`` keeps the deterministic payload-hash stub for arbitrary
    bytes.
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "item_id",
                 feature_dim: int = 8, fake: bool = False):
        self.payload_col = payload_col
        self.id_col = id_col
        self.dim = feature_dim
        self.fake = fake

    def _fake_row(self, b: bytes):
        h = hashlib.sha256(b).digest()
        return (
            int.from_bytes(h[0:2], "little") % 1920 + 1,
            int.from_bytes(h[2:4], "little") % 1080 + 1,
            3,
            (np.frombuffer(h[: self.dim * 4], dtype=np.uint32)
             .astype(np.float32) / np.float32(2**32)).tolist(),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        payloads = batch.column(self.payload_col)
        widths, heights, chans, feats = [], [], [], []
        for p in payloads:
            b = p.as_py() or b""
            if self.fake:
                w, h, c, f = self._fake_row(b)
            else:
                img = decode_image_bytes(b)
                h, w = img.shape[:2]
                c = img.shape[2] if img.ndim == 3 else 1
                f = _grid_feature(img, self.dim).tolist()
            widths.append(w)
            heights.append(h)
            chans.append(c)
            feats.append(f)
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "channels": pa.array(chans, pa.int32()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class AudioDecodeStage:
    """Actor-pool stage: binary WAV payload → (sample_rate, channels,
    n_samples, feature = per-window RMS over ``feature_dim`` equal
    windows of the mono mix).  Real PCM decode, pure python."""

    def __init__(self, payload_col: str = "payload", id_col: str = "item_id",
                 feature_dim: int = 8):
        self.payload_col = payload_col
        self.id_col = id_col
        self.dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        rates, chans, nsamp, feats = [], [], [], []
        for p in batch.column(self.payload_col):
            samples, rate = decode_wav(p.as_py() or b"")
            mono = samples.mean(axis=1)
            n = len(mono)
            edges = (np.arange(self.dim + 1) * n) // self.dim
            rms = np.zeros(self.dim, np.float32)
            for k in range(self.dim):
                seg = mono[edges[k]:edges[k + 1]]
                if len(seg):
                    rms[k] = np.sqrt(np.mean(seg.astype(np.float64) ** 2))
            rates.append(int(rate))
            chans.append(samples.shape[1])
            nsamp.append(n)
            feats.append(rms.tolist())
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(rates, pa.int32()),
                "channels": pa.array(chans, pa.int32()),
                "n_samples": pa.array(nsamp, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def decode_images(ds, payload_col="payload", id_col="item_id", feature_dim=8,
                  fake=False, concurrency=(1, 4), batch_size=256):
    """Actor-pool decode stage; small batches because payload rows are wide."""
    return ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs=dict(
            payload_col=payload_col, id_col=id_col,
            feature_dim=feature_dim, fake=fake,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def decode_audio(ds, payload_col="payload", id_col="item_id", feature_dim=8,
                 concurrency=(1, 4), batch_size=256):
    """Actor-pool WAV decode stage (real PCM parse, pure python)."""
    return ds.map_batches(
        AudioDecodeStage,
        fn_constructor_kwargs=dict(
            payload_col=payload_col, id_col=id_col, feature_dim=feature_dim,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_sample_plan(ds, duration_col="duration_sec", id_col="item_id",
                      fps: float = 0.5):
    """Video frame-sampling plan: (item_id, frame_ts) rows, one per sampled
    frame — the flat_map half of a decode pipeline (decode itself stubbed)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        dur = batch.column(duration_col).to_numpy()
        out_id, out_ts = [], []
        for i, d in zip(ids, dur):
            ts = np.arange(0.0, float(d), 1.0 / fps)
            out_id.extend([int(i)] * len(ts))
            out_ts.extend(ts.tolist())
        return pa.table(
            {"item_id": pa.array(out_id, pa.int64()),
             "frame_ts": pa.array(out_ts, pa.float64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")
