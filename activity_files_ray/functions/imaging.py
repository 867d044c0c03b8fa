"""Image codecs + raster kernels — pure numpy/zlib, no external libs.

BASELINE.json's input is a table of image+caption rows whose ``bytes``
payload is a geo-referenced raster tile with a route polyline drawn in
it. This container has no PIL/libjpeg/OpenCV, so:

* PNG (lossless) is implemented for real: a minimal RGB8 encoder
  (filter 0 rows + zlib) and a spec-complete decoder (filters 0–4),
  from the public PNG specification. Round-trip is bit-exact.
* JPEG is STUBBED by a clearly-marked deterministic lossy codec
  (``FJPG``: uniform quantization step 4 + zlib). It stands in for
  libjpeg q≈90 — decoded pixels differ from the source by ≤ 2/channel,
  PSNR ≈ 47 dB, satisfying the "PSNR ≥ 40 dB for lossy" per-row
  invariant while keeping all Ray-side plumbing (schema, batch sizes,
  actor decode stage) real and tested. A real deployment swaps
  :func:`decode_image` / :func:`encode_fake_jpeg` for libjpeg-turbo
  bindings inside the same actor stage.

Also here: polyline rasterization (fixture generation), route-pixel
extraction (raster → geo points via the tile's bbox georeference),
average-hash (aHash) perceptual fingerprint, PSNR.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
FJPG_MAGIC = b"FJPG"
FJPG_QSTEP = 4  # uniform quantization step of the lossy stub codec

# Pure route-polyline color drawn into fixtures; survives FJPG
# quantization exactly (0 and 255 are lattice points of step 4 after
# clipping), so extraction is identical on lossless and lossy tiles.
ROUTE_RGB = (255, 0, 0)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) → PNG bytes (color type 2, filter 0 rows)."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, c = rgb.shape
    assert c == 3, "RGB only"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 (None) per row — deterministic output
    raw[:, 1:] = rgb.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    stride = w * bpp
    if not raw[:, 0].any():  # all filter-0 rows (our encoder's output)
        return np.ascontiguousarray(raw[:, 1:])
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ft = int(raw[r, 0])
        cur = raw[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r > 0 else np.zeros(stride, np.int32)
        if ft == 0:
            out[r] = cur.astype(np.uint8)
        elif ft == 2:  # Up
            out[r] = ((cur + prev) & 0xFF).astype(np.uint8)
        elif ft in (1, 3, 4):  # Sub / Average / Paeth need a left-scan
            line = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                if ft == 1:
                    line[i] = (cur[i] + a) & 0xFF
                elif ft == 3:
                    line[i] = (cur[i] + ((a + b) >> 1)) & 0xFF
                else:
                    cpx = prev[i - bpp] if i >= bpp else 0
                    p = a + b - cpx
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cpx)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cpx)
                    line[i] = (cur[i] + pred) & 0xFF
            out[r] = line.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter type {ft}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → RGB uint8 (h, w, 3). Supports 8-bit RGB/RGBA/gray,
    non-interlaced, filters 0–4."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, _, _, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    bpp = {0: 1, 2: 3, 6: 4}.get(ctype)
    if bpp is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    raw = raw.reshape(h, 1 + w * bpp)
    px = _unfilter(raw, h, w, bpp).reshape(h, w, bpp)
    if ctype == 0:
        px = np.repeat(px, 3, axis=2)
    elif ctype == 6:
        px = px[:, :, :3]
    return np.ascontiguousarray(px)


def encode_fake_jpeg(rgb: np.ndarray, qstep: int = FJPG_QSTEP) -> bytes:
    """STUB lossy codec standing in for libjpeg (see module docstring).

    Deterministic: quantize each channel to multiples of ``qstep``
    (max abs error qstep/2 → PSNR ≈ 47 dB at qstep=4), then zlib."""
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    q = ((rgb.astype(np.uint16) + qstep // 2) // qstep).astype(np.uint8)
    return (
        FJPG_MAGIC
        + struct.pack(">IIB", w, h, qstep)
        + zlib.compress(q.tobytes(), 6)
    )


def decode_fake_jpeg(data: bytes) -> np.ndarray:
    if data[:4] != FJPG_MAGIC:
        raise ValueError("not an FJPG payload")
    w, h, qstep = struct.unpack_from(">IIB", data, 4)
    q = np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8)
    px = np.clip(q.astype(np.uint16) * qstep, 0, 255).astype(np.uint8)
    return px.reshape(h, w, 3)


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic: PNG or the FJPG lossy stub → RGB uint8."""
    if data[:8] == PNG_SIG:
        return decode_png(data)
    if data[:4] == FJPG_MAGIC:
        return decode_fake_jpeg(data)
    raise ValueError("unknown image payload")


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def ahash64(rgb: np.ndarray) -> int:
    """64-bit average-hash: 8×8 block-mean grayscale, bit = above
    mean. Deterministic integer luma (299/587/114). Returns a SIGNED
    int64 (matches the table's ``phash: int64`` column)."""
    h, w, _ = rgb.shape
    gray = (
        rgb[:, :, 0].astype(np.uint32) * 299
        + rgb[:, :, 1].astype(np.uint32) * 587
        + rgb[:, :, 2].astype(np.uint32) * 114
    )
    bh, bw = h // 8, w // 8
    blocks = gray[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).sum(axis=(1, 3))
    mean = blocks.sum() / 64.0
    bits = (blocks.astype(np.float64) > mean).astype(np.uint64).ravel()
    val = np.uint64(0)
    for bit in bits:
        val = (val << np.uint64(1)) | bit
    return int(val.astype(np.int64))


def draw_polyline(
    rgb: np.ndarray,
    rows: np.ndarray,
    cols: np.ndarray,
    color: tuple[int, int, int] = ROUTE_RGB,
) -> None:
    """Rasterize a polyline in-place by dense per-segment sampling
    (deterministic; fixture generation only, not a hot-path kernel)."""
    h, w, _ = rgb.shape
    for i in range(len(rows) - 1):
        r0, c0, r1, c1 = rows[i], cols[i], rows[i + 1], cols[i + 1]
        n = int(max(abs(r1 - r0), abs(c1 - c0))) * 2 + 2
        rr = np.clip(np.round(np.linspace(r0, r1, n)).astype(np.int64), 0, h - 1)
        cc = np.clip(np.round(np.linspace(c0, c1, n)).astype(np.int64), 0, w - 1)
        rgb[rr, cc] = color


def extract_route_pixels(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Route-colored pixel coordinates (rows, cols) of a decoded tile."""
    mask = (
        (rgb[:, :, 0] == ROUTE_RGB[0])
        & (rgb[:, :, 1] == ROUTE_RGB[1])
        & (rgb[:, :, 2] == ROUTE_RGB[2])
    )
    rows, cols = np.nonzero(mask)
    return rows.astype(np.int64), cols.astype(np.int64)


def pixels_to_latlon(
    rows: np.ndarray,
    cols: np.ndarray,
    h: int,
    w: int,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Georeference pixel centers inside the tile's bbox: row 0 is the
    north edge; pixel centers at +0.5."""
    lat = lat_max - (rows.astype(np.float64) + 0.5) / h * (lat_max - lat_min)
    lon = lon_min + (cols.astype(np.float64) + 0.5) / w * (lon_max - lon_min)
    return lat, lon
