"""Deterministic toy image codec — the sandbox stand-in for PIL/libjpeg.

The container has no image libraries, so per the task contract the *decode*
step is a deterministic fake — but everything around it (magic-number
sniffing, claimed-vs-actual dimension checks, lossy-compression PSNR math,
perceptual hashing) is real computation with the same shapes and failure
modes as a real decoder:

- encodings carry the REAL magic numbers of png / jpeg / webp, so the
  ``fmt`` ↔ magic-bytes cross-field rule (SURVEY.md P9, graft of
  /root/reference/standard_ruleset.py:49-70 material↔term consistency) is a
  genuine byte-prefix check;
- "jpeg" is genuinely lossy (uniform quantization with step ``q``), so the
  PSNR≥40dB rule (north_star pixel check) exercises real signal math:
  PSNR of step-q quantization ≈ 10·log10(255²·12/q²) → q=4 ≈ 46.9dB (pass),
  q=24 ≈ 31dB (fail);
- decode failures (truncated payload, corrupt header, dim/payload mismatch)
  raise, exactly like a real decoder.

Swap :func:`decode` / :func:`encode` for PIL calls and the rest of the engine
is unchanged — the stage signature (bytes in, pixels + dims out) is the real
plumbing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..functions.hashing import stable_str_hash

MAGIC_PNG = b"\x89PNG\r\n\x1a\n"
MAGIC_JPEG = b"\xff\xd8\xff\xe0"
MAGIC_RIFF = b"RIFF"

FORMATS = ("jpeg", "png", "webp")
LOSSY_FORMATS = ("jpeg",)

# default jpeg quantization step: PSNR ≈ 46.9 dB (passes the ≥40dB rule)
DEFAULT_JPEG_STEP = 4
# seeded-violation step: PSNR ≈ 31 dB (fails the rule) — FIXTURES.md `pixel.psnr`
BAD_JPEG_STEP = 24


def sniff_format(buf: bytes | None) -> str | None:
    """Magic-number sniff → 'png' | 'jpeg' | 'webp' | None."""
    if not buf:
        return None
    if buf[:8] == MAGIC_PNG:
        return "png"
    if buf[:4] == MAGIC_JPEG:
        return "jpeg"
    if buf[:4] == MAGIC_RIFF and len(buf) >= 12 and buf[8:12] == b"WEBP":
        return "webp"
    return None


_GEN_CACHE: dict = {}


def _gen_consts(w: int, h: int):
    """Per-(w,h) constants of gen_pixels — the gradient and the coarse-block
    gather indices depend only on the dims, which repeat heavily across a
    table; caching them removes two linspace calls + the index arithmetic
    per image (identical values, measured ~10% of the decode-stage wall)."""
    key = (w, h)
    c = _GEN_CACHE.get(key)
    if c is None:
        gy = np.linspace(0, 255, h, dtype=np.float32)[:, None]
        gx = np.linspace(0, 255, w, dtype=np.float32)[None, :]
        grad = 0.3 * ((gy + gx) / 2.0)
        yi = np.arange(h) * 8 // h
        xi = np.arange(w) * 8 // w
        flat_idx = (yi[:, None] * 8 + xi[None, :]).ravel()
        grad.setflags(write=False)
        if len(_GEN_CACHE) > 4096:    # bound the cache (dims are few)
            _GEN_CACHE.clear()
        c = _GEN_CACHE[key] = (grad, flat_idx)
    return c


def gen_pixels(image_id: str, w: int, h: int, seed: int = 42) -> np.ndarray:
    """Deterministic (image_id, seed) → H×W×3 uint8 pixels.

    Gradient + a strong per-image coarse 8×8 random pattern + pixel noise: the
    coarse pattern dominates the 8×8 block means so perceptual hashes of
    distinct images are effectively unique (a pure gradient would make every
    image share one phash), while the noise keeps payloads realistically
    incompressible for the codec.
    """
    rng = np.random.default_rng((stable_str_hash(image_id) ^ seed) & 0xFFFFFFFFFFFFFFFF)
    grad3, flat_idx = _gen_consts(w, h)
    coarse = rng.integers(0, 256, size=(8, 8)).astype(np.float32)
    # base = 0.3*grad + 0.7*coarse[yi][:, xi], with the gather precomputed as
    # one flat take (bit-identical: same float32 ops in the same order)
    base = grad3 + (0.7 * coarse).take(flat_idx).reshape(h, w)
    noise = rng.integers(-40, 40, size=(h, w, 3), dtype=np.int16)
    tmp = base[:, :, None] + noise           # float32 (h, w, 3)
    np.clip(tmp, 0, 255, out=tmp)            # in place: skip one 12B/px temp
    return tmp.astype(np.uint8)


def encode(pixels: np.ndarray, fmt: str, jpeg_step: int = DEFAULT_JPEG_STEP) -> bytes:
    """Encode H×W×3 uint8 pixels into the toy container for ``fmt``."""
    h, w, c = pixels.shape
    assert c == 3
    if fmt == "png":
        payload = zlib.compress(pixels.tobytes(), 1)
        return MAGIC_PNG + struct.pack("<II", w, h) + payload
    if fmt == "jpeg":
        q = np.uint16(jpeg_step)
        quant = ((pixels.astype(np.uint16) // q) * q + q // 2).clip(0, 255).astype(np.uint8)
        payload = zlib.compress(quant.tobytes(), 1)
        return MAGIC_JPEG + struct.pack("<IIH", w, h, jpeg_step) + payload
    if fmt == "webp":
        payload = zlib.compress(pixels.tobytes(), 1)
        body = b"WEBP" + struct.pack("<II", w, h) + payload
        return MAGIC_RIFF + struct.pack("<I", len(body)) + body
    raise ValueError(f"unknown fmt {fmt!r}")


class DecodeError(ValueError):
    pass


def decode(buf: bytes) -> tuple[str, int, int, np.ndarray]:
    """Decode toy container → (fmt, w, h, pixels). Raises DecodeError on corrupt input."""
    fmt = sniff_format(buf)
    if fmt is None:
        raise DecodeError("unrecognized magic bytes")
    try:
        if fmt == "png":
            w, h = struct.unpack_from("<II", buf, 8)
            raw = zlib.decompress(buf[16:])
        elif fmt == "jpeg":
            w, h, _step = struct.unpack_from("<IIH", buf, 4)
            raw = zlib.decompress(buf[14:])
        else:  # webp
            w, h = struct.unpack_from("<II", buf, 12)
            raw = zlib.decompress(buf[20:])
    except (struct.error, zlib.error) as e:
        raise DecodeError(f"corrupt payload: {e}") from e
    if len(raw) != w * h * 3:
        raise DecodeError(f"payload size {len(raw)} != {w}x{h}x3")
    return fmt, int(w), int(h), np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 pixel arrays.

    Integer-difference math: the int16 diff + int32 square touch 6 bytes per
    pixel instead of the 16 the float64 path moved (this stage is memory-
    bandwidth-bound at full actor-pool concurrency); sums of squares of
    uint8 diffs are exact in float64, so the result is bit-identical."""
    if a.shape != b.shape:
        return 0.0
    d = a.astype(np.int16)
    d -= b
    d32 = d.astype(np.int32)
    d32 *= d32
    mse = np.mean(d32)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def phash64(pixels: np.ndarray) -> int:
    """64-bit average perceptual hash: grayscale → 8×8 block means → >median bits.

    Deterministic; near-identical pixels → identical hash (used by the
    near-duplicate groupby rule, SURVEY.md A5). Vectorized via nested
    ``reduceat`` (4× the per-row cost of the naive loop matters: this runs
    once per image in the decode stage's consistency check).
    """
    # same float64 sum-then-/3.0 np.mean performs, minus its wrapper
    gray = np.add.reduce(pixels, axis=2, dtype=np.float64)
    gray /= 3.0
    h, w = gray.shape
    if h >= 8 and w >= 8:
        ys, xs, counts = _phash_consts(w, h)
        blocks = np.add.reduceat(np.add.reduceat(gray, ys[:-1], axis=0),
                                 xs[:-1], axis=1) / counts
    else:  # degenerate tiny images: per-block loop with clamped windows
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        blocks = np.empty((8, 8), dtype=np.float64)
        for i in range(8):
            rows = gray[ys[i]: max(ys[i + 1], ys[i] + 1)]
            for j in range(8):
                blocks[i, j] = rows[:, xs[j]: max(xs[j + 1], xs[j] + 1)].mean()
    # median of the 64 block means without np.median's _ureduce ceremony
    # (~40% of this function's wall): partition to the two middle order
    # stats; (a + b) * 0.5 is exactly what np.median computes for even n
    flat = np.partition(blocks.reshape(64), (31, 32))
    med = (flat[31] + flat[32]) * 0.5
    bits = (blocks > med).ravel()
    v = int(np.frombuffer(np.packbits(bits).tobytes(), dtype=">u8")[0])
    return v - (1 << 64) if v >= (1 << 63) else v  # store as int64 column


_PHASH_CACHE: dict = {}


def _phash_consts(w: int, h: int):
    key = (w, h)
    c = _PHASH_CACHE.get(key)
    if c is None:
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        counts = np.diff(ys)[:, None] * np.diff(xs)[None, :]
        if len(_PHASH_CACHE) > 4096:
            _PHASH_CACHE.clear()
        c = _PHASH_CACHE[key] = (ys, xs, counts)
    return c
