"""Unit tests for the deterministic toy codec (no Ray needed)."""

import numpy as np
import pytest

from faang_pydantics_validation_ray.imagetable import codec, datagen


def test_roundtrip_lossless():
    px = codec.gen_pixels("IMG_000000000001", 32, 24)
    for fmt in ("png", "webp"):
        fmt2, w, h, out = codec.decode(codec.encode(px, fmt))
        assert (fmt2, w, h) == (fmt, 32, 24)
        assert np.array_equal(out, px)


def test_jpeg_lossy_psnr():
    px = codec.gen_pixels("IMG_000000000002", 48, 48)
    _, _, _, good = codec.decode(codec.encode(px, "jpeg", jpeg_step=codec.DEFAULT_JPEG_STEP))
    _, _, _, bad = codec.decode(codec.encode(px, "jpeg", jpeg_step=codec.BAD_JPEG_STEP))
    assert codec.psnr(px, good) >= 40.0
    assert codec.psnr(px, bad) < 40.0


def test_sniff_and_corrupt():
    px = codec.gen_pixels("IMG_000000000003", 16, 16)
    assert codec.sniff_format(codec.encode(px, "png")) == "png"
    assert codec.sniff_format(codec.encode(px, "jpeg")) == "jpeg"
    assert codec.sniff_format(codec.encode(px, "webp")) == "webp"
    assert codec.sniff_format(b"GIF89a") is None
    assert codec.sniff_format(None) is None
    with pytest.raises(codec.DecodeError):
        codec.decode(codec.encode(px, "png")[:20])


def test_phash_deterministic_and_distinct():
    a = codec.gen_pixels("IMG_000000000010", 32, 32)
    b = codec.gen_pixels("IMG_000000000011", 32, 32)
    assert codec.phash64(a) == codec.phash64(a)
    assert codec.phash64(a) != codec.phash64(b)


def test_datagen_deterministic():
    t1 = datagen.generate_chunk(0, 50, 2000, 42, 4)
    t2 = datagen.generate_chunk(0, 50, 2000, 42, 4)
    assert t1.equals(t2)
    assert t1.schema.equals(datagen.IMAGE_SCHEMA)


def test_datagen_buckets():
    n = 2000
    t = datagen.generate_chunk(0, n, n, 42, 4)
    d = t.to_pydict()
    assert d["image_id"][datagen.B_ID_NULL] is None
    assert d["bytes"][datagen.B_BYTES_NULL] is None
    assert d["fmt"][datagen.B_FMT_BAD] == "bmp"
    assert d["fmt"][datagen.B_FMT_CASE] == " JPEG "
    assert d["image_id"][datagen.B_ID_PATTERN].startswith("img-badid-")
    assert d["w"][datagen.B_W_ZERO] == 0
    assert d["h"][datagen.B_H_NEG] == -3
    assert d["w"][datagen.B_TOO_BIG] * d["h"][datagen.B_TOO_BIG] > datagen.MAX_PIXELS
    assert codec.sniff_format(d["bytes"][datagen.B_MAGIC]) == "png"
    assert d["fmt"][datagen.B_MAGIC] == "jpeg"
    assert d["image_id"][datagen.B_DUP_PREV] == d["image_id"][datagen.B_DUP_PREV - 1]
    assert d["image_id"][datagen.B_DUP_HOT] == datagen.HOT_DUP_ID
    assert d["phash"][datagen.B_NEARDUP_A] == datagen.NEARDUP_CLUSTER_PHASH
    assert d["caption"][datagen.B_CAP_NULL] is None
    assert d["phash"][datagen.B_PHASH_NULL] is None
    assert d["fmt"][datagen.B_SENT_WARN] == "restricted access"
    assert d["fmt"][datagen.B_SENT_ERR] == "not collected"
    # hot phash bucket ~4.8% of rows
    hot = sum(1 for p in d["phash"] if p == datagen.HOT_PHASH)
    assert 60 <= hot <= 120


def test_captions_orphans():
    cap = datagen.captions_table(1000, 42, 2)
    orph = [i for i in cap["image_id"].to_pylist() if i.startswith("IMG_MISSING_")]
    assert len(orph) == 2  # j=77, 577


def test_expected_violations_smoke():
    exp = datagen.expected_violations(2000, 42, 4)
    rules = {r for r, _, _ in exp}
    assert "required.image_id" in rules and "unique.image_id" in rules
    assert "neardup.phash" in rules and "ref.caption_image" in rules
    assert "pixel.psnr" in rules and "sentinel.fmt" in rules
