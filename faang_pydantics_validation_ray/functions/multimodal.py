"""Multimodal column stages: opaque ``binary`` payloads + typed metadata,
processed by actor-pool ``map_batches`` stages (task brief "multimodal").

The container has no PIL/ffmpeg — per the task contract the external-lib
decode paths are STUBBED behind try-imports with clearly-marked
``NotImplementedError``; the Ray-side plumbing (schema, batch size, actor
signature, output layout) is REAL and uses the in-repo deterministic codec
for images, so the stages run and are tested end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..imagetable import codec


class ImageFeatures:
    """Actor-pool stage: decode `bytes` → per-image features (decoded dims,
    mean RGB, luma std). Swap `codec.decode` for PIL in a real deployment —
    the signature is the real plumbing."""

    def __init__(self, use_external_libs: bool = False):
        if use_external_libs:
            try:
                import PIL  # noqa: F401
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "PIL not available in this container; stage runs with the "
                    "deterministic in-repo codec instead") from e
        self.decode = codec.decode

    def __call__(self, t: pa.Table) -> pa.Table:
        # zero-copy memoryview slices over the Arrow data buffer (shared
        # with stages/decode.py) — to_pylist() copied every payload
        from ..stages.decode import _binary_views
        bufs = _binary_views(t.column("bytes"))
        n = len(bufs)
        ok = np.zeros(n, dtype=bool)
        wd = np.zeros(n, dtype=np.int32)
        hd = np.zeros(n, dtype=np.int32)
        mean_rgb = np.zeros((n, 3), dtype=np.float32)
        luma_std = np.zeros(n, dtype=np.float32)
        for i, buf in enumerate(bufs):
            if buf is None:
                continue
            try:
                _, w, h, px = self.decode(buf)
            except codec.DecodeError:
                continue
            ok[i] = True
            wd[i], hd[i] = w, h
            mean_rgb[i] = px.mean(axis=(0, 1))
            luma_std[i] = px.mean(axis=2).std()
        keep = [c for c in t.column_names if c != "bytes"]  # drop payload early
        out = t.select(keep)
        out = out.append_column("decode_ok", pa.array(ok))
        out = out.append_column("decoded_w", pa.array(wd))
        out = out.append_column("decoded_h", pa.array(hd))
        out = out.append_column("mean_rgb", pa.array(
            list(mean_rgb), type=pa.list_(pa.float32(), 3)))
        out = out.append_column("luma_std", pa.array(luma_std))
        return out


class ResizeImages:
    """Actor-pool stage: decode → nearest-neighbor resize → re-encode.
    Real resampling math on the deterministic codec's pixels."""

    def __init__(self, target: tuple[int, int] = (16, 16), fmt: str = "png"):
        self.tw, self.th = target
        self.fmt = fmt

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..stages.decode import _binary_views
        bufs = _binary_views(t.column("bytes"))
        out_bufs: list[bytes | None] = []
        for buf in bufs:
            if buf is None:
                out_bufs.append(None)
                continue
            try:
                _, w, h, px = codec.decode(buf)
            except codec.DecodeError:
                out_bufs.append(None)
                continue
            yi = (np.arange(self.th) * h) // self.th
            xi = (np.arange(self.tw) * w) // self.tw
            out_bufs.append(codec.encode(px[yi][:, xi], self.fmt))
        idx = t.column_names.index("bytes")
        return t.set_column(idx, "bytes", pa.array(out_bufs, type=pa.binary()))


VIDEO_MAGIC = b"FPVV"


def encode_fake_video(frames: list[np.ndarray], fmt: str = "png") -> bytes:
    """Deterministic in-repo video container: magic + frame count + length-
    prefixed codec-encoded frames. Stands in for mp4 until ffmpeg exists;
    the flat-buffer layout mirrors how a real demuxer walks packets."""
    parts = [VIDEO_MAGIC, np.uint32(len(frames)).tobytes()]
    for px in frames:
        enc = codec.encode(px, fmt)
        parts.append(np.uint32(len(enc)).tobytes())
        parts.append(enc)
    return b"".join(parts)


class VideoFrameSample:
    """Actor-pool stage: demux the in-repo video container, decode every
    ``step``-th frame, emit one row per sampled frame (flat_map-shaped
    output: a batch of videos becomes a longer batch of frames). Swap the
    demux/decode pair for PyAV/ffmpeg in a real deployment — schema, actor
    signature and per-frame fan-out are the real plumbing."""

    def __init__(self, step: int = 2, id_col: str = "video_id",
                 use_external_libs: bool = False):
        if use_external_libs:
            try:
                import av  # noqa: F401
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "PyAV/ffmpeg not available in this container; stage runs "
                    "with the deterministic in-repo container instead") from e
        self.step = max(1, step)
        self.id_col = id_col

    OUTPUT_FIELDS = [("frame_idx", pa.int32()), ("w", pa.int32()),
                     ("h", pa.int32()), ("mean_luma", pa.float32())]

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..stages.decode import _binary_views
        ids, fidx, ws, hs, luma = [], [], [], [], []
        for vid, buf in zip(t.column(self.id_col).to_pylist(),
                            _binary_views(t.column("bytes"))):
            if buf is None or len(buf) < 8 or buf[:4] != VIDEO_MAGIC:
                continue
            n = int(np.frombuffer(buf[4:8], dtype=np.uint32)[0])
            off = 8
            for i in range(n):
                if off + 4 > len(buf):
                    break  # truncated container: keep frames demuxed so far
                ln = int(np.frombuffer(buf[off:off + 4], dtype=np.uint32)[0])
                off += 4
                if off + ln > len(buf):
                    break
                if i % self.step == 0:
                    try:
                        _, w, h, px = codec.decode(buf[off:off + ln])
                    except codec.DecodeError:
                        off += ln
                        continue
                    ids.append(vid)
                    fidx.append(i)
                    ws.append(w)
                    hs.append(h)
                    luma.append(float(px.mean(axis=2).mean()))
                off += ln
        return pa.table({
            self.id_col: pa.array(ids, type=pa.string()),
            "frame_idx": pa.array(fidx, type=pa.int32()),
            "w": pa.array(ws, type=pa.int32()),
            "h": pa.array(hs, type=pa.int32()),
            "mean_luma": pa.array(luma, type=pa.float32())})


class AudioFrameSample:
    """STUB (no audio libs in container): real actor signature + output
    schema for an audio frame-sampling stage; raises on use unless given a
    deterministic fake decoder.

    ``fake_decoder`` receives each payload as a buffer-protocol object
    (a zero-copy memoryview slice of the Arrow binary column, NOT bytes) —
    wrap with ``bytes(buf)`` inside the decoder if a real codec needs an
    owned bytes object."""

    OUTPUT_SCHEMA = pa.schema([
        ("clip_id", pa.string()), ("frame_idx", pa.int32()),
        ("pcm_mean", pa.float32()),
    ])

    def __init__(self, fake_decoder=None):
        if fake_decoder is None:
            raise NotImplementedError(
                "audio decoding requires external libs not present in this "
                "container; pass fake_decoder for tests")
        self.decoder = fake_decoder

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..stages.decode import _binary_views
        rows = {"clip_id": [], "frame_idx": [], "pcm_mean": []}
        for cid, buf in zip(t.column(0).to_pylist(),
                            _binary_views(t.column("bytes"))):
            for i, frame in enumerate(self.decoder(buf)):
                rows["clip_id"].append(str(cid))
                rows["frame_idx"].append(i)
                rows["pcm_mean"].append(float(np.mean(frame)))
        return pa.table(rows, schema=self.OUTPUT_SCHEMA)
