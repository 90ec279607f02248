"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (this container has no
image/audio codecs): :class:`DecodeStage` parses a deterministic fake
header and raises ``NotImplementedError`` for real formats, so the
Ray-side plumbing — schema, batch sizing, actor signature, output layout —
is real and tested while the codec slot is an explicit seam.

Batch-size guidance baked into the helpers: binary payloads make rows
heavy, so these stages default to small ``batch_size`` (64) — size
``batch_size × concurrency × payload`` to the worker heap, and let the
object store spill (SURVEY.md §4).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("asset_id", pa.string()),
    ("mime", pa.string()),
    ("payload", pa.binary()),
])

_MAGIC = b"FAKEMEDIA1"


def synth_media_batch(asset_ids: list[str], mimes: list[str],
                      seed: int = 42) -> pa.Table:
    """Deterministic fake payloads: 10-byte magic + u16 width + u16 height
    + body.  Stands in for real image bytes end-to-end."""
    payloads = []
    for aid in asset_ids:
        # crc32, not builtin hash(): hash() is randomized per process
        # (PYTHONHASHSEED), which would break the determinism contract.
        rng = np.random.default_rng((seed, zlib.crc32(aid.encode())))
        w, h = int(rng.integers(16, 512)), int(rng.integers(16, 512))
        body = rng.integers(0, 256, int(rng.integers(64, 1024)),
                            dtype=np.uint8).tobytes()
        payloads.append(_MAGIC + w.to_bytes(2, "big") + h.to_bytes(2, "big")
                        + body)
    return pa.Table.from_arrays(
        [pa.array(asset_ids, pa.string()), pa.array(mimes, pa.string()),
         pa.array(payloads, pa.binary())],
        schema=MEDIA_SCHEMA)


class DecodeStage:
    """binary payload → (width, height, n_bytes, ok).

    Real codec decode would replace :meth:`_decode`; anything that is not
    the deterministic fake format raises ``NotImplementedError`` —
    explicitly stubbed per the environment constraints (no image/audio
    libs in this container)."""

    def __init__(self, strict: bool = True):
        self.strict = strict

    def _decode(self, payload: bytes) -> tuple[int, int]:
        if payload[:len(_MAGIC)] == _MAGIC:
            w = int.from_bytes(payload[10:12], "big")
            h = int.from_bytes(payload[12:14], "big")
            return w, h
        raise NotImplementedError(
            "real image/audio decoding is stubbed in this environment; "
            "plug a codec (PIL / torchaudio / pyav) into DecodeStage._decode")

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, sizes, oks = [], [], [], []
        for payload in batch.column("payload").to_pylist():
            try:
                w, h = self._decode(payload)
                widths.append(w)
                heights.append(h)
                oks.append(True)
            except NotImplementedError:
                if self.strict:
                    raise
                widths.append(0)
                heights.append(0)
                oks.append(False)
            sizes.append(len(payload))
        return pa.Table.from_arrays(
            [batch.column("asset_id"), batch.column("mime"),
             pa.array(widths, pa.int32()), pa.array(heights, pa.int32()),
             pa.array(sizes, pa.int64()), pa.array(oks, pa.bool_())],
            names=["asset_id", "mime", "width", "height", "n_bytes", "ok"])


class FeatureStage:
    """payload → fixed-dim feature vector.

    A real model (CLIP etc.) would load in ``__init__`` (once per actor)
    and batch-infer in ``__call__``; the deterministic fake hashes payload
    bytes into the vector so downstream similarity plumbing is testable."""

    def __init__(self, dim: int = 32):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("payload").to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8)
            vec = np.zeros(self.dim, dtype=np.float32)
            np.add.at(vec, np.arange(len(arr)) % self.dim,
                      arr.astype(np.float32))
            n = np.linalg.norm(vec)
            feats.append((vec / n if n else vec).tolist())
        return pa.Table.from_arrays(
            [batch.column("asset_id"),
             pa.array(feats, pa.list_(pa.float32()))],
            names=["asset_id", "feature"])


def decode_media(ds, *, strict: bool = True, batch_size: int = 64,
                 concurrency=(1, 4)):
    return ds.map_batches(DecodeStage,
                          fn_constructor_kwargs={"strict": strict},
                          batch_size=batch_size, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=concurrency)


def extract_features(ds, *, dim: int = 32, batch_size: int = 64,
                     concurrency=(1, 4)):
    return ds.map_batches(FeatureStage, fn_constructor_kwargs={"dim": dim},
                          batch_size=batch_size, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=concurrency)


class ResizeStage:
    """payload → payload with target dimensions (image resize analog).

    The fake format resize rewrites the header dims and scales the body
    length proportionally (deterministic); a real implementation slots a
    codec into the same 1-row-in → 1-row-out shape.  ``strict`` matches
    :class:`DecodeStage`."""

    def __init__(self, width: int, height: int, strict: bool = True):
        self.w = width
        self.h = height
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch.column("payload").to_pylist():
            if payload[:len(_MAGIC)] != _MAGIC:
                if self.strict:
                    raise NotImplementedError(
                        "real image resize is stubbed in this environment; "
                        "plug a codec into ResizeStage")
                out.append(payload)
                continue
            w0 = int.from_bytes(payload[10:12], "big")
            h0 = int.from_bytes(payload[12:14], "big")
            body = payload[14:]
            scale = (self.w * self.h) / max(w0 * h0, 1)
            n = max(1, min(len(body), int(len(body) * scale)))
            out.append(_MAGIC + self.w.to_bytes(2, "big")
                       + self.h.to_bytes(2, "big") + body[:n])
        return batch.set_column(
            batch.schema.get_field_index("payload"), "payload",
            pa.array(out, pa.binary()))


FRAME_SCHEMA = pa.schema([
    ("asset_id", pa.string()),
    ("frame_index", pa.int32()),
    ("frame", pa.binary()),
])

_FRAME_BYTES = 64


class FrameSampleStage:
    """video payload → every ``stride``-th frame as its OWN output row —
    the 1-row-in → N-rows-out fan-out shape (video decoding's dominant
    pattern).  Output rows are small and uniform, so downstream stages
    re-batch naturally; Ray Data handles the row-count change because
    map_batches output length is free.

    Fake format: the body is treated as concatenated fixed-size frames;
    a real implementation slots pyav into the same stage."""

    def __init__(self, stride: int = 2, strict: bool = True):
        assert stride >= 1
        self.stride = stride
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for aid, payload in zip(batch.column("asset_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            if payload[:len(_MAGIC)] != _MAGIC:
                if self.strict:
                    raise NotImplementedError(
                        "real video frame extraction is stubbed in this "
                        "environment; plug pyav into FrameSampleStage")
                continue
            body = payload[14:]
            n_frames = len(body) // _FRAME_BYTES
            for j in range(0, n_frames, self.stride):
                ids.append(aid)
                idxs.append(j)
                frames.append(body[j * _FRAME_BYTES:(j + 1) * _FRAME_BYTES])
        return pa.Table.from_arrays(
            [pa.array(ids, pa.string()), pa.array(idxs, pa.int32()),
             pa.array(frames, pa.binary())], schema=FRAME_SCHEMA)


def resize_media(ds, *, width: int, height: int, strict: bool = True,
                 batch_size: int = 64, concurrency=(1, 4)):
    return ds.map_batches(ResizeStage,
                          fn_constructor_kwargs={"width": width,
                                                 "height": height,
                                                 "strict": strict},
                          batch_size=batch_size, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=concurrency)


def sample_frames(ds, *, stride: int = 2, strict: bool = True,
                  batch_size: int = 64, concurrency=(1, 4)):
    return ds.map_batches(FrameSampleStage,
                          fn_constructor_kwargs={"stride": stride,
                                                 "strict": strict},
                          batch_size=batch_size, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=concurrency)
