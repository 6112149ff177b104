"""Multimodal span stages: decode / feature-extract / resize / frame-sample.

Image/audio/video payloads ride as opaque binary via `media_ref` spans with
typed metadata.  The codecs are NOT available in this environment, so the
decode step is stubbed behind NotImplementedError with a deterministic fake
(`mask://` / `aud://` / `vid://` schemes) — the Ray-side plumbing (actor
pools, schemas, batch sizing for large binaries) is real and tested.

Batch-size note for 100 TB: binary payload stages must run with SMALL
batch_size (payload bytes x batch_size x concurrency must fit the worker
heap) and `batch_format="pyarrow"` so binaries never degrade to Python
object columns.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa


def _fake_payload(media_ref: str, n: int) -> np.ndarray:
    rng = np.random.default_rng(zlib.crc32(media_ref.encode("utf-8")))
    return rng.integers(0, 256, size=n, dtype=np.uint8)


def decode_media(media_ref: str) -> tuple[str, np.ndarray]:
    """-> (modality, payload array). Deterministic fake for test schemes;
    NotImplementedError for real formats (no codecs in this container)."""
    if media_ref.startswith("mask://") or media_ref.startswith("img://"):
        return "image", _fake_payload(media_ref, 32 * 32).reshape(32, 32)
    if media_ref.startswith("aud://"):
        return "audio", _fake_payload(media_ref, 16000)
    if media_ref.startswith("vid://"):
        return "video", _fake_payload(media_ref, 8 * 16 * 16).reshape(8, 16, 16)
    raise NotImplementedError(f"no codec for {media_ref!r} in this environment")


class MediaFeatures:
    """Actor-pool stage: media spans -> per-media feature rows.

    __init__ is where a real deployment loads models/codecs (once per
    actor); __call__ handles a batch of documents.
    """

    def __init__(self, image_size: int = 16, frame_stride: int = 2):
        self.image_size = image_size
        self.frame_stride = frame_stride

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape
        s = self.image_size
        ys = (np.arange(s) * h // s).clip(0, h - 1)
        xs = (np.arange(s) * w // s).clip(0, w - 1)
        return img[np.ix_(ys, xs)]

    def __call__(self, t: pa.Table) -> pa.Table:
        spans_col = t["spans"].combine_chunks()
        doc_ids = t["doc_id"].to_pylist()
        out = {"doc_id": [], "media_ref": [], "modality": [], "n_frames": [], "mean_x1000": [], "std_x1000": []}
        for i, doc in enumerate(spans_col.to_pylist()):
            for s in doc or []:
                if s["kind"] != "media" or not s["media_ref"]:
                    continue
                try:
                    modality, payload = decode_media(s["media_ref"])
                except NotImplementedError:
                    continue
                if modality == "image":
                    payload = self._resize(payload)
                    frames = 1
                elif modality == "video":
                    payload = payload[:: self.frame_stride]  # frame-sample
                    frames = payload.shape[0]
                else:
                    frames = 1
                out["doc_id"].append(doc_ids[i])
                out["media_ref"].append(s["media_ref"])
                out["modality"].append(modality)
                out["n_frames"].append(frames)
                out["mean_x1000"].append(int(round(float(payload.mean()) * 1000)))
                out["std_x1000"].append(int(round(float(payload.std()) * 1000)))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "media_ref": pa.array(out["media_ref"], pa.string()),
                "modality": pa.array(out["modality"], pa.string()),
                "n_frames": pa.array(out["n_frames"], pa.int64()),
                "mean_x1000": pa.array(out["mean_x1000"], pa.int64()),
                "std_x1000": pa.array(out["std_x1000"], pa.int64()),
            }
        )


def media_features(docs_ds, batch_size: int = 256, concurrency=(1, 4)):
    return docs_ds.map_batches(
        MediaFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
