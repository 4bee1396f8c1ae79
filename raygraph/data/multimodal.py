"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as Arrow ``binary`` columns with
metadata columns alongside.  The decode kernels (PIL/ffmpeg/soundfile) are
NOT available in this environment, so the decode step is stubbed behind a
deterministic fake — the Ray-side plumbing (actor-pool stage, schema,
batch sizing for wide rows) is real and tested.

At scale: binary rows are wide, so these stages run with small
``batch_size`` and ``batch_format="pyarrow"`` (binary columns do not
round-trip pandas object dtype safely).
"""

from __future__ import annotations

import hashlib

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


class ImageDecodeStage:
    """Actor-pool stage: binary image payload → (dims, feature vector).

    Real implementation would do ``PIL.Image.open`` + resize + model
    inference in ``__call__`` with the model loaded in ``__init__``.
    Here: raises unless ``fake=True``, in which case a deterministic
    payload-hash-derived fake decode runs (keeps the pipeline testable).
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "item_id",
                 feature_dim: int = 8, fake: bool = False):
        self.payload_col = payload_col
        self.id_col = id_col
        self.dim = feature_dim
        self.fake = fake
        if not fake:
            raise NotImplementedError(
                "image decode requires PIL/turbojpeg, not present in this "
                "environment; construct with fake=True for the deterministic stub"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        payloads = batch.column(self.payload_col)
        widths, heights, feats = [], [], []
        for p in payloads:
            b = p.as_py() or b""
            h = hashlib.sha256(b).digest()
            widths.append(int.from_bytes(h[0:2], "little") % 1920 + 1)
            heights.append(int.from_bytes(h[2:4], "little") % 1080 + 1)
            feats.append(
                (np.frombuffer(h[: self.dim * 4], dtype=np.uint32)
                 .astype(np.float32) / np.float32(2**32)).tolist()
            )
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "channels": pa.array([3] * len(widths), pa.int32()),
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
