"""Multimodal (image/audio/video) actor-pool stages.

Media payloads are opaque ``binary`` columns with typed metadata; the
decode/feature kernels are STUBBED (no image/audio libraries exist in
this environment) behind deterministic fakes — the Ray-side plumbing
(actor ``__init__`` setup, batch signature, schema, output layout) is
real and tested, so swapping in a real decoder is a one-function change.

Usage (actor pool — setup once per actor, work per batch):

    ds.map_batches(MediaFeatureExtractor, concurrency=8, batch_size=64,
                   num_cpus=1, batch_format="pyarrow")
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _decode_media(payload: np.ndarray, kind: np.ndarray) -> np.ndarray:
    """STUB decoder: a real build wires PIL/ffmpeg here. The deterministic
    fake hashes the payload bytes into a fixed-length feature so pipelines
    and tests exercise real data flow. Raises for unknown kinds exactly as
    a real decoder would."""
    out = np.zeros((payload.shape[0], 8), dtype=np.float32)
    for i, (buf, k) in enumerate(zip(payload, kind)):
        if k not in ("image", "audio", "video"):
            raise NotImplementedError(f"no decoder for media kind {k!r}")
        h = np.frombuffer(
            buf[:64].ljust(64, b"\0") if buf else b"\0" * 64, dtype=np.uint8
        ).astype(np.float32)
        out[i] = h.reshape(8, 8).mean(axis=1) / 255.0
    return out


class MediaFeatureExtractor:
    """Actor-pool stage: media binary column → fixed-width feature vector.

    Heavy setup (model load in a real deployment) happens ONCE per actor
    in ``__init__`` — the distributed analog of the reference building its
    tree once then serving many queries."""

    def __init__(self, payload_col: str = "payload", kind_col: str = "kind"):
        self.payload_col = payload_col
        self.kind_col = kind_col
        # placeholder for model/codec initialisation (once per actor)
        self._feature_dim = 8

    def __call__(self, tbl: pa.Table) -> pa.Table:
        payload = np.array(
            [b if b is not None else b"" for b in tbl.column(self.payload_col).to_pylist()],
            dtype=object,
        )
        kind = np.array(tbl.column(self.kind_col).to_pylist())
        feats = _decode_media(payload, kind)
        return tbl.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float32()), self._feature_dim
            ),
        )


class FrameSampler:
    """Actor-pool stage: sample every k-th 'frame' (64-byte window) of a
    video payload into a list column — stub with real plumbing."""

    def __init__(self, every: int = 4, payload_col: str = "payload"):
        self.every = every
        self.payload_col = payload_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        frames = []
        for buf in tbl.column(self.payload_col).to_pylist():
            buf = buf or b""
            chunks = [buf[i : i + 64] for i in range(0, len(buf), 64)]
            frames.append(chunks[:: self.every])
        return tbl.append_column(
            "frames", pa.array(frames, type=pa.list_(pa.binary()))
        )
