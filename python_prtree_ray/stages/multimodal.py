"""Multimodal (image/audio/video) actor-pool stages.

Media payloads are opaque ``binary`` columns with typed metadata; the
decode/feature kernels are STUBBED (no image/audio libraries exist in
this environment) behind deterministic fakes — the Ray-side plumbing
(actor ``__init__`` setup, batch signature, schema, output layout) is
real and tested, so swapping in a real decoder is a one-function change.
Both stages are fully vectorized over the Arrow binary buffers (offsets
arithmetic + one gather) — no per-row Python loops.

Usage (actor pool — setup once per actor, work per batch):

    ds.map_batches(MediaFeatureExtractor, concurrency=8, batch_size=64,
                   num_cpus=1, batch_format="pyarrow")
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _binary_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets[int64, n+1], flat data[uint8]) of a binary/large_binary
    array, slice-offset corrected. Nulls read as empty."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = arr.fill_null(b"")
    off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    # large_binary/large_string carry 64-bit offsets — reading them as
    # int32 would silently garble every length
    off_dtype = (
        np.int64
        if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type)
        else np.int32
    )
    offs = np.frombuffer(off_buf, dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, np.uint8)
    )
    return offs, data


def _prefix_matrix(arr: pa.Array, nbytes: int) -> np.ndarray:
    """(n, nbytes) uint8 matrix of each value's first ``nbytes`` bytes,
    zero-padded — one vectorized gather, no per-row loop."""
    offs, data = _binary_parts(arr)
    n = len(offs) - 1
    lens = np.minimum(np.diff(offs), nbytes)
    out = np.zeros((n, nbytes), dtype=np.uint8)
    if lens.sum():
        row = np.repeat(np.arange(n), lens)
        col = np.arange(lens.sum()) - np.repeat(np.cumsum(lens) - lens, lens)
        out[row, col] = data[np.repeat(offs[:-1], lens) + col]
    return out


def decode_image(buf: bytes) -> "np.ndarray | None":
    """Pure-NumPy image decode for the two formats parseable without any
    media library: binary PPM (P6) and uncompressed 24/32-bit BMP.
    Returns an (h, w, 3) uint8 RGB array, or ``None`` when the payload
    is not one of these formats (caller falls back to the deterministic
    stub). Malformed headers raise ``ValueError`` like a real decoder.
    """
    if len(buf) >= 2 and buf[:2] == b"P6":
        # P6 <ws> width <ws> height <ws> maxval <single-ws> raster
        # ('#' comments allowed in the header per the netpbm spec)
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(buf) and buf[pos : pos + 1].isspace():
                pos += 1
            if pos < len(buf) and buf[pos : pos + 1] == b"#":
                while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(buf) and not buf[pos : pos + 1].isspace():
                pos += 1
            if start == pos:
                raise ValueError("truncated PPM header")
            fields.append(int(buf[start:pos]))
        pos += 1  # exactly one whitespace byte before the raster
        w, h, maxval = fields
        if maxval != 255:
            raise ValueError(f"unsupported PPM maxval {maxval}")
        need = w * h * 3
        if len(buf) - pos < need:
            raise ValueError("truncated PPM raster")
        return (
            np.frombuffer(buf, np.uint8, count=need, offset=pos)
            .reshape(h, w, 3)
            .copy()
        )
    if len(buf) >= 54 and buf[:2] == b"BM":
        data_off = int.from_bytes(buf[10:14], "little")
        hdr_size = int.from_bytes(buf[14:18], "little")
        if hdr_size < 40:
            raise ValueError(f"unsupported BMP header size {hdr_size}")
        w = int.from_bytes(buf[18:22], "little", signed=True)
        h = int.from_bytes(buf[22:26], "little", signed=True)
        bpp = int.from_bytes(buf[28:30], "little")
        compression = int.from_bytes(buf[30:34], "little")
        if compression != 0 or bpp not in (24, 32):
            raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        nb = bpp // 8
        stride = (w * nb + 3) & ~3  # rows padded to 4 bytes
        if len(buf) - data_off < stride * h:
            raise ValueError("truncated BMP raster")
        rows = np.frombuffer(
            buf, np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)
        px = rows[:, : w * nb].reshape(h, w, nb)
        rgb = px[:, :, [2, 1, 0]]  # stored BGR(A)
        return (rgb[::-1] if flip else rgb).copy()
    return None


def _image_features(img: np.ndarray, dim: int = 8) -> np.ndarray:
    """Fixed-width feature of a decoded RGB image: mean gray level of
    ``dim`` horizontal bands, scaled to [0, 1] — the stand-in for a real
    embedding model, applied to REAL pixels."""
    gray = img.astype(np.float32).mean(axis=2)
    h = gray.shape[0]
    bands = np.array_split(gray, dim, axis=0) if h >= dim else None
    if bands is None:
        # fewer rows than bands: repeat rows up to dim
        gray = np.repeat(gray, -(-dim // h), axis=0)[:dim]
        bands = np.array_split(gray, dim, axis=0)
    return np.array([b.mean() for b in bands], np.float32) / 255.0


def _decode_media(payload: pa.Array, kind: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """Decoder swap point. Real decode path: PPM (P6) / uncompressed BMP
    image payloads parse to actual pixels (``decode_image``) and feature
    via ``_image_features``. Everything else falls back to the
    deterministic stub (fold the first 64 payload bytes) so synthetic
    corpora keep exercising the full data flow — a real build swaps the
    stub for PIL/ffmpeg without touching the Ray plumbing. Raises for
    unknown kinds exactly as a real decoder would. The kind check is an
    Arrow ``is_in`` kernel — no Python-object materialization of the
    string column."""
    import pyarrow.compute as pc

    ok = pc.fill_null(
        pc.is_in(kind, value_set=pa.array(["image", "audio", "video"])), False
    )
    if len(kind) and not pc.min(ok).as_py():
        first_bad = pc.filter(kind, pc.invert(pc.fill_null(ok, False)))[0].as_py()
        raise NotImplementedError(f"no decoder for media kind {first_bad!r}")
    mat = _prefix_matrix(payload, 64).astype(np.float32)
    feats = mat.reshape(-1, 8, 8).mean(axis=2) / 255.0
    # rows with a decodable magic number get REAL pixel features; the
    # magic probe is vectorized, only genuine images pay decode cost
    magic = _prefix_matrix(payload, 2)
    decodable = np.flatnonzero(
        ((magic[:, 0] == 0x50) & (magic[:, 1] == 0x36))  # P6
        | ((magic[:, 0] == 0x42) & (magic[:, 1] == 0x4D))  # BM
    )
    if decodable.size:
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        for i in decodable:
            img = decode_image(payload[int(i)].as_py())
            if img is not None:
                feats[int(i)] = _image_features(img, 8)
    return feats


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
        feats = _decode_media(
            tbl.column(self.payload_col), tbl.column(self.kind_col)
        )
        return tbl.append_column(
            "features",
            pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float32()), self._feature_dim
            ),
        )


FRAME_BYTES = 64


class FrameSampler:
    """Actor-pool stage: sample every k-th 'frame' (64-byte window) of a
    video payload into a list<binary> column — stub decode, real
    plumbing, fully vectorized (offset arithmetic + one gather)."""

    def __init__(self, every: int = 4, payload_col: str = "payload"):
        self.every = every
        self.payload_col = payload_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        offs, data = _binary_parts(tbl.column(self.payload_col))
        n = len(offs) - 1
        lens = np.diff(offs)
        n_chunks = -(-lens // FRAME_BYTES)  # ceil
        n_sampled = -(-n_chunks // self.every)
        total = int(n_sampled.sum())
        # j-th sampled frame of row i starts at offs[i] + FRAME*every*j
        row = np.repeat(np.arange(n), n_sampled)
        j = np.arange(total) - np.repeat(np.cumsum(n_sampled) - n_sampled, n_sampled)
        fstart = offs[:-1][row] + FRAME_BYTES * self.every * j
        flen = np.minimum(FRAME_BYTES, offs[1:][row] - fstart)
        fdata_total = int(flen.sum())
        col = np.arange(fdata_total) - np.repeat(np.cumsum(flen) - flen, flen)
        out_data = data[np.repeat(fstart, flen) + col]
        # int64 offsets + large_binary: a batch holding >2 GiB of sampled
        # frame bytes must not silently wrap 32-bit offsets
        f_offs = np.zeros(total + 1, dtype=np.int64)
        f_offs[1:] = np.cumsum(flen)
        frames_flat = pa.Array.from_buffers(
            pa.large_binary(),
            total,
            [None, pa.py_buffer(f_offs.tobytes()), pa.py_buffer(out_data.tobytes())],
        )
        row_offs = np.zeros(n + 1, dtype=np.int64)
        row_offs[1:] = np.cumsum(n_sampled)
        frames = pa.LargeListArray.from_arrays(
            pa.array(row_offs, pa.int64()), frames_flat
        )
        return tbl.append_column("frames", frames)


class ImageResizer:
    """Actor-pool stage: 'resize' an image payload to a fixed byte grid —
    stub decode (no PIL in this environment), real plumbing. The fake
    treats the first 256 payload bytes as a 16x16 grid and mean-pools it
    to ``side``x``side`` — deterministic, fully vectorized over the
    batch's binary buffers, and shaped exactly like a real thumbnailer
    (swap _prefix_matrix + pooling for PIL.Image.resize)."""

    GRID = 16

    def __init__(self, side: int = 4, payload_col: str = "payload"):
        if self.GRID % side:
            raise ValueError(f"side must divide {self.GRID}; got {side}")
        self.side = side
        self.payload_col = payload_col

    def __call__(self, tbl: pa.Table) -> pa.Table:
        mat = _prefix_matrix(tbl.column(self.payload_col), self.GRID * self.GRID)
        n = mat.shape[0]
        img = mat.reshape(n, self.GRID, self.GRID)
        f = self.GRID // self.side
        pooled = (
            img.reshape(n, self.side, f, self.side, f)
            .mean(axis=(2, 4))
            .astype(np.uint8)
        )
        flat = pooled.reshape(n, self.side * self.side)
        return tbl.append_column(
            "thumb",
            pa.FixedSizeListArray.from_arrays(
                pa.array(flat.ravel(), type=pa.uint8()), self.side * self.side
            ),
        )
