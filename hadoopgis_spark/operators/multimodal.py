"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata — the
pattern a 100 TB training-data pipeline needs: Spark moves/filters/
groups the bytes; decode and feature extraction run as Arrow-batched
``mapInPandas`` stages so each Python batch touches a bounded number of
rows regardless of blob size.

``real_decode=True`` / ``real_resize=True`` use PIL when it is
importable; without PIL (this container ships no codecs) they raise
NotImplementedError at the first row. The default deterministic fake
derives (width, height, channels, checksum) from the bytes so the
Spark-side plumbing — schema, batching, partition sizing — is real and
tested either way. ``extract_features(real_extract=True)`` stays a
documented stub: its real path is model inference, not a codec.
"""

from __future__ import annotations

import hashlib
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pil_image_module():
    """PIL's Image module, or None when no codec library is installed.
    Resolved lazily inside the executor-side kernels so the driver never
    needs PIL to build the plan."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None

__all__ = [
    "attach_media_meta",
    "decode_image",
    "resize_image",
    "extract_features",
    "frame_sample",
    "MEDIA_META_SCHEMA",
]

MEDIA_META_SCHEMA = (
    "media_id long, n_bytes int, checksum string, width int, height int, channels int"
)


def attach_media_meta(df: DataFrame, bytes_col: str = "data", id_col: str = "media_id") -> DataFrame:
    """Cheap JVM-side metadata: size + md5 of the blob (no Python)."""
    return df.withColumn("n_bytes", F.length(F.col(bytes_col))).withColumn(
        "checksum", F.md5(F.col(bytes_col))
    )


def decode_image(
    df: DataFrame,
    bytes_col: str = "data",
    id_col: str = "media_id",
    real_decode: bool = False,
    batch_rows: int = 64,
) -> DataFrame:
    """Decode stage over ``mapInPandas``.

    ``real_decode=True`` decodes with PIL when installed (width/height
    from the image header, channels from the band count); without PIL it
    raises NotImplementedError. The default path emits deterministic
    fake dimensions derived from the blob hash, preserving the real
    execution shape (Arrow batches, bounded ``batch_rows`` so huge blobs
    don't blow executor memory).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = _pil_image_module() if real_decode else None
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for mid, blob in zip(chunk[id_col], chunk[bytes_col]):
                    b = bytes(blob) if blob is not None else b""
                    h = hashlib.md5(b).hexdigest()
                    if real_decode:
                        if pil is None:
                            raise NotImplementedError(
                                "real_decode=True needs PIL (pip install pillow); "
                                "not available in this environment"
                            )
                        with pil.open(io.BytesIO(b)) as img:
                            rows.append(
                                (mid, len(b), h, img.width, img.height, len(img.getbands()))
                            )
                        continue
                    rows.append(
                        (
                            mid,
                            len(b),
                            h,
                            64 + int(h[:4], 16) % 1920,   # fake width
                            64 + int(h[4:8], 16) % 1080,  # fake height
                            1 + int(h[8], 16) % 4,        # fake channels
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "n_bytes", "checksum", "width", "height", "channels"],
                )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(decode, MEDIA_META_SCHEMA)


def resize_image(
    df: DataFrame,
    target_w: int = 160,
    target_h: int = 120,
    bytes_col: str = "data",
    id_col: str = "media_id",
    real_resize: bool = False,
    batch_rows: int = 64,
) -> DataFrame:
    """Aspect-preserving resize stage over ``mapInPandas``.

    ``real_resize=True`` decodes, fits into (target_w, target_h) with
    the same ``scale = min(tw/w, th/h)`` rule, resizes with PIL, and
    re-encodes PNG; without PIL it raises. The fake path derives source
    dims exactly like :func:`decode_image`, applies the identical scale
    rule (plain IEEE ops, so the DuckDB oracle can replicate
    bit-exactly), and emits a 16-byte digest as the stub thumbnail so
    the output schema carries a real binary column.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = _pil_image_module() if real_resize else None
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for mid, blob in zip(chunk[id_col], chunk[bytes_col]):
                    b = bytes(blob) if blob is not None else b""
                    if real_resize:
                        if pil is None:
                            raise NotImplementedError(
                                "real_resize=True needs PIL (pip install pillow); "
                                "not available in this environment"
                            )
                        with pil.open(io.BytesIO(b)) as img:
                            scale = min(
                                float(target_w) / img.width, float(target_h) / img.height
                            )
                            out_w = max(1, int(img.width * scale))
                            out_h = max(1, int(img.height * scale))
                            buf = io.BytesIO()
                            img.resize((out_w, out_h)).save(buf, format="PNG")
                        rows.append((mid, out_w, out_h, buf.getvalue()))
                        continue
                    h = hashlib.md5(b).hexdigest()
                    w = 64 + int(h[:4], 16) % 1920
                    ht = 64 + int(h[4:8], 16) % 1080
                    scale = min(float(target_w) / w, float(target_h) / ht)
                    out_w = max(1, int(w * scale))
                    out_h = max(1, int(ht * scale))
                    rows.append((mid, out_w, out_h, hashlib.md5(b).digest()))
                yield pd.DataFrame(
                    rows, columns=["media_id", "width", "height", "data"]
                )

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        resize, "media_id long, width int, height int, data binary"
    )


def extract_features(
    df: DataFrame,
    dim: int = 16,
    bytes_col: str = "data",
    id_col: str = "media_id",
    real_extract: bool = False,
    batch_rows: int = 64,
) -> DataFrame:
    """Feature-extraction stage: blob → ``array<double>`` embedding.

    The real path (CLIP/CNN inference) is the documented stub; the fake
    path derives each component from ``md5(checksum:i)`` scaled to
    [0, 1) — deterministic, oracle-replicable, and shaped exactly like a
    model-embedding column, so the output feeds the ANN/similarity
    operators unchanged (decode → features → ann_topk composes).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for mid, blob in zip(chunk[id_col], chunk[bytes_col]):
                    if real_extract:
                        raise NotImplementedError(
                            "no inference runtime in this container; "
                            "plug the vision/audio encoder here"
                        )
                    b = bytes(blob) if blob is not None else b""
                    cs = hashlib.md5(b).hexdigest()
                    vec = [
                        int(hashlib.md5(f"{cs}:{i}".encode()).hexdigest()[:8], 16)
                        / 4294967296.0
                        for i in range(dim)
                    ]
                    rows.append((mid, vec))
                yield pd.DataFrame(rows, columns=["media_id", "embedding"])

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        extract, "media_id long, embedding array<double>"
    )


def frame_sample(
    df: DataFrame,
    bytes_col: str = "data",
    id_col: str = "media_id",
    every_n: int = 10,
    window: int = 256,
) -> DataFrame:
    """Deterministic frame sampling stub for video blobs: emits one row
    per sampled 'frame' (byte-window of ``window`` bytes), keyed
    (media_id, frame_idx) — the explode-shaped stage a video pipeline
    needs, with the codec stubbed to fixed-size byte windows."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[bytes_col]):
                b = bytes(blob) if blob is not None else b""
                n_frames = max(1, len(b) // window)
                for fi in range(0, n_frames, every_n):
                    chunk = b[fi * window : (fi + 1) * window]
                    out.append((mid, fi, len(chunk), hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "n_bytes", "checksum"])

    return df.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        sample, "media_id long, frame_idx int, n_bytes int, checksum string"
    )
