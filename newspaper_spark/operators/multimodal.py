"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode/resize/frame-sample run as Arrow-batched ``mapInPandas`` stages.
The decode kernels themselves are STUBBED (no image/audio libs in this
container — clearly marked below); everything Spark-side — schema,
batch iteration, partitioning, error channeling — is real and tested
with a deterministic fake decoder.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes long, "
    "width int, height int, n_frames int, feature array<float>, error string"
)


def attach_media(df: DataFrame, text_col: str = "text", kind: str = "image") -> DataFrame:
    """Derive a deterministic binary payload column from text (test/bench
    stand-in for real blob columns)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.md5(F.col(text_col)).alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _decode_image(payload: bytes, real_decode: bool = False):
    """STUB: real implementation needs PIL/opencv (absent here).

    Raises NotImplementedError when real_decode is requested; otherwise
    returns a deterministic fake whose dims derive from md5(payload) —
    chosen so the DuckDB oracle reconstructs them in pure SQL
    (width = 64 + ('0x' || substring(md5(text),1,2))::INT etc.)."""
    if real_decode:
        raise NotImplementedError("image decode requires PIL/opencv")
    import hashlib

    hx = hashlib.md5(payload or b"").hexdigest()
    w = 64 + int(hx[:2], 16)
    h = 64 + int(hx[30:32], 16)
    feat = [int(hx[2 * i : 2 * i + 2], 16) / 255.0 for i in range(8)]
    return (w, h, 1, feat)


def extract_media_features(
    df: DataFrame, batch_limit: int = 256, real_decode: bool = False
) -> DataFrame:
    """mapInPandas stage: binary payload → (dims, frames, feature vec).

    Errors never kill the task — they land in the ``error`` column
    (per-row fault tolerance, same policy as the HTML kernel). The
    batch loop iterates column arrays directly (zip over numpy values,
    never ``iterrows``) and emits one column-oriented frame per batch."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, frames, feats, errs = [], [], [], [], []
            for payload in pdf["payload"].values:
                try:
                    w, h, nf, feat = _decode_image(payload, real_decode)
                    widths.append(w)
                    heights.append(h)
                    frames.append(nf)
                    feats.append(feat)
                    errs.append(None)
                except Exception as e:  # noqa: BLE001
                    widths.append(None)
                    heights.append(None)
                    frames.append(None)
                    feats.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": pdf["n_bytes"].values,
                    "width": widths,
                    "height": heights,
                    "n_frames": frames,
                    "feature": feats,
                    "error": errs,
                }
            )

    pruned = df.select("media_id", "kind", "n_bytes", "payload")
    return pruned.mapInPandas(op, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_id string, width int, height int, "
    "resized_w int, resized_h int, error string"
)


def _resize_dims(w: int, h: int, target: int):
    """Thumbnail-style downscale preserving aspect ratio (never scale
    up): the dimension math every image pipeline runs, independent of
    the pixel work. Deterministic and SQL-expressible."""
    if w <= 0 or h <= 0:
        return (0, 0)
    if w <= target and h <= target:
        return (w, h)
    if w >= h:
        return (target, max(1, (h * target) // w))
    return (max(1, (w * target) // h), target)


def resize_media(
    df: DataFrame, target: int = 128, real_decode: bool = False
) -> DataFrame:
    """mapInPandas resize stage over decoded dims (fake decoder supplies
    md5-derived dims; the pixel resample itself is behind the same
    real_decode stub as decoding). Column-array iteration, no iterrows."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, rws, rhs, errs = [], [], [], [], []
            for payload in pdf["payload"].values:
                try:
                    w, h, _nf, _feat = _decode_image(payload, real_decode)
                    rw, rh = _resize_dims(w, h, target)
                    ws.append(w); hs.append(h); rws.append(rw); rhs.append(rh)
                    errs.append(None)
                except Exception as e:  # noqa: BLE001
                    ws.append(None); hs.append(None); rws.append(None); rhs.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": ws,
                    "height": hs,
                    "resized_w": rws,
                    "resized_h": rhs,
                    "error": errs,
                }
            )

    return df.select("media_id", "payload").mapInPandas(op, schema=RESIZE_SCHEMA)


def sample_frame_indices(n_frames_col, every_n: int = 4, max_frames: int = 8):
    """Frame-sampling plan as a Column: indices 0, every_n, 2·every_n, …
    capped at max_frames — the schedule a video decoder would follow.
    Pure Column (sequence + slice), SQL-mirrorable."""
    last = F.greatest(n_frames_col - 1, F.lit(0))
    idx = F.sequence(F.lit(0), last, F.lit(every_n))
    return F.slice(idx, 1, max_frames)


def attach_video(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake 'video' table: n_frames derived from the md5
    of the payload (1..64), mirroring the fake image decoder's scheme
    so the DuckDB oracle reconstructs it."""
    payload = F.encode(F.col(text_col), "UTF-8")
    n_frames = (
        1 + F.conv(F.substring(F.md5(F.col(text_col)), 3, 2), 16, 10).cast("int") % 64
    )
    return df.select(
        F.md5(F.col(text_col)).alias("media_id"),
        F.lit("video").alias("kind"),
        payload.alias("payload"),
        n_frames.alias("n_frames"),
    )
