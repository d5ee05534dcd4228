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
