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
    returns a deterministic fake (dims derived from payload bytes) so
    the Spark plumbing is exercisable end-to-end."""
    if real_decode:
        raise NotImplementedError("image decode requires PIL/opencv")
    if not payload:
        return (0, 0, 1, [0.0] * 8)
    w = 64 + payload[0]
    h = 64 + payload[-1]
    feat = [float(b) / 255.0 for b in payload[:8]] + [0.0] * max(0, 8 - len(payload))
    return (w, h, 1, feat[:8])


def extract_media_features(
    df: DataFrame, batch_limit: int = 256, real_decode: bool = False
) -> DataFrame:
    """mapInPandas stage: binary payload → (dims, frames, feature vec).

    Errors never kill the task — they land in the ``error`` column
    (per-row fault tolerance, same policy as the HTML kernel)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                rec = {
                    "media_id": row["media_id"],
                    "kind": row["kind"],
                    "n_bytes": row["n_bytes"],
                    "width": None,
                    "height": None,
                    "n_frames": None,
                    "feature": None,
                    "error": None,
                }
                try:
                    w, h, nf, feat = _decode_image(row["payload"], real_decode)
                    rec.update(width=w, height=h, n_frames=nf, feature=feat)
                except Exception as e:  # noqa: BLE001
                    rec["error"] = f"{type(e).__name__}: {e}"
                out.append(rec)
            yield pd.DataFrame(out)

    pruned = df.select("media_id", "kind", "n_bytes", "payload")
    return pruned.mapInPandas(op, schema=FEATURE_SCHEMA)
