"""Multimodal column plumbing (task brief): image/audio/video as opaque
`binary` columns with typed metadata; decode / feature-extract / resize /
frame-sample as Arrow-batched pandas functions over mapInPandas.

The container has no image/audio libraries, so the actual decode is
STUBBED (gated import -> NotImplementedError) with a deterministic fake
decoder used by default; the Spark-side plumbing — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested.

Fake payload format (produced by pack_fake_media): 16-byte header
    magic 'FAKE' | u32 width | u32 height | u32 n_frames (big-endian)
followed by arbitrary body bytes. The fake decoder parses the header and
returns per-frame "features" derived from body byte sums — fully
deterministic, so tests can assert exact values.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"FAKE"

try:  # pragma: no cover - the real decoders are absent in this container
    import PIL.Image  # type: ignore # noqa: F401

    HAVE_REAL_DECODER = True
except Exception:
    HAVE_REAL_DECODER = False


def pack_fake_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize a binary media column from a text column: deterministic
    header (width/height/frames derived from the id) + utf8 body."""
    i = F.col(id_col).cast("long")
    header = F.concat(
        F.lit(MAGIC),
        _be32(F.pmod(i, F.lit(64)) + 8),       # width
        _be32(F.pmod(i, F.lit(48)) + 6),       # height
        _be32(F.pmod(i, F.lit(5)) + 1),        # n_frames
    )
    return df.select(
        F.col(id_col),
        F.concat(header, F.encode(F.col(text_col), "UTF-8")).alias("media"),
    )


def _be32(c):
    """Encode an int column as 4 big-endian bytes (pure SQL)."""
    return F.unhex(F.lpad(F.hex(c.cast("long")), 8, "0"))


MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, n_frames int, body_sum long"
)


def decode_media_meta(df: DataFrame, media_col: str = "media", id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode: parse headers, return typed metadata. Arrow
    batches in/out; vectorized inside except the per-cell header unpack
    (bounded, 16 bytes each). Real decoder path raises until the codec
    libs exist."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[media_col].map(len).astype("int32"),
            }
            widths, heights, frames, sums = [], [], [], []
            for raw in pdf[media_col]:
                b = bytes(raw)
                if b[:4] != MAGIC:
                    if HAVE_REAL_DECODER:
                        raise NotImplementedError(
                            "real media decode not implemented in this container"
                        )
                    raise ValueError("bad magic in media column")
                w, h, nf = struct.unpack(">III", b[4:16])
                widths.append(w)
                heights.append(h)
                frames.append(nf)
                sums.append(sum(b[16:]))
            out["width"] = pd.Series(widths, dtype="int32")
            out["height"] = pd.Series(heights, dtype="int32")
            out["n_frames"] = pd.Series(frames, dtype="int32")
            out["body_sum"] = pd.Series(sums, dtype="int64")
            yield pd.DataFrame(out)

    return df.mapInPandas(decode, schema=MEDIA_META_SCHEMA)


def frame_sample(df: DataFrame, meta_df: DataFrame | None = None, every: int = 2) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame index
    (explode of a sequence bounded by n_frames) — the distributed shape a
    real video pipeline needs; the frame decode itself is the stub above."""
    meta = meta_df if meta_df is not None else decode_media_meta(df)
    return meta.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every))
        ).alias("frame_idx"),
    )
