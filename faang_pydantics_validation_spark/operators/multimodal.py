"""Multimodal column plumbing (task brief): image/audio/video as opaque
`binary` columns with typed metadata; decode / feature-extract / resize /
frame-sample as Arrow-batched pandas functions over mapInPandas.

Three codecs, dispatched on magic bytes inside the one mapInPandas pass:
- BMP ('BM'): REAL stdlib parse — width/height from the BITMAPINFOHEADER
  (little-endian i32 at offsets 18/22), pixel-array offset from the file
  header (u32 at 10); body_sum sums the pixel bytes. n_frames = 1.
- WAV ('RIFF..WAVE'): REAL stdlib parse — walks the RIFF chunk list for
  'fmt ' (channels u16@+2, bits-per-sample u16@+14, block-align u16@+12)
  and 'data'; mapped as width = n_channels, height = bits_per_sample,
  n_frames = data_bytes / block_align (sample frames per channel);
  body_sum sums the data-chunk bytes.
- FAKE: deterministic 16-byte header
      magic 'FAKE' | u32 width | u32 height | u32 n_frames (big-endian)
  followed by arbitrary body bytes — the synthetic payload
  pack_fake_media emits so tests can assert exact values at any scale.

Compressed formats (JPEG/PNG/MP4/...) need codec libraries this container
doesn't ship; those magics raise NotImplementedError behind the
HAVE_REAL_DECODER gate — honest stubbing, the schema/partitioning/Arrow
plumbing around them is identical to the real paths above.
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


def _decode_bmp(b: bytes) -> tuple[int, int, int, int]:
    """Real BMP header parse (stdlib struct, no codec libs): BITMAPFILEHEADER
    pixel-array offset (u32le @10), BITMAPINFOHEADER width/height
    (i32le @18/@22; height may be negative for top-down rows)."""
    if len(b) < 26:
        raise ValueError("truncated BMP header")
    (pixel_off,) = struct.unpack_from("<I", b, 10)
    w, h = struct.unpack_from("<ii", b, 18)
    return w, abs(h), 1, sum(b[pixel_off:])


def _decode_wav(b: bytes) -> tuple[int, int, int, int]:
    """Real WAV/RIFF parse (stdlib struct): walk chunks for 'fmt ' and
    'data'. width=n_channels, height=bits_per_sample, n_frames=sample
    frames (data bytes / block align), body_sum=sum of data bytes."""
    if b[8:12] != b"WAVE":
        raise ValueError("RIFF without WAVE form")
    pos, channels, bits, block_align, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack_from("<I", b, pos + 4)[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            # PCM fmt chunks are >= 16 bytes; a shorter (malformed) chunk
            # must fail the decoder's ValueError contract, not leak a
            # struct.error out of the executor
            if len(body) < 16:
                raise ValueError(f"WAV fmt chunk too short ({len(body)} < 16 bytes)")
            channels, block_align, bits = (
                struct.unpack_from("<H", body, 2)[0],
                struct.unpack_from("<H", body, 12)[0],
                struct.unpack_from("<H", body, 14)[0],
            )
        elif cid == b"data":
            # a data chunk truncated below its declared size is malformed;
            # trusting the declared size would silently shorten
            # n_frames/body_sum
            if len(body) < size:
                raise ValueError(
                    f"WAV data chunk truncated ({len(body)} of declared {size} bytes)"
                )
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if channels is None or data is None or not block_align:
        raise ValueError("WAV missing fmt/data chunk")
    return channels, bits, len(data) // block_align, sum(data)


def _decode_one(b: bytes) -> tuple[int, int, int, int]:
    if b[:4] == MAGIC:
        w, h, nf = struct.unpack(">III", b[4:16])
        return w, h, nf, sum(b[16:])
    if b[:2] == b"BM":
        return _decode_bmp(b)
    if b[:4] == b"RIFF":
        return _decode_wav(b)
    # compressed formats need codec libs absent from this container
    raise NotImplementedError(
        f"no codec for magic {b[:4]!r} (container ships no image/audio libs; "
        f"HAVE_REAL_DECODER={HAVE_REAL_DECODER})"
    )


def decode_media_meta(df: DataFrame, media_col: str = "media", id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode: dispatch on magic bytes (FAKE header, real BMP,
    real WAV — see module docstring), return typed metadata. Arrow batches
    in/out; the per-cell header unpack is bounded and stdlib-only."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[media_col].map(len).astype("int32"),
            }
            widths, heights, frames, sums = [], [], [], []
            for raw in pdf[media_col]:
                w, h, nf, s = _decode_one(bytes(raw))
                widths.append(w)
                heights.append(h)
                frames.append(nf)
                sums.append(s)
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
