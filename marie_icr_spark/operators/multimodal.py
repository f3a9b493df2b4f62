"""Multimodal asset plumbing: opaque binary columns + typed metadata.

The reference loads page images as ndarray frames
(``marie/utils/docs.py:372-380``) and pushes them through GPU operators. At
100 TB the Spark-side contract is: media stays an opaque ``binary`` column
with typed metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

The image/audio codec libraries are not in this container, so the *decode*
step is a clearly marked stub: ``decode_media`` parses a deterministic fake
header (tests) and raises ``NotImplementedError`` for real codecs — the
Spark-side plumbing (schemas, batch shape, partition sizing) is real and
tested.

Fake header format (tests): b"FAKE" + kind(1B: I/A/V) + width(4B LE) +
height(4B LE) + nframes(4B LE) + payload.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image/audio/video
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)

_MAGIC = b"FAKE"
_HEADER_FMT = "<cIII"  # kind, width, height, n_frames (struct.Struct itself
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)  # is not picklable → keep fmt str)


def encode_fake_media(kind: str, width: int, height: int, n_frames: int,
                      payload: bytes = b"") -> bytes:
    """Test-fixture encoder for the deterministic fake container."""
    return (
        _MAGIC
        + struct.pack(_HEADER_FMT, kind[:1].encode(), width, height, n_frames)
        + payload
    )


def _decode_one(content: bytes) -> dict:
    if content is None or len(content) < len(_MAGIC) + _HEADER_SIZE:
        return {"ok": False, "error": "truncated", "width": 0, "height": 0,
                "n_frames": 0, "payload_bytes": 0}
    if content[: len(_MAGIC)] != _MAGIC:
        # STUB: a real build would dispatch to PIL/ffmpeg here
        raise NotImplementedError(
            "real media codecs are not available in this container"
        )
    kind, w, h, n = struct.unpack_from(_HEADER_FMT, content, len(_MAGIC))
    return {
        "ok": True, "error": "",
        "width": int(w), "height": int(h), "n_frames": int(n),
        "payload_bytes": len(content) - len(_MAGIC) - _HEADER_SIZE,
    }


def decode_media(df: DataFrame, fail_open: bool = True) -> DataFrame:
    """Arrow-batched decode of the binary column → typed dimensions.

    ``fail_open=True`` converts codec errors into (ok=False, error) rows —
    the reference's overlay fail-open contract
    (marie/pipe/extract_pipeline.py:143-154) — instead of failing the task.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, mt, content in zip(
                pdf["asset_id"], pdf["media_type"], pdf["content"]
            ):
                try:
                    d = _decode_one(content)
                except NotImplementedError as e:
                    if not fail_open:
                        raise
                    d = {"ok": False, "error": str(e), "width": 0,
                         "height": 0, "n_frames": 0, "payload_bytes": 0}
                d.update(asset_id=aid, media_type=mt)
                rows.append(d)
            out = pd.DataFrame(rows)
            yield out[
                ["asset_id", "media_type", "width", "height", "n_frames",
                 "payload_bytes", "ok", "error"]
            ]

    return df.select("asset_id", "media_type", "content").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def sample_frames(df: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling: explode each fake-video asset into every-nth frame.

    Frames of the fake container are equal slices of the payload. One input
    row → ceil(n_frames / every_nth) output rows (mapInPandas is the right
    shape: the fan-out is data-dependent).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                try:
                    d = _decode_one(content)
                except NotImplementedError:
                    continue
                if not d["ok"] or d["n_frames"] <= 0:
                    continue
                payload = bytes(content)[len(_MAGIC) + _HEADER_SIZE :]
                n = d["n_frames"]
                size = max(1, len(payload) // n) if payload else 0
                for i in range(0, n, every_nth):
                    ids.append(aid)
                    idxs.append(i)
                    blobs.append(payload[i * size : (i + 1) * size])
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": blobs,
                }
            )

    return df.select("asset_id", "content").mapInPandas(run, schema=FRAME_SCHEMA)


def media_features(decoded: DataFrame) -> DataFrame:
    """Cheap JVM-side feature columns over decoded metadata (no Python)."""
    return decoded.select(
        "asset_id",
        "media_type",
        (F.col("width") * F.col("height")).cast("long").alias("pixels"),
        F.when(F.col("height") > 0, F.col("width") / F.col("height"))
        .otherwise(F.lit(0.0))
        .alias("aspect_ratio"),
        F.col("payload_bytes"),
        F.col("ok"),
    )
