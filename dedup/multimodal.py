"""Multimodal column plumbing (prompt-mandated): image/audio/video as
opaque ``binary`` columns with typed metadata.

The Spark-side machinery — schemas, Arrow-batched mapInPandas decode
pass, partitioning, batch shapes — is real and tested. The actual
media decode is STUBBED (no image/audio libraries in this container):
``decode_image`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, in which case it derives pixel metadata
from a hash of the bytes — stable, content-addressed, and good enough
to exercise the full distributed path end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: typed metadata emitted by the decode pass — one row per blob.
MEDIA_META = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_sha", StringType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("blob", BinaryType(), True),
    ]
)


def decode_image(blob: bytes, deterministic_fake: bool = False) -> tuple[str, int, int]:
    """(format, width, height) of an image blob.

    Real decode needs an image library absent from this container —
    NotImplementedError marks the integration point. The deterministic
    fake derives dimensions from the content hash so the distributed
    plumbing (batching, schema, partitioning) is testable bit-for-bit.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires an image library (e.g. Pillow); "
            "install on the real cluster and drop it in here"
        )
    h = hashlib.sha256(blob).digest()
    return ("fake", 16 + h[0] % 240, 16 + h[1] % 240)


def extract_media_meta(media: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Arrow-batched decode/metadata pass over (media_id, blob). One
    Python crossing for the whole partition; blobs never leave the
    executor after this projection (column pruned upstream)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for mid, blob in zip(b["media_id"], b["blob"]):
                blob = bytes(blob) if blob is not None else b""
                fmt, w, h = decode_image(blob, deterministic_fake=deterministic_fake)
                out.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(blob),
                        "content_sha": hashlib.sha256(blob).hexdigest(),
                        "format": fmt,
                        "width": w,
                        "height": h,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_META.fields])

    return media.select("media_id", "blob").mapInPandas(run, schema=MEDIA_META)
