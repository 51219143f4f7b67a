"""Multimodal (image/audio/video) column operators — north-star extension.

Design: media payloads are opaque ``binary`` columns with a typed metadata
struct alongside (modality, mime, width/height/duration, ...). All the
Spark-side plumbing — schemas, Arrow-batched Pandas UDFs over
``mapInPandas``, partition sizing — is real and tested; only the actual
codec step is stubbed (the decode libraries are not in this container), as
a deterministic fake behind ``decode_image_stub``. Swapping in Pillow /
torchaudio later changes one function body, not the pipeline.

Scale notes: media rows are large and skew partition sizes; callers should
set ``spark.sql.files.maxPartitionBytes`` down (or repartition by a size
bucket) so one task never holds more than a few hundred MB of payloads.
``mapInPandas`` streams Arrow record batches, so peak executor memory is
one batch, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
        ])),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes int, payload_crc long, width int, height int, "
    "mean_intensity double"
)


def decode_image_stub(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake decode: (width, height, mean_intensity).

    STUB — replace with a real codec (e.g. Pillow) when available:
    real impl raises NotImplementedError if the codec import fails.
    Fake derives stable pseudo-dimensions from the byte content so tests
    are reproducible.
    """
    if not payload:
        return (0, 0, 0.0)
    checksum = sum(payload[:64])
    return (64 + checksum % 512, 64 + (checksum * 7) % 512, (checksum % 256) / 255.0)


def image_features(media: DataFrame, batch_size_hint: int = 64) -> DataFrame:
    """Extract per-image features via an Arrow-batched ``mapInPandas``.

    The UDF sees pandas DataFrames of whole rows (payload included) one
    Arrow batch at a time; output schema is declared up front. This is the
    canonical shape for any decode/resize/frame-sample operator.
    """
    import zlib

    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf["payload"]
            decoded = [decode_image_stub(p if p is not None else b"") for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "payload_crc": [
                        zlib.crc32(p) if p is not None else 0 for p in payloads
                    ],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_intensity": [d[2] for d in decoded],
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(
        extract, IMAGE_FEATURES_SCHEMA
    )
