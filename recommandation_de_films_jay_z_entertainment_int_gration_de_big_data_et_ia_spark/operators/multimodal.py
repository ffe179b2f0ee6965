"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Spark-side design for image/audio/video at 100 TB:
- payloads are ``binary`` columns with a ``metadata`` struct (size, mime,
  dims …) so planning/pruning never touches bytes;
- decode / feature-extract runs in Arrow-batched ``mapInPandas`` — the only
  sanctioned Python boundary in the engine (vectorized, no per-row pickling);
- partitioning: payload frames repartition by a size-aware key upstream so
  batches stay within executor memory.

The actual image/audio codecs are NOT in this container, so
:func:`decode_real` is an explicit stub (NotImplementedError) and
:func:`extract_features` computes a deterministic fake feature vector —
the Spark plumbing (schema, batch iteration, UDF signature) is real and
oracle-tested; swapping in PIL/librosa is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("head_fp", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def to_binary_docs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap a text column as an opaque binary payload + metadata struct —
    the canonical multimodal row shape."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.length(payload).alias("n_bytes"),
        F.lit("text/plain").alias("mime"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def decode_real(payload: bytes, mime: str):
    """Real decode hook — image/audio libs are not installed here."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; plug PIL/librosa here"
    )


def extract_features(binary_docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake decoder: n_bytes, md5 of the first 8 bytes, and a
    3-dim 'embedding' [n%7, n%11, n%13] — stands in for real decode while
    exercising the exact mapInPandas batch path production would use.
    """
    import hashlib

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int32"),
                    "head_fp": payloads.map(lambda b: hashlib.md5(bytes(b[:8])).hexdigest()),
                    "features": n_bytes.map(
                        lambda n: [float(n % 7), float(n % 11), float(n % 13)]
                    ),
                }
            )

    return binary_docs.mapInPandas(_extract, schema=FEATURE_SCHEMA)
