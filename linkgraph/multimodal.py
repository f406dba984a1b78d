"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is a clearly-marked deterministic STUB (the real image /
audio libraries are not in this container) — but the Spark-side plumbing is
real and is the part that matters at 100 TB:

  * the binary payload travels as an Arrow ``binary`` column (zero-copy
    batches into pandas, no per-row Python),
  * ``mapInPandas`` preserves partitioning — no shuffle is introduced by
    feature extraction,
  * the output schema is an explicit StructType (no inference),
  * batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``
    so executor memory is bounded regardless of blob size skew.

Because the stub features are simple byte arithmetic, every operator has an
exact DuckDB oracle (the plumbing is verified end-to-end, not just smoke-
tested).  Swapping the stub for a real decoder (PIL / torchaudio / pyav)
changes only the marked function body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, head_byte long, tail_byte long, "
    "byte_sum_1k long, fake_width long, fake_height long"
)

FRAME_SCHEMA = "doc_id long, n_frames long, frame_stride long, first_frame_off long"


def _decode_stub(blob: bytes) -> tuple[int, int, int, int, int]:
    """STUB image decode — deterministic byte arithmetic instead of a real
    codec.  A real deployment replaces this body with e.g. PIL.Image.open;
    the signature, batching, and schema stay identical."""
    n = len(blob)
    head = blob[0] if n else 0
    tail = blob[-1] if n else 0
    byte_sum = sum(blob[:1024])
    # fake dimensions derived from the payload (stands in for header parse)
    width = (head * 256 + tail) % 1920 + 1
    height = (byte_sum % 1080) + 1
    return n, head, tail, byte_sum, width * 1000000 + height


def real_decoder_available() -> bool:
    """True when an actual image codec (PIL) is importable — checked
    lazily so the module imports cleanly in codec-less containers."""
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def _decode_real(blob: bytes) -> tuple[int, int, int, int, int]:
    """Real decode via PIL (only reachable when real_decoder_available()):
    actual pixel dimensions from the image header, same output signature
    as _decode_stub so the Arrow plumbing is byte-for-byte shared."""
    import io

    from PIL import Image

    n = len(blob)
    head = blob[0] if n else 0
    tail = blob[-1] if n else 0
    byte_sum = sum(blob[:1024])
    try:
        with Image.open(io.BytesIO(blob)) as im:
            width, height = im.size
    except Exception:
        width, height = 0, 0  # undecodable payload -> sentinel dims
    return n, head, tail, byte_sum, width * 1000000 + height


def decode_features(binary_docs: DataFrame, blob_col: str = "blob",
                    id_col: str = "doc_id",
                    use_real_decoder: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    Input: (doc_id, blob: binary [, ...]); output per DECODE_SCHEMA.

    ``use_real_decoder=True`` decodes with PIL when it is importable
    (raises ImportError otherwise — never a silent fallback, so a caller
    asking for real decode can't unknowingly get stub features); the
    default keeps the deterministic stub, which is what the driver gate
    hashes.  Either way the executor-side batching, schema, and shuffle
    profile are identical — the flag swaps only the per-blob function.
    """
    if use_real_decoder and not real_decoder_available():
        raise ImportError(
            "use_real_decoder=True requires PIL (pillow); not installed"
        )
    decode = _decode_real if use_real_decoder else _decode_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(b if b is not None else b"") for b in pdf[blob_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [f[0] for f in feats],
                    "head_byte": [f[1] for f in feats],
                    "tail_byte": [f[2] for f in feats],
                    "byte_sum_1k": [f[3] for f in feats],
                    "fake_width": [f[4] // 1000000 for f in feats],
                    "fake_height": [f[4] % 1000000 for f in feats],
                }
            )

    return binary_docs.mapInPandas(run, schema=DECODE_SCHEMA)


def frame_sample(binary_docs: DataFrame, stride: int = 64,
                 blob_col: str = "blob", id_col: str = "doc_id") -> DataFrame:
    """STUB video frame sampling: every ``stride``-th byte offset is a
    'frame'.  Real plumbing: mapInPandas, explicit schema, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf[blob_col].map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_frames": (n // stride).astype("int64"),
                    "frame_stride": stride,
                    "first_frame_off": (n * 0).astype("int64"),
                }
            )

    return binary_docs.mapInPandas(run, schema=FRAME_SCHEMA)


def docs_as_blobs(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Adapter: treat utf-8 text bytes as an opaque binary payload (the
    sandbox's stand-in for real image/audio blobs)."""
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.encode(F.col(text_col), "UTF-8").alias("blob"))


def decode_features_sql(table: str = "documents", text_expr: str = "text",
                        id_expr: str = "doc_id") -> str:
    """DuckDB oracle for decode_features over docs_as_blobs.

    Valid for ASCII payloads (the sandbox documents are ASCII — verified),
    where byte values equal codepoints; a real-binary deployment would
    oracle against a recorded expectation table instead."""
    return f"""
WITH b AS (
  SELECT {id_expr} AS doc_id, {text_expr} AS t,
         octet_length(encode({text_expr})) AS n
  FROM {table}
),
s AS (
  SELECT doc_id, n,
         CASE WHEN n > 0 THEN unicode(substr(t, 1, 1)) ELSE 0 END AS head_byte,
         CASE WHEN n > 0 THEN unicode(substr(t, length(t), 1)) ELSE 0 END AS tail_byte,
         coalesce(list_sum(list_transform(split(substr(t, 1, 1024), ''),
                                          c -> unicode(c))), 0) AS byte_sum_1k
  FROM b
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_bytes,
       CAST(head_byte AS BIGINT) AS head_byte,
       CAST(tail_byte AS BIGINT) AS tail_byte,
       CAST(byte_sum_1k AS BIGINT) AS byte_sum_1k,
       CAST((head_byte * 256 + tail_byte) % 1920 + 1 AS BIGINT) AS fake_width,
       CAST((byte_sum_1k % 1080) + 1 AS BIGINT) AS fake_height
FROM s
"""


def frame_sample_sql(table: str = "documents", text_expr: str = "text",
                     id_expr: str = "doc_id", stride: int = 64) -> str:
    return f"""
SELECT {id_expr} AS doc_id,
       CAST(octet_length(encode({text_expr})) // {stride} AS BIGINT) AS n_frames,
       CAST({stride} AS BIGINT) AS frame_stride,
       CAST(0 AS BIGINT) AS first_frame_off
FROM {table}
"""
