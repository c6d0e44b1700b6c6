"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as BinaryType columns with a metadata
struct; transforms run as Arrow-batched ``mapInPandas`` so payload bytes
never round-trip through per-row Python objects one at a time. Media codec
libraries are not available in this environment, so the *decode kernels*
for image/audio are stubbed (clearly-marked NotImplementedError or a
deterministic fake) while the Spark-side plumbing — schema, partition
shape, UDF signatures, batch iteration — is real and tested.

HTML is the one genuinely decodable payload here (pages carry
``html: binary``): `html_to_text` is a real extraction (utf-8 decode +
tag strip + whitespace collapse) used by the pipeline entry points.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = ("doc_id long, media_type string, n_bytes long, "
                     "checksum long, width int, height int, "
                     "sample_rate int, duration_ms long")

_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def html_to_text_py(payload: bytes | None) -> str:
    """Real decode: utf-8 (replacing errors) → strip tags → collapse ws."""
    if payload is None:
        return ""
    text = payload.decode("utf-8", errors="replace")
    text = _TAG_RE.sub(" ", text)
    return _WS_RE.sub(" ", text).strip()


def html_to_text(df: DataFrame, bin_col: str = "html",
                 out_col: str = "extracted_text") -> DataFrame:
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf[out_col] = pdf[bin_col].map(html_to_text_py)
            yield pdf

    from pyspark.sql import types as T
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out_col, T.StringType())])
    return df.mapInPandas(batches, schema=schema)


def decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB — image codecs unavailable in this environment. On a real
    cluster this calls PIL/torchvision inside the same mapInPandas kernel."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this sandbox; "
        "use fake_image_features for deterministic tests")


def fake_image_features(payload: bytes | None, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in feature vector derived from payload bytes —
    exercises the real batch/schema path without codec libraries. Float64
    throughout: chunk means are exact integer-sum/len divisions and the
    L2 norm is a float64 sqrt-of-sum-of-squares, so the whole computation
    is SQL-expressible and oracle-verified (entry ``mm_image_features`` —
    DuckDB recomputes it from hex(blob) bytes; round-6 values hash-match)."""
    if not payload:
        return np.zeros(dim, dtype=np.float64)
    arr = np.frombuffer(payload, dtype=np.uint8)
    chunks = np.array_split(arr.astype(np.float64), dim)
    feats = np.array([c.mean() if len(c) else 0.0 for c in chunks])
    n = np.linalg.norm(feats)
    return feats / n if n > 0 else feats


def media_metadata(df: DataFrame, id_col: str = "doc_id",
                   bin_col: str = "html",
                   media_type: str = "text/html") -> DataFrame:
    """Extract typed metadata from a binary column (real: size/checksum;
    stubbed dims for media types whose codecs are absent)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in it:
            payloads = pdf[bin_col]
            n_bytes = payloads.map(lambda b: len(b) if b is not None else 0)
            # checksum = first 8 hex chars of md5 as int — computable
            # identically in SQL ('0x'||substr(md5(x),1,8))::bigint
            checksum = payloads.map(
                lambda b: int(hashlib.md5(b).hexdigest()[:8], 16) if b else 0)
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "media_type": media_type,
                "n_bytes": n_bytes.astype("int64"),
                "checksum": checksum.astype("int64"),
                "width": -1,       # STUB: real decode fills these
                "height": -1,
                "sample_rate": -1,
                "duration_ms": -1,
            })

    return (df.select(id_col, bin_col)
            .mapInPandas(batches, schema=MEDIA_META_SCHEMA))


def image_feature_frame(df: DataFrame, id_col: str = "doc_id",
                        bin_col: str = "html", dim: int = 16) -> DataFrame:
    """Feature-extraction plumbing over binary payloads (deterministic fake
    kernel; swap fake_image_features → real decode on a cluster)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = pdf[bin_col].map(
                lambda b: fake_image_features(b, dim).tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col], "features": feats})

    return (df.select(id_col, bin_col)
            .mapInPandas(batches,
                         schema="doc_id long, features array<double>"))
