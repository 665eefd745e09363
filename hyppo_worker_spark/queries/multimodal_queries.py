"""Multimodal-column queries, oracle-checked.

The media table is synthesized deterministically from ``documents``
(payload = utf-8 text bytes, kind = doc_id % 3, typed metadata), so
the multimodal plumbing runs on driver-provided data only.

m01 is deliberately a *plumbing proof*: the manifest (byte length +
md5 digest + typed metadata) is computed in Python inside an
Arrow-batched ``mapInPandas`` stage — if any layer (binary encoding,
Arrow transfer, batch iteration, struct metadata access) corrupted a
single byte, the digest would diverge from DuckDB's, which computes
the same manifest directly over the source text. Decode-dependent
features (``image_features`` etc.) stay test-covered but not
oracle-checked: their pseudo-pixels come from an md5 expansion chain
that SQL cannot reasonably mirror.
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hyppo_worker_spark.operators.multimodal import synth_media_df
from hyppo_worker_spark.queries import register
from hyppo_worker_spark.session import load_tables

_MANIFEST_SCHEMA = (
    "media_id long, kind string, n_bytes long, digest string, fmt string"
)


@register(
    "m01_media_manifest",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image'
                           WHEN 1 THEN 'audio'
                           ELSE 'video' END AS kind,
           octet_length(text::BLOB) AS n_bytes,
           md5(text) AS digest,
           upper(lang) AS fmt
    FROM documents
    ORDER BY media_id
    """,
    tags=("multimodal", "binary", "mapInPandas", "manifest"),
)
def m01_media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media manifest computed Python-side over Arrow batches: byte
    length + md5 digest of every opaque payload plus typed metadata."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    media = synth_media_df(spark, docs)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "digest": pdf["content"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "fmt": pdf["metadata"].map(lambda m: m["format"]),
                }
            )

    return media.mapInPandas(batches, _MANIFEST_SCHEMA).orderBy("media_id")
