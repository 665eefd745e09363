"""Persisted MinHash-LSH index for ingestion-time deduplication.

The batch operators (``operators/dedup.py``) re-hash the corpus on
every run; an ingestion pipeline cannot — at 100 TB the corpus text
must be hashed ONCE, when each document is admitted. This index stores
the two frames the candidate+verify join actually needs:

- ``banded/``  : (did, band_id, band_key) — narrow banding rows;
- ``shingles/``: (did, sh array<string>)  — shingle sets for exact
  Jaccard verification of candidates.

Both are parquet directories written in append mode: admitting a batch
appends its rows; nothing existing is rewritten (object-store
friendly — no read-modify-write). Checking a new batch then joins the
batch's (broadcast) banding rows against ``banded/`` and pulls shingle
arrays only for candidate ids — the corpus text is never re-read.

At scale, ``banded/`` should be written bucketed/partitioned by
band_key prefix so the candidate join prunes files; the append
contract is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from hyppo_worker_spark.operators.dedup import (
    _minhash_banded,
    minhash_pairs_against_banded,
)


class MinHashLshIndex:
    """Filesystem-backed LSH index with append-only admission."""

    def __init__(
        self,
        path: str,
        *,
        num_hashes: int = 12,
        bands: int = 6,
        shingle_n: int = 3,
    ) -> None:
        self.path = path
        self.num_hashes = num_hashes
        self.bands = bands
        self.shingle_n = shingle_n
        self._banded_dir = os.path.join(path, "banded")
        self._shingles_dir = os.path.join(path, "shingles")

    def exists(self) -> bool:
        return os.path.isdir(self._banded_dir)

    def compute_frames(
        self, docs: DataFrame, id_col: str, text_col: str
    ) -> tuple[DataFrame, DataFrame]:
        """Hash a document frame into (shingles, banded) — one pass
        over the text, exactly the batch operators' signature stage."""
        return _minhash_banded(
            docs,
            id_col,
            text_col,
            num_hashes=self.num_hashes,
            bands=self.bands,
            shingle_n=self.shingle_n,
        )

    def append(self, shingles: DataFrame, banded: DataFrame) -> None:
        """Admit documents: append their frames (no rewrite)."""
        banded.write.mode("append").parquet(self._banded_dir)
        shingles.write.mode("append").parquet(self._shingles_dir)

    def load(self, spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        return (
            spark.read.parquet(self._shingles_dir),
            spark.read.parquet(self._banded_dir),
        )

    def pairs_against(
        self,
        spark: SparkSession,
        new_shingles: DataFrame,
        new_banded: DataFrame,
        *,
        threshold: float = 0.8,
        broadcast_new: bool = True,
    ) -> DataFrame:
        """(corpus_id a_id, new_id b_id, jaccard) pairs of the new
        batch against everything admitted so far."""
        docs_c, band_c = self.load(spark)
        return minhash_pairs_against_banded(
            docs_c,
            band_c,
            new_shingles,
            new_banded,
            threshold=threshold,
            broadcast_new=broadcast_new,
        )
