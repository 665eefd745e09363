"""d18 cross-document boilerplate removal: hand-computed rewrite.

Pins the three load-bearing pieces on crafted documents: the df
threshold is CROSS-document (a gram must appear in >= DF_MIN distinct
docs), covered positions union across overlapping boilerplate grams,
and the cleaned text is the uncovered tokens rejoined IN ORDER —
verified through the row's md5 checksum computed independently here.
"""

from __future__ import annotations

import hashlib


def _bucket(s: str, mod: int = 1_000_000) -> int:
    # python twin of functions/text.md5_bucket (chars=7)
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16) % mod


def test_df_threshold_union_and_ordered_rejoin(spark, tmp_path):
    rows = []
    # source a: 6 docs share the leading phrase -> "terms of service"
    # and "of service apply" both hit df=6 >= 5; their union covers
    # positions 0..3, so the cleaned text is the per-doc tail IN ORDER
    for i in range(6):
        rows.append(
            (i, f"terms of service apply tail{i} end{i}", "en", "a", 0)
        )
    # source b: all-unique docs -> nothing reaches df 5, zero removal
    for i in range(6, 10):
        rows.append((i, f"alpha{i} beta{i} gamma{i} delta{i}", "en", "b", 0))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    from hyppo_worker_spark.queries import load_all
    from hyppo_worker_spark.session import release_persists

    out = {
        r["source"]: r
        for r in load_all()["d18_boilerplate_removal"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    release_persists()

    a = out["a"]
    assert a["n_docs"] == 6 and a["docs_touched"] == 6
    # removed per doc: terms+of+service+apply = 5+2+7+5 = 19 chars of
    # 19 + len(tailN) + len(endN)
    total = sum(19 + len(f"tail{i}") + len(f"end{i}") for i in range(6))
    assert a["removed_bp"] == (10000 * 19 * 6) // total
    assert a["cleaned_checksum"] == sum(
        _bucket(f"tail{i} end{i}") for i in range(6)
    )

    b = out["b"]
    assert b["docs_touched"] == 0 and b["removed_bp"] == 0
    # untouched docs rejoin to their own token stream
    assert b["cleaned_checksum"] == sum(
        _bucket(f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(6, 10)
    )
