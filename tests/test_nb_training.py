"""t35 NB quality trainer: independent pure-python replay.

Reimplements the weak label, md5 hash split, sufficient-statistics
counts, millibit PWL-log2 Laplace costs, and the argmin decision with
plain dicts, then pins the registry row against it — including a
crafted corpus where a held-out stopword-heavy doc must score
positive and a stopword-free doc negative.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

STOP = {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"}
STOP_PM = 60


def _bucket(s: str, mod: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16) % mod


def _ml2(r: int) -> int:
    m = r.bit_length() - 1
    p = 1 << m
    return m * 1000 + (r - p) * 1000 // p - 10000


def _reference(docs):
    lab = []
    for doc_id, (src, text) in enumerate(docs):
        w = [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]
        if not w:
            continue
        sc = sum(1 for x in w if x in STOP)
        y = 1 if sc * 1000 >= STOP_PM * len(w) else 0
        lab.append((doc_id, src, y, _bucket(str(doc_id), 5) == 0, w))
    f = {0: Counter(), 1: Counter()}
    n_tr = {0: 0, 1: 0}
    for _, _, y, is_test, w in lab:
        if not is_test:
            n_tr[y] += 1
            f[y].update(w)
    vocab = set(f[0]) | set(f[1])
    t = {c: sum(f[c].values()) + len(vocab) for c in (0, 1)}
    cost = {
        c: {wd: _ml2(t[c] * 1024 // (f[c][wd] + 1)) for wd in vocab}
        for c in (0, 1)
    }
    n = n_tr[0] + n_tr[1]
    prior = {c: _ml2(n * 1024 // n_tr[c]) for c in (0, 1)}
    out = {}
    for _, src, y, is_test, w in lab:
        if not is_test:
            continue
        s = {c: prior[c] for c in (0, 1)}
        for wd in w:
            if wd in vocab:
                s[0] += cost[0][wd]
                s[1] += cost[1][wd]
        yhat = 1 if s[1] < s[0] else 0
        row = out.setdefault(src, {"n_test": 0, "pred_pos": 0, "agree": 0})
        row["n_test"] += 1
        row["pred_pos"] += yhat
        row["agree"] += int(yhat == y)
    for row in out.values():
        row["accuracy_bp"] = row["agree"] * 10000 // row["n_test"]
    return out


def _corpus():
    docs = []
    # stopword-heavy (positive) and content-only (negative) docs per
    # source; 40 of each so the md5 hash split holds out BOTH kinds
    # (even doc_ids are hi, odd are lo; buckets 32/52/62/64/72 and
    # 23/61/63 land in the 20%)
    for i in range(40):
        docs.append(("hi", f"the cat of the house and the dog in it row{i}"))
        docs.append(("lo", f"cat dog mouse horse goat sheep bird fish row{i}"))
    return docs


def test_matches_independent_reference(spark, tmp_path):
    docs = _corpus()
    rows = [
        (i, text, "en", src, len(text)) for i, (src, text) in enumerate(docs)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from hyppo_worker_spark.queries import load_all
    from hyppo_worker_spark.session import release_persists

    got = {
        r["source"]: {
            "n_test": r["n_test"],
            "pred_pos": r["pred_pos"],
            "agree": r["agree"],
            "accuracy_bp": r["accuracy_bp"],
        }
        for r in load_all()["t35_nb_quality_training"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    release_persists()
    want = _reference(docs)
    assert got == want
    # the learned model must separate the two populations perfectly:
    # every held-out hi-doc predicted positive, every lo-doc negative
    assert got["hi"]["n_test"] > 0 and got["lo"]["n_test"] > 0
    assert got["hi"]["pred_pos"] == got["hi"]["n_test"]
    assert got["hi"]["accuracy_bp"] == 10000
    assert got["lo"]["pred_pos"] == 0
    assert got["lo"]["accuracy_bp"] == 10000


def test_millibit_log2_is_exact_pwl(spark):
    # the shared helper matches the pure formula on a ratio sweep,
    # including exact powers of two (frac term 0)
    from hyppo_worker_spark.queries.text_queries import _ml2_expr
    from pyspark.sql import functions as F

    rows = [(r,) for r in [1024, 1536, 2048, 3000, 4096, 123456, 10**9]]
    df = spark.createDataFrame(rows, "r long").select(
        "r", F.expr(_ml2_expr("r")).alias("m")
    )
    for row in df.collect():
        assert row.m == _ml2(row.r)
    assert _ml2(1024) == 0 and _ml2(2048) == 1000
