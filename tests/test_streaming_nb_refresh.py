"""p42 streaming NB refresh: per-prefix pure-python replay.

The stream folds (word, class) sufficient statistics per batch and
re-scores the fixed held-out set; this replays every prefix model
independently (no folding — recomputed from scratch per prefix, which
must be value-identical because integer counts are associative) and
pins all three result rows, including that the FINAL row equals the
one-shot batch trainer.
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


def _prefix_rows(docs):
    lab = []
    for doc_id, (src, text) in enumerate(docs):
        w = [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]
        if not w:
            continue
        sc = sum(1 for x in w if x in STOP)
        y = 1 if sc * 1000 >= STOP_PM * len(w) else 0
        lab.append(
            (doc_id, y, _bucket(str(doc_id), 5) == 0,
             _bucket(str(doc_id), 3), w)
        )
    held = [(y, w) for _, y, t, _, w in lab if t]
    rows = []
    for b in range(3):
        train = [(y, w) for _, y, t, blk, w in lab if not t and blk <= b]
        f = {0: Counter(), 1: Counter()}
        n_tr = {0: 0, 1: 0}
        for y, w in train:
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
        pred_pos = agree = 0
        for y, w in held:
            s = {c: prior[c] for c in (0, 1)}
            for wd in w:
                if wd in vocab:
                    s[0] += cost[0][wd]
                    s[1] += cost[1][wd]
            yhat = 1 if s[1] < s[0] else 0
            pred_pos += yhat
            agree += int(yhat == y)
        rows.append(
            {
                "batch_seq": b,
                "train_docs": n,
                "vocab_size": len(vocab),
                "pred_pos": pred_pos,
                "agree": agree,
                "accuracy_bp": agree * 10000 // len(held),
            }
        )
    return rows


def test_stream_matches_per_prefix_replay(spark, tmp_path):
    docs = []
    for i in range(40):
        docs.append(("hi", f"the cat of the house and the dog in it row{i}"))
        docs.append(("lo", f"cat dog mouse horse goat sheep bird fish row{i}"))
    rows = [
        (i, text, "en", src, len(text)) for i, (src, text) in enumerate(docs)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from hyppo_worker_spark.queries import load_all
    from hyppo_worker_spark.session import release_persists

    got = [
        {
            "batch_seq": r["batch_seq"],
            "train_docs": r["train_docs"],
            "vocab_size": r["vocab_size"],
            "pred_pos": r["pred_pos"],
            "agree": r["agree"],
            "accuracy_bp": r["accuracy_bp"],
        }
        for r in load_all()["p42_streaming_nb_refresh"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    ]
    release_persists()
    want = _prefix_rows(docs)
    assert got == want
    # the stream must CONVERGE: strictly growing train set, and the
    # final model separates the crafted populations perfectly
    assert [r["train_docs"] for r in got] == sorted(
        {r["train_docs"] for r in got}
    )
    assert got[-1]["accuracy_bp"] == 10000
