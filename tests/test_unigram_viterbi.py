"""t34 unigram Viterbi segmentation: independent pure-python replay.

Reimplements the whole pipeline — token-weighted piece frequencies,
top-V multi-char vocabulary with (f desc, piece asc) tie-break,
whole-bit costs, and the position DP — with plain dicts and loops,
then pins the registry row against it on crafted corpora, including a
hand-worked case where a multi-char piece must beat its single-char
decomposition.
"""

from __future__ import annotations

import re
from collections import Counter

MAXW, MAXP, V = 16, 4, 50


def _reference(docs):
    """docs: list of (source, text) -> {source: row-dict}."""
    swc = Counter()
    for src, text in docs:
        for w in re.split(r"[^a-z0-9]+", text.lower()):
            if w:
                swc[(src, w)] += 1
    wc = Counter()
    for (src, w), c in swc.items():
        if len(w) <= MAXW:
            wc[w] += c
    # piece frequencies over every substring occurrence (len <= MAXP)
    pf = Counter()
    for w, c in wc.items():
        for e in range(1, len(w) + 1):
            for l in range(1, min(MAXP, e) + 1):
                pf[w[e - l : e]] += c
    multi = sorted(
        ((p, f) for p, f in pf.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:V]
    vocab = {p: f for p, f in pf.items() if len(p) == 1}
    vocab.update(dict(multi))
    T = sum(vocab.values())
    cost = {p: len(bin(T // f)) - 2 for p, f in vocab.items()}  # bin() has 0b
    out = {}
    wcost = {}
    for w in wc:
        dp = [0] + [None] * len(w)
        for i in range(1, len(w) + 1):
            best = None
            for l in range(1, min(MAXP, i) + 1):
                p = w[i - l : i]
                if p in vocab and dp[i - l] is not None:
                    c = dp[i - l] + cost[p]
                    best = c if best is None else min(best, c)
            dp[i] = best
        wcost[w] = dp[len(w)]
    for (src, w), c in swc.items():
        row = out.setdefault(
            src,
            {"n_tokens": 0, "long_excluded": 0, "total_cost": 0, "chars": 0},
        )
        if len(w) > MAXW:
            row["long_excluded"] += c
        else:
            row["n_tokens"] += c
            row["total_cost"] += c * wcost[w]
            row["chars"] += c * len(w)
    for row in out.values():
        row["cost_per_char_bp"] = row["total_cost"] * 10000 // row["chars"]
        del row["chars"]
    return out


def _run(spark, tmp_path, docs):
    rows = [
        (i, text, "en", src, len(text)) for i, (src, text) in enumerate(docs)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from hyppo_worker_spark.queries import load_all
    from hyppo_worker_spark.session import release_persists

    out = {
        r["source"]: {
            "n_tokens": r["n_tokens"],
            "long_excluded": r["long_excluded"],
            "total_cost": r["total_cost"],
            "cost_per_char_bp": r["cost_per_char_bp"],
        }
        for r in load_all()["t34_unigram_viterbi_cost"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    release_persists()
    return out


def test_multichar_piece_beats_singles(spark, tmp_path):
    # "ab" appears so often it enters the top-V vocab with a LOW cost;
    # the Viterbi split of "abab" must then use two "ab" pieces, not
    # four singles — checked through the independent replay AND a
    # direct dominance assertion on the costs it implies.
    docs = [("a", "ab ab ab ab ab abab"), ("b", "zq zq abab")]
    got = _run(spark, tmp_path, docs)
    want = _reference(docs)
    assert got == want
    # dominance visible in the reference internals: recompute both
    # segmentations of "abab" by hand from the same vocab
    swc_all = " ".join(t for _, t in docs)
    pf = Counter()
    wc = Counter(w for w in re.split(r"[^a-z0-9]+", swc_all) if w)
    for w, c in wc.items():
        for e in range(1, len(w) + 1):
            for l in range(1, min(MAXP, e) + 1):
                pf[w[e - l : e]] += c
    multi = dict(
        sorted(
            ((p, f) for p, f in pf.items() if len(p) >= 2),
            key=lambda t: (-t[1], t[0]),
        )[:V]
    )
    vocab = {p: f for p, f in pf.items() if len(p) == 1}
    vocab.update(multi)
    T = sum(vocab.values())
    cost = {p: len(bin(T // f)) - 2 for p, f in vocab.items()}
    assert "ab" in cost
    assert 2 * cost["ab"] < 2 * cost["a"] + 2 * cost["b"]


def test_matches_reference_on_mixed_corpus(spark, tmp_path):
    docs = [
        ("news", "the market rallied while the banks retreated"),
        ("news", "the banks rallied the rally rallied"),
        ("code", "def foo return foo def bar return bar"),
        ("code", "x1 x2 x1 foo"),
        ("junk", "zzzzzzzzzzzzzzzzzzzzzzzz ok"),  # 24 chars -> excluded
    ]
    got = _run(spark, tmp_path, docs)
    want = _reference(docs)
    assert got == want
    assert got["junk"]["long_excluded"] == 1
    assert got["junk"]["n_tokens"] == 1  # "ok"
