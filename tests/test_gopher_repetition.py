"""t33 Gopher repetition filters: the covered-character semantics.

The load-bearing subtlety is the occurrence-interval UNION for the
duplicate-5-gram rule (Rae et al. 2021 "fraction of characters
contained within duplicate n-grams") — overlapping occurrences must
not double-count characters, and coverage is POSITIONAL (an unrelated
token between two occurrences stays uncovered). Both are pinned here
on hand-computed documents; the sf0.01 cross-engine value hash is
tools/check.py's job.
"""

from __future__ import annotations


def _run_t33(spark, tmp_path, texts):
    rows = [
        (i * 5, t, "en", "crafted", len(t)) for i, t in enumerate(texts)
    ]  # doc_id multiples of 5 -> every doc lands in the output window
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from hyppo_worker_spark.queries import load_all
    from hyppo_worker_spark.session import release_persists

    out = {
        r["doc_id"]: r
        for r in load_all()["t33_gopher_repetition"]
        .spark_fn(spark, str(tmp_path))
        .collect()
    }
    release_persists()
    return out


def test_interval_union_not_occurrence_sum(spark, tmp_path):
    out = _run_t33(
        spark,
        tmp_path,
        [
            # doc 0: six identical tokens — the two 5-gram occurrences
            # overlap on 4 positions; union covers all 6 tokens exactly
            # once -> 10000 bp (an occurrence SUM would claim 40 of 24
            # chars = 16666, impossible under union semantics)
            "spam spam spam spam spam spam",
            # doc 5: all-unique tokens -> no duplicate grams at all,
            # and long enough that the top 2-gram stays under 20%
            "alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau",
            # doc 10: under 5 tokens -> no 5-grams, dup5 must be 0
            "a b",
            # doc 15: "q w e r t" repeats at positions 0 and 6 with a
            # gap token z at position 5 -> covered = 10 of 11 one-char
            # tokens (POSITIONAL coverage: z stays uncovered)
            "q w e r t z q w e r t",
        ],
    )
    assert out[0]["dup5_bp"] == 10000
    assert not out[0]["keep_dup5"] and not out[0]["keep"]
    # top 2-gram of doc 0: 'spam spam' x5, chars 8 of 24 total
    assert out[0]["top2_bp"] == (10000 * 5 * 8) // 24

    assert out[5]["dup5_bp"] == 0
    # lexicographically smallest count-1 2-gram wins: 'alpha beta',
    # 9 chars of the full token-char total
    assert out[5]["top2_bp"] == (10000 * 1 * 9) // int(out[5]["total_chars"])
    assert out[5]["keep"]

    assert out[10]["dup5_bp"] == 0 and out[10]["n_tokens"] == 2
    # the lone 2-gram covers 100% of a 2-token doc's chars — tiny
    # docs always trip the top-2-gram rule (Gopher targets long docs)
    assert out[10]["top2_bp"] == 10000 and not out[10]["keep_top2"]

    assert out[15]["total_chars"] == 11
    assert out[15]["dup5_bp"] == (10000 * 10) // 11
    assert not out[15]["keep_dup5"]

    # corpus verdicts ride every row as constants
    assert out[0]["n_docs"] == 4
    assert out[0]["n_dropped"] == 3  # docs 0, 10, 15


def test_top2_tiebreak_is_lexicographic(spark, tmp_path):
    # 'b c' and 'a b' both occur twice; the smaller gram must win the
    # top slot on both engines (count desc, gram asc)
    out = _run_t33(spark, tmp_path, ["a b c d a b c"])
    # tokens: a b c d a b c -> 2-grams: ab bc cd da ab bc; 'a b' and
    # 'b c' tie at 2; winner 'a b' has 2 chars of 7 total
    assert out[0]["top2_bp"] == (10000 * 2 * 2) // 7
