"""Text-analysis primitives as Catalyst expressions.

Tokenization, shingling, MinHash signatures, SimHash, fingerprints,
language-ID scoring, and quality metrics — every one a pure column
expression built from ``pyspark.sql.functions`` so the whole pipeline
stays inside whole-stage codegen and scales linearly with executors.

Determinism contract: every hash is md5-hex (lowercase, 32 chars) so
results are reproducible across engines and runs — the DuckDB oracles
in ``queries/`` mirror these exact formulas.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = "0123456789abcdef"


def tokens(text: Column | str) -> Column:
    """Lowercased alnum tokens: split on non-[a-z0-9] runs, drop empties."""
    c = F.lower(F.col(text) if isinstance(text, str) else text)
    return F.filter(F.split(c, "[^a-z0-9]+"), lambda x: x != "")


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined) of a token array.

    Guards the size < n case explicitly: Spark's ``sequence(1, 0)``
    is descending, not empty.
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + k) for k in range(n)]
    )
    return F.when(F.size(toks) >= n, F.array_distinct(F.transform(idx, gram))).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """ALL word n-grams (space-joined, duplicates kept) of a token
    array — the bag-of-features view a linear text classifier scores,
    unlike :func:`shingles` which deduplicates for set-similarity.

    Same ``size < n`` guard as shingles (Spark's ``sequence(1, 0)`` is
    descending, not empty).
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + k) for k in range(n)]
    )
    return F.when(F.size(toks) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def pos_ngram_hashes(toks: Column, n: int) -> Column:
    """Positional word n-gram hashes of a token array —
    ``array<struct<pos:int, h:bigint>>`` where ``pos`` is the
    1-based start index and ``h`` the first 13 md5 hex chars of the
    space-joined gram as int64 (52 bits, collision-negligible).

    Same ``size < n`` guard as :func:`shingles` /
    :func:`word_ngrams` — Spark's ``sequence(1, 0)`` is DESCENDING,
    not empty, so an unguarded sequence on a short document emits
    slice() starts <= 0 (ADVICE r4 on d13: reads from the array end
    or errors, diverging from DuckDB's naturally-empty range()).
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    mk = lambda i: F.struct(  # noqa: E731
        i.alias("pos"),
        F.conv(
            F.substring(
                F.md5(F.array_join(F.slice(toks, i, n), " ")), 1, 13
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    return F.when(F.size(toks) >= n, F.transform(idx, mk)).otherwise(
        F.array().cast("array<struct<pos:int,h:bigint>>")
    )


def minhash_signature(shingle_arr: Column, k: int = 12) -> Column:
    """MinHash signature: for seed i, min md5 hex of ``'{i}:{shingle}'``.

    Hex strings compare lexicographically identically everywhere, so
    the signature is engine-independent. Empty shingle set → array of
    sentinel 'z' strings (never matches a real hash).
    """
    sigs = [
        F.coalesce(
            F.array_min(
                F.transform(
                    shingle_arr, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s))
                )
            ),
            F.lit("z"),
        )
        for i in range(k)
    ]
    return F.array(*sigs)


def lsh_bands(signature: Column, bands: int, rows: int) -> Column:
    """Band the signature: array of (band_id, band_key) structs.

    Docs sharing any band key are near-dup candidates; used via
    ``explode`` + groupBy(band_id, band_key) — a single shuffle keyed
    by the band, which is the scalable LSH join pattern (no all-pairs
    comparison ever materializes).
    """
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.concat_ws(
                    "|", *[F.element_at(signature, b * rows + r + 1) for r in range(rows)]
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def _hex_val(c: Column) -> Column:
    """Value 0-15 of one lowercase hex char (oracle mirror:
    ``strpos('0123456789abcdef', c) - 1``)."""
    return F.conv(c, 16, 10).cast("int")


def simhash16(toks: Column) -> Column:
    """16-bit SimHash over distinct tokens.

    Bit j is set iff the majority of token hashes have bit (j%4) of
    hex digit j set. Pure expression: md5 per token, bit tests via
    hex-digit arithmetic — mirrors the DuckDB oracle formula exactly.
    """
    dt = F.array_distinct(toks)
    n = F.size(dt)
    bits = []
    for j in range(16):
        bit_of = lambda w: (  # noqa: E731
            F.floor(
                _hex_val(F.substring(F.md5(w), j + 1, 1)) / (2 ** (j % 4))
            ).cast("int")
            % 2
        )
        ones = F.size(F.filter(dt, lambda w: bit_of(w) == 1))
        bits.append(F.when(ones * 2 > n, F.lit(1 << j)).otherwise(F.lit(0)))
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return F.when(n > 0, total).otherwise(F.lit(0)).cast("long")


def bag_fingerprint(toks: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of sorted distinct
    tokens — detects shuffled/reordered copies of the same bag."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


def winnow_fingerprint(shingle_arr: Column, keep: int = 4) -> Column:
    """Winnowing-style fingerprint: concat of the ``keep`` smallest
    shingle hashes (min-k sketch of the shingle set)."""
    hashes = F.array_sort(F.transform(shingle_arr, F.md5))
    return F.concat_ws("|", F.slice(hashes, 1, keep))


STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est", "pour", "que"],
    "es": ["el", "la", "de", "que", "y", "los", "un", "una", "es", "por"],
}


def _isin_pred(words: list[str]):
    # single-parameter lambda factory: PySpark inspects lambda arity,
    # so the word list must be captured by closure, not default arg.
    ws = tuple(words)

    def pred(x: Column) -> Column:
        return x.isin(*ws)

    return pred


def lang_scores(toks: Column) -> dict[str, Column]:
    """Stopword-hit counts per language (the n-gram-free heuristic)."""
    return {
        lang: F.size(F.filter(toks, _isin_pred(words)))
        for lang, words in STOPWORDS.items()
    }


def predict_lang(toks: Column) -> Column:
    """Argmax language with deterministic alphabetical tie-break; 'und'
    (undetermined) when no stopword hits at all."""
    scores = lang_scores(toks)
    best = None
    for lang in sorted(scores):  # alphabetical → earlier lang wins ties
        s = scores[lang]
        if best is None:
            best = (F.lit(lang), s)
        else:
            blang, bscore = best
            better = s > bscore
            best = (F.when(better, F.lit(lang)).otherwise(blang), F.when(better, s).otherwise(bscore))
    blang, bscore = best
    return F.when(bscore > 0, blang).otherwise(F.lit("und"))


def quality_metrics(text: Column, toks: Column) -> dict[str, Column]:
    """Length/punctuation/stopword-ratio quality signals."""
    n_chars = F.length(text)
    n_toks = F.size(toks)
    stop_hits = F.size(F.filter(toks, _isin_pred(STOPWORDS["en"])))
    punct = n_chars - F.length(F.regexp_replace(text, r"[^a-zA-Z0-9\s]", ""))
    mean_tok_len = F.when(
        n_toks > 0,
        F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w)) / n_toks,
    ).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_toks.cast("long"),
        "punct_ratio": F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_toks > 0, stop_hits / n_toks).otherwise(F.lit(0.0)),
        "mean_token_len": mean_tok_len,
    }


def md5_bucket(key: Column | str, mod: int, chars: int = 7) -> Column:
    """Deterministic integer bucket in [0, mod): the first ``chars``
    hex digits of md5(key) as an int64, modulo ``mod``.

    The shared placement/gating primitive (sampling gates, held-out
    splits, shard assignment): a pure function of the key, independent
    of partitioning and engine. NULL keys hash as the empty string ON
    BOTH SIDES — the DuckDB identity is ``md5_bucket_sql()``'s
    ``('0x' || substr(md5(coalesce(k::VARCHAR, '')), 1, chars))::BIGINT
    % mod`` (a bare ``md5(k::VARCHAR)`` would return NULL for NULL keys
    and silently diverge). ``chars`` ≤ 15 keeps the value inside int64.
    """
    c = F.col(key) if isinstance(key, str) else key
    k = F.coalesce(c.cast("string"), F.lit(""))
    return F.conv(F.substring(F.md5(k), 1, chars), 16, 10).cast("bigint") % mod


def md5_bucket_sql(key_sql: str, mod: int, chars: int = 7) -> str:
    """The DuckDB oracle expression identical to :func:`md5_bucket` —
    including the NULL-keys-hash-as-empty-string coalesce. Oracle SQL
    strings should embed this instead of hand-writing the expression so
    the cross-engine identity holds for nullable key columns too."""
    return (
        f"(('0x' || substr(md5(coalesce(({key_sql})::VARCHAR, '')), "
        f"1, {chars}))::BIGINT % {mod})"
    )
