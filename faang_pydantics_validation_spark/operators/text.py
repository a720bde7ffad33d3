"""Text-analysis operators for training-data pipelines (task brief):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure Column expressions (JVM-side, codegen) — no
Python in the hot path; designed to run over billions of documents.

Each has an exact ANSI-SQL twin in __spark_entry__.oracle_sql so the
driver's DuckDB differential check covers them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "is"],
    "fr": ["le", "la", "et", "les", "des", "une"],
    "de": ["der", "die", "und", "das", "ein", "nicht"],
    "es": ["el", "la", "los", "que", "una", "es"],
}

# BPE-ish tokenizer regex: word pieces, numbers, single punctuation —
# a public-knowledge approximation of GPT-2-style pretokenization.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_token_count(text: Column) -> Column:
    """Count of whitespace-separated tokens; robust to leading/trailing
    and repeated whitespace, 0 for blank."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_ish_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0))


def word_array(text: Column) -> Column:
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


PUNCT_CHARS = ".,;:!?'\"()[]{}-"
ALPHA_CHARS = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
UPPER_CHARS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _char_class_count(t: Column, chars: str) -> Column:
    """Count of characters of `chars` in t — length(t) - length(translate
    (t, chars, '')). Value-identical to length(regexp_replace(t,
    '[^chars]', '')) (both count exactly the class occurrences, NULL ->
    NULL, '' -> 0) but translate is a plain per-char table lookup: no
    regex engine, no intermediate string allocation. The regexp_replace
    construction measured ~59 CPU-s for the 50k-doc sf1.0 quality scan
    (~1.2ms/doc for six regex passes); see OPTIMIZATION_r06.md."""
    return F.length(t) - F.length(F.translate(t, chars, ""))


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality scoring: length, token counts, punctuation /
    alpha ratios, mean word length, uppercase ratio. Floats rounded to 6dp
    for cross-engine determinism.

    r6: character-class counts via translate() (no regex engine, no
    intermediate strings — the measured win) and token counts via
    regexp_count() (note: Catalyst rewrites it to
    size(regexp_extract_all(...)), so match arrays still materialize
    there); every output value unchanged (oracle-pinned).
    n_words == size(split(trim(t), '\\s+')) for non-blank t because the
    \\S+ runs of a string are exactly its split-on-\\s+ tokens (Java \\s
    and \\S are complements); blank -> 0 and NULL -> NULL on both forms."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.regexp_count(t, F.lit(r"\S+"))
    n_punct = _char_class_count(t, PUNCT_CHARS)
    n_alpha = _char_class_count(t, ALPHA_CHARS)
    n_upper = _char_class_count(t, UPPER_CHARS)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.regexp_count(t, F.lit(BPE_ISH_PATTERN)).alias("n_tokens"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(n_upper / F.greatest(n_alpha, F.lit(1)), 6).alias("upper_ratio"),
        F.round(
            (n_chars - n_words + 1) / F.greatest(n_words, F.lit(1)), 6
        ).alias("mean_word_len"),
    )


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: stopword-marker hit rate per language over
    whitespace tokens; argmax with deterministic tiebreak (marker-count
    desc, language asc); 'und' when no markers hit."""
    langs = sorted(LANG_MARKERS)
    words = word_array(F.lower(F.col(text_col)))
    scores = []
    for i, lang in enumerate(langs):
        arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        hits = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
        # tiebreak field descends with sort_array(asc=False), so invert the
        # index to prefer the alphabetically-first language on equal hits
        scores.append(
            F.struct(
                hits.alias("hits"),
                F.lit(len(langs) - 1 - i).alias("tb"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.element_at(F.sort_array(F.array(*scores), asc=False), 1)
    n_words = F.greatest(F.size(words), F.lit(1))
    return df.select(
        F.col(id_col),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_guess"),
        F.round(best["hits"] / n_words, 6).alias("marker_ratio"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: md5 over whitespace-normalized lowercase text
    (stable across engines), plus a 64-bit rolling-hash-style xxhash64
    (Spark-native, used by dedup internals)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp_xx64"),
    )
