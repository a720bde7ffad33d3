"""Public scalar-function surface of the engine: the vectorized
re-expression of the reference's validation_utils.py function library
(all ~15 scalar validators; see rules/library.py builders for the
rule-wrapped forms) plus the text/dedup column functions.

Everything here is a pure Column-in/Column-out function usable in any
DataFrame expression — the engine's `pyspark.sql.functions` extension
module.
"""

from ..operators.dedup import normalized_text, word_shingles
from ..operators.text import (
    BPE_ISH_PATTERN,
    bpe_ish_token_count,
    whitespace_token_count,
    word_array,
)
from ..rules.library import (
    norm_blank_to_null,
    norm_term_colon,
    strip_timestamp,
)

__all__ = [
    "norm_blank_to_null",
    "norm_term_colon",
    "strip_timestamp",
    "normalized_text",
    "word_shingles",
    "whitespace_token_count",
    "bpe_ish_token_count",
    "word_array",
    "BPE_ISH_PATTERN",
]
