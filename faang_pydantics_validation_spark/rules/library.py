"""Expression builders: one per rule kind in SURVEY.md §2.2-§2.4.

Each builder takes (columns, params) and returns a pair of Columns
(violated: boolean, observed: string). Everything is native Spark SQL —
these all stay inside whole-stage codegen; there is deliberately no UDF
in this module.

Reference parity notes cite /root/reference file:line in each builder.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

Builder = Callable[[tuple[str, ...], dict[str, Any]], tuple[Column, Column]]

_REGISTRY: dict[str, Builder] = {}


def register(kind: str) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        _REGISTRY[kind] = fn
        return fn

    return deco


def get_builder(kind: str) -> Builder:
    try:
        return _REGISTRY[kind]
    except KeyError:
        raise KeyError(f"unknown rule kind {kind!r}; known: {sorted(_REGISTRY)}")


def kinds() -> list[str]:
    return sorted(_REGISTRY)


def _obs(col: str) -> Column:
    return F.coalesce(F.col(col).cast("string"), F.lit("<null>"))


# --- normalization helpers (P2, P3, P12) -------------------------------------


def norm_blank_to_null(c: Column) -> Column:
    """P2: strip + ''->NULL (validation_utils.py:205-211)."""
    return F.nullif(F.trim(c), F.lit(""))


def norm_term_colon(c: Column) -> Column:
    """P3: one underscore->colon unless already colon-form
    (validation_utils.py:5-15)."""
    return F.when(c.contains(":"), c).otherwise(
        F.regexp_replace(c, "_", ":")
    )


def strip_timestamp(c: Column) -> Column:
    """P12: '2018-07-12 00:00:00' -> date part
    (pool_of_specimens_ruleset.py:60-62)."""
    return F.split(c, " ")[0]


# --- scalar predicates (P-kinds) ---------------------------------------------


@register("required")
def _required(cols, params):
    """P1: present & non-blank (validation_utils.py:214-223)."""
    c = F.col(cols[0])
    return c.isNull() | (F.trim(c) == ""), _obs(cols[0])


@register("enum")
def _enum(cols, params):
    """P4: Literal[...] domain membership (e.g. standard_ruleset.py:8-18).

    params: values: list[str], case_insensitive: bool=False,
    allow_null: bool=True (null handled by a separate `required` rule).
    """
    c = norm_blank_to_null(F.col(cols[0]).cast("string"))
    values = params["values"]
    if params.get("case_insensitive"):
        cond = ~F.lower(c).isin([v.lower() for v in values])
    else:
        cond = ~c.isin(values)
    cond = c.isNotNull() & cond  # presence is the `required` rule's job
    return cond, _obs(cols[0])


@register("numeric")
def _numeric(cols, params):
    """P6-P8: float-coercible, optional [min,max] bounds
    (validation_utils.py:50-117). A non-castable non-null string is a
    violation; bounds checked on the cast value.
    params: min, max (either optional).
    """
    raw = norm_blank_to_null(F.col(cols[0]).cast("string"))
    d = raw.try_cast("double")
    bad_cast = raw.isNotNull() & d.isNull()
    cond = bad_cast
    if (lo := params.get("min")) is not None:
        cond = cond | (d < F.lit(float(lo)))
    if (hi := params.get("max")) is not None:
        cond = cond | (d > F.lit(float(hi)))
    return cond, _obs(cols[0])


@register("conditional_upper_bound")
def _conditional_upper_bound(cols, params):
    """P9: unit-dependent range — water oxygen: treat as percentage
    (<=100) when small, mg/L otherwise (teleostei_post_hatching_ruleset.py:
    222-232). params: pct_max=100, abs_max.
    """
    d = F.col(cols[0]).try_cast("double")
    pct_max = float(params.get("pct_max", 100.0))
    abs_max = float(params["abs_max"])
    # negatives are owned by the paired numeric{min:0} rule (same layering
    # as the reference: teleostei_post_hatching_ruleset.py:219-232)
    return d.isNotNull() & (d > pct_max) & (d > abs_max), _obs(cols[0])


@register("regex")
def _regex(cols, params):
    """P10/P13/P14/P16: value must fully match pattern; params:
    pattern, allow: list of literal pass-through values, strip_time: bool,
    negate: bool — violation when the pattern DOES match (forbidden-
    pattern form). (validation_utils.py:150-202,
    generic_validator_classes.py:404-407)

    PERF: write forbidden-character rules in the negate form with a
    positive class ('[\\u0000-\\u001F]', negate) — the equivalent
    anchored negated-class match ('^[^\\u0000-\\u001F]*$') measured ~30x
    slower in Spark's regex path (~2.5us vs ~0.1us per row at 10^7 rows).
    """
    c = norm_blank_to_null(F.col(cols[0]).cast("string"))
    if params.get("strip_time"):
        c = strip_timestamp(c)
    if params.get("negate"):
        cond = c.isNotNull() & c.rlike(params["pattern"])
    else:
        cond = c.isNotNull() & ~c.rlike(params["pattern"])
    for a in params.get("allow", []):
        cond = cond & (c != F.lit(a))
    return cond, _obs(cols[0])


@register("date_by_unit")
def _date_by_unit(cols, params):
    """P10 cross-column: date format keyed on a unit column
    (validation_utils.py:150-174; organism_ruleset.py:231-235).
    columns=(date_col, unit_col); params: formats: {unit: regex},
    strip_time: bool.
    """
    date_c = norm_blank_to_null(F.col(cols[0]).cast("string"))
    if params.get("strip_time"):
        date_c = strip_timestamp(date_c)
    unit_c = F.col(cols[1])
    cond = F.lit(False)
    for unit, pat in params["formats"].items():
        cond = cond | ((unit_c == F.lit(unit)) & ~date_c.rlike(pat))
    return date_c.isNotNull() & cond, _obs(cols[0])


@register("date_calendar")
def _date_calendar(cols, params):
    """P11: format-matching string must be a real calendar date
    (organoid_ruleset.py:136-152). params: pattern (regex gate),
    format (to_date), strip_time."""
    c = norm_blank_to_null(F.col(cols[0]).cast("string"))
    if params.get("strip_time"):
        c = strip_timestamp(c)
    gate = c.rlike(params.get("pattern", r"^\d{4}-\d{2}-\d{2}$"))
    parsed = F.try_to_timestamp(c, F.lit(params.get("format", "yyyy-MM-dd")))
    return c.isNotNull() & gate & parsed.isNull(), _obs(cols[0])


@register("url")
def _url(cols, params):
    """P15: scheme allow-list (validation_utils.py:120-147; blank/None
    pass through per validate_url's early return)."""
    c = norm_blank_to_null(F.col(cols[0]).cast("string"))
    schemes = params.get("schemes", ["http", "https"])
    pat = "^(" + "|".join(schemes) + ")://"
    ok = c.rlike(pat)
    if "mailto" in schemes:
        ok = ok | c.startswith("mailto:")
    return c.isNotNull() & ~ok, _obs(cols[0])


@register("term_format")
def _term_format(cols, params):
    """P3+P16-style: ontology-ish id must match pattern after
    underscore->colon normalization (validation_utils.py:5-15;
    generic_validator_classes.py:404-407). params: pattern."""
    c = norm_term_colon(norm_blank_to_null(F.col(cols[0]).cast("string")))
    return c.isNotNull() & ~c.rlike(params["pattern"]), _obs(cols[0])


@register("consistency_map")
def _consistency_map(cols, params):
    """P18: value must equal mapping[key] (standard_ruleset.py:49-70
    material -> Term Source ID). columns=(key_col, value_col);
    params: mapping: {key: expected}."""
    key_c = norm_blank_to_null(F.col(cols[0]).cast("string"))
    val_c = norm_blank_to_null(F.col(cols[1]).cast("string"))
    mapping: dict[str, str] = params["mapping"]
    expected = F.lit(None).cast("string")
    for k, v in mapping.items():
        expected = F.when(key_c == F.lit(k), F.lit(v)).otherwise(expected)
    cond = expected.isNotNull() & val_c.isNotNull() & (val_c != expected)
    return cond, _obs(cols[1])


# --- cross-field (X-kinds) ----------------------------------------------------


@register("pair_required")
def _pair_required(cols, params):
    """X1/X2: text<->term both-or-neither (organism_ruleset.py:214-229).
    columns=(a, b)."""
    a = norm_blank_to_null(F.col(cols[0]).cast("string"))
    b = norm_blank_to_null(F.col(cols[1]).cast("string"))
    cond = (a.isNotNull() & b.isNull()) | (a.isNull() & b.isNotNull())
    obs = F.concat_ws("|", F.coalesce(a, F.lit("<null>")), F.coalesce(b, F.lit("<null>")))
    return cond, obs


@register("conditional_required")
def _conditional_required(cols, params):
    """X3: required-unless (organoid_ruleset.py:209-217: freezing date +
    protocol required unless method == 'fresh').
    columns=(cond_col, *required_cols); params: unless_values: list.
    A NULL or blank condition value means the requirement does not apply —
    the reference's `if freezing_method_value and ...` treats both None
    and '' as falsy (organoid_ruleset.py:212)."""
    cond_c = norm_blank_to_null(F.col(cols[0]).cast("string"))
    unless = params.get("unless_values", [])
    applies = cond_c.isNotNull() & ~cond_c.isin(unless)
    missing = F.lit(False)
    for rc in cols[1:]:
        v = norm_blank_to_null(F.col(rc).cast("string"))
        missing = missing | v.isNull()
    return applies & missing, _obs(cols[0])


# --- array / nested (A-kinds) --------------------------------------------------


def _arr(col: str) -> Column:
    """A1: normalize list — drop blank elements
    (specimen_ruleset.py:248-264)."""
    return F.filter(F.col(col), lambda x: F.trim(x.cast("string")) != "")


@register("array_size")
def _array_size(cols, params):
    """A2-A4/A7: cardinality bounds on an array column
    (organism_ruleset.py:249-260 child_of<=2; specimen_ruleset.py:266-270
    derived_from==1; pool_of_specimens_ruleset.py:90-94 >=1).
    params: min, max, eq (any subset)."""
    a = _arr(cols[0])
    n = F.size(a)
    cond = F.lit(False)
    if (eq := params.get("eq")) is not None:
        cond = cond | (n != int(eq))
    if (lo := params.get("min")) is not None:
        cond = cond | (n < int(lo))
    if (hi := params.get("max")) is not None:
        cond = cond | (n > int(hi))
    return F.col(cols[0]).isNotNull() & cond, n.cast("string")


@register("array_element_regex")
def _array_element_regex(cols, params):
    """A6: every element must match pattern (specimen_ruleset.py:284-295
    picture URLs). params: pattern."""
    a = _arr(cols[0])
    pat = params["pattern"]
    bad = F.exists(a, lambda x: ~x.cast("string").rlike(pat))
    obs = F.concat_ws(",", F.filter(a, lambda x: ~x.cast("string").rlike(pat)))
    return F.col(cols[0]).isNotNull() & bad, obs


@register("array_element_enum")
def _array_element_enum(cols, params):
    """A5 (pure-predicate part): every element in domain. params: values."""
    a = _arr(cols[0])
    values = params["values"]
    arr_lit = F.array(*[F.lit(v) for v in values])
    bad = F.exists(a, lambda x: ~F.array_contains(arr_lit, x.cast("string")))
    obs = F.concat_ws(
        ",", F.filter(a, lambda x: ~F.array_contains(arr_lit, x.cast("string")))
    )
    return F.col(cols[0]).isNotNull() & bad, obs


@register("expr")
def _expr(cols, params):
    """Escape hatch: raw SQL boolean expression (violated when true).
    params: sql, observed_sql (optional)."""
    cond = F.expr(params["sql"])
    obs = F.expr(params["observed_sql"]) if params.get("observed_sql") else _obs(cols[0])
    return cond, obs.cast("string")
