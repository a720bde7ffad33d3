"""Ontology-style dimension rules: the reference's OLS-backed term checks
(SURVEY.md J2/J4/A5) re-expressed over a pre-materialized term dimension.

The reference resolves each term against the OLS REST API with allowed-
class ("graph_restriction") filters per field
(generic_validator_classes.py:27-64,82-121; prefix routing at
organism_ruleset.py:118-164). Here the ontology is a broadcast dim with a
precomputed transitive-closure column, so subclass checks are a single
F.arrays_overlap — no graph traversal at query time.

dim_terms schema:
    term:      string  ('NCBITaxon:9913')
    label:     string  ('Bos taurus')
    ontology:  string  ('NCBITaxon')
    is_a_path: array<string>  — ancestors incl. self (transitive closure)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..rules.library import norm_term_colon
from ..rules.spec import SENTINELS
from .joins import _emit


def prefix_route_rule(
    facts: DataFrame,
    fact_col: str,
    allowed_prefixes_by_ontology: dict[str, list[str]],
    rule_id: str,
    severity: str = "error",
    ds: bool = True,
) -> DataFrame:
    """J2: the term's prefix (before ':') decides which ontologies are
    legal for this field (organism_ruleset.py:118-164: NCBITaxon for
    organism, PATO for sex, LBO for breed...). Pure expression — the
    prefix routing table is tiny and becomes an isin per field."""
    term = norm_term_colon(F.col(fact_col).cast("string"))
    prefix = F.split(term, ":")[0]
    allowed = sorted({p for ps in allowed_prefixes_by_ontology.values() for p in ps})
    probe = facts.where(
        F.col(fact_col).isNotNull() & ~F.col(fact_col).cast("string").isin(SENTINELS)
    )
    bad = probe.where(~prefix.isin(allowed))
    return _emit(bad, rule_id, severity, "turn", F.col(fact_col), ds)


def subclass_restriction_rule(
    facts: DataFrame,
    dim_terms: DataFrame,
    fact_col: str,
    allowed_classes: list[str],
    rule_id: str,
    severity: str = "error",
    ds: bool = True,
) -> DataFrame:
    """J4: term must descend from one of allowed_classes — the Elixir
    graph_restriction check (generic_validator_classes.py:27-64), made
    O(1) per row by the precomputed is_a_path closure column. Terms not
    in the dim are J1's problem (skipped here: inner join)."""
    term = norm_term_colon(F.col(fact_col).cast("string"))
    probe = facts.where(
        F.col(fact_col).isNotNull() & ~F.col(fact_col).cast("string").isin(SENTINELS)
    ).withColumn("__k", term)
    joined = probe.join(
        F.broadcast(dim_terms.select(F.col("term").alias("__k"), "is_a_path")),
        on="__k",
        how="inner",
    )
    allowed_lit = F.array(*[F.lit(c) for c in allowed_classes])
    bad = joined.where(~F.arrays_overlap(F.col("is_a_path"), allowed_lit))
    return _emit(bad, rule_id, severity, "turn", F.col(fact_col), ds)


def keyed_subclass_rule(
    facts: DataFrame,
    dim_terms: DataFrame,
    key_col: str,
    term_col: str,
    key_to_class: dict[str, str],
    rule_id: str,
    severity: str = "error",
    ds: bool = True,
) -> DataFrame:
    """J5: a key column selects the required ancestor class — the
    species->breed compatibility check (SPECIES_BREED_LINKS,
    constants.py:230-238; generic_validator_classes.py:277-301): the
    organism's species term maps to an LBO class the breed term must
    descend from."""
    key = norm_term_colon(F.col(key_col).cast("string"))
    required = F.lit(None).cast("string")
    for k, cls in key_to_class.items():
        required = F.when(key == F.lit(k), F.lit(cls)).otherwise(required)
    term = norm_term_colon(F.col(term_col).cast("string"))
    probe = (
        facts.where(
            F.col(term_col).isNotNull()
            & ~F.col(term_col).cast("string").isin(SENTINELS)
        )
        .withColumn("__req", required)
        .where(F.col("__req").isNotNull())
        .withColumn("__k", term)
    )
    joined = probe.join(
        F.broadcast(dim_terms.select(F.col("term").alias("__k"), "is_a_path")),
        on="__k",
        how="inner",
    )
    bad = joined.where(~F.array_contains(F.col("is_a_path"), F.col("__req")))
    obs = F.concat(F.col(term_col), F.lit("!under!"), F.col("__req"))
    return _emit(bad, rule_id, severity, "turn", obs, ds)


def nested_elements_rule(
    facts: DataFrame,
    dim_terms: DataFrame,
    array_col: str,
    rule_id_exists: str,
    rule_id_label: str,
    key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    ds: bool = True,
) -> DataFrame:
    """A5: validate each {text, term} element of a nested array (Health
    Status / Cell Type lists, organism_ruleset.py:22-43): explode, check
    term existence (error) and text<->label match (warning), re-emit per
    element. One explode + one broadcast join."""
    keys = list(key_cols) + (["ds"] if ds else [])
    ex = facts.select(*keys, F.explode(array_col).alias("e")).select(
        *keys,
        norm_term_colon(F.col("e.term").cast("string")).alias("__k"),
        F.col("e.text").alias("__text"),
    )
    dim = F.broadcast(
        dim_terms.select(F.col("term").alias("__k"), F.col("label").alias("__label"))
    )
    joined = ex.join(dim, on="__k", how="left")
    missing = _emit(
        joined.where(F.col("__k").isNotNull() & F.col("__label").isNull()),
        rule_id_exists,
        "error",
        "turn",
        F.col("__k"),
        ds,
    )
    mismatch = _emit(
        joined.where(
            F.col("__label").isNotNull()
            & (F.lower(F.col("__text")) != F.lower(F.col("__label")))
        ),
        rule_id_label,
        "warning",
        "turn",
        F.col("__text"),
        ds,
    )
    return missing.unionByName(mismatch)


def build_term_closure(edges: DataFrame, max_depth: int = 12) -> DataFrame:
    """Offline dim-builder: (child, parent) is-a edges -> is_a_path
    transitive closure per term via iterative self-joins (bounded depth —
    ontologies are shallow DAGs). This is the batch job that would refresh
    dim_terms; runtime rules only ever read the closure column."""
    paths = edges.select(
        F.col("child").alias("term"), F.array("child", "parent").alias("is_a_path")
    )
    frontier = edges.select(F.col("child").alias("term"), F.col("parent").alias("anc"))
    for _ in range(max_depth):
        nxt = (
            frontier.join(
                edges.select(F.col("child").alias("anc"), F.col("parent").alias("anc2")),
                on="anc",
            )
            .select("term", F.col("anc2").alias("anc"))
            .distinct()
        )
        new = nxt.join(frontier, on=["term", "anc"], how="left_anti")
        if new.isEmpty():
            break
        frontier = frontier.unionByName(new)
    closure = frontier.groupBy("term").agg(
        F.array_sort(F.collect_set("anc")).alias("ancs")
    )
    return paths.select("term").distinct().join(closure, on="term", how="left").select(
        "term",
        F.array_sort(
            F.array_union(F.coalesce(F.col("ancs"), F.array()), F.array(F.col("term")))
        ).alias("is_a_path"),
    )
