"""J8 (parent-attribute match) and J9 (1-hop circularity) self-join rules."""

from __future__ import annotations

from faang_pydantics_validation_spark.operators.joins import (
    circular_reference_rule,
    self_join_parent_match,
)


def test_self_join_parent_match(spark):
    # generic_validator_classes.py:539-550 — child species must equal parent's
    entities = spark.createDataFrame(
        [
            ("A", None, "cattle"),
            ("B", "A", "cattle"),   # ok
            ("C", "A", "chicken"),  # mismatch
            ("D", "Z", "cattle"),   # dangling parent: J6's job, skipped here
        ],
        "name string, parent string, species string",
    )
    out = self_join_parent_match(entities, "name", "parent", "species", "R_parent_species")
    got = {(r["conv_id"], r["observed"]) for r in out.collect()}
    assert got == {("C", "chicken!=cattle")}


def test_circular_reference(spark):
    # generic_validator_classes.py:561-574 — A lists B while B lists A
    entities = spark.createDataFrame(
        [
            ("A", ["B"]),
            ("B", ["A", "C"]),
            ("C", []),
            ("D", ["C"]),
        ],
        "name string, parents array<string>",
    )
    out = circular_reference_rule(entities, "name", "parents", "R_circular")
    got = {(r["conv_id"], r["observed"]) for r in out.collect()}
    # both directions of the A<->B cycle are reported, D->C is fine
    assert got == {("A", "A<->B"), ("B", "B<->A")}
