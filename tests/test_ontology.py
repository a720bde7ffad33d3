"""J2/J4/J5/A5 ontology-dimension rules (SURVEY.md §2.5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from faang_pydantics_validation_spark.operators import ontology as O


def _dim(spark):
    rows = [
        ("LBO:0000001", "cattle breed root", "LBO", ["LBO:0000000", "LBO:0000001"]),
        ("LBO:0000099", "angus", "LBO", ["LBO:0000000", "LBO:0000001", "LBO:0000099"]),
        ("LBO:0000002", "chicken breed root", "LBO", ["LBO:0000000", "LBO:0000002"]),
        ("LBO:0000055", "leghorn", "LBO", ["LBO:0000000", "LBO:0000002", "LBO:0000055"]),
        ("PATO:0000384", "male", "PATO", ["PATO:0000047", "PATO:0000384"]),
    ]
    return spark.createDataFrame(
        rows, "term string, label string, ontology string, is_a_path array<string>"
    )


def _facts(spark, rows, schema="conv_id string, turn_idx int, term string"):
    return spark.createDataFrame(rows, schema).withColumn("ds", F.lit("d"))


def test_prefix_route(spark):
    facts = _facts(spark, [("c", 0, "PATO:0000384"), ("c", 1, "EFO:0001"), ("c", 2, "PATO_0000384")])
    out = O.prefix_route_rule(
        facts, "term", {"pato": ["PATO"], "lbo": ["LBO"]}, "R_prefix"
    ).collect()
    assert [(r["conv_id"], r["turn_idx"], r["observed"]) for r in out] == [("c", 1, "EFO:0001")]


def test_subclass_restriction(spark):
    facts = _facts(
        spark,
        [("c", 0, "LBO:0000099"), ("c", 1, "LBO:0000055"), ("c", 2, "LBO_0000099"), ("c", 3, "XX:1")],
    )
    out = O.subclass_restriction_rule(
        facts, _dim(spark), "term", ["LBO:0000001"], "R_subclass"
    ).collect()
    # 0099 is under 0000001 (pass, also via underscore normalization at row 2);
    # 0055 is under 0000002 only (fail); XX:1 unknown term -> J1's job, skipped
    assert [(r["turn_idx"], r["observed"]) for r in out] == [(1, "LBO:0000055")]


def test_keyed_subclass_species_breed(spark):
    facts = spark.createDataFrame(
        [
            ("c", 0, "NCBITaxon:9913", "LBO:0000099"),  # cattle + angus: ok
            ("c", 1, "NCBITaxon:9913", "LBO:0000055"),  # cattle + leghorn: fail
            ("c", 2, "NCBITaxon:9031", "LBO:0000055"),  # chicken + leghorn: ok
            ("c", 3, "NCBITaxon:0000", "LBO:0000055"),  # unmapped species: skip
        ],
        "conv_id string, turn_idx int, species string, breed string",
    ).withColumn("ds", F.lit("d"))
    out = O.keyed_subclass_rule(
        facts,
        _dim(spark),
        "species",
        "breed",
        {"NCBITaxon:9913": "LBO:0000001", "NCBITaxon:9031": "LBO:0000002"},
        "R_species_breed",
    ).collect()
    assert [(r["turn_idx"], r["observed"]) for r in out] == [
        (1, "LBO:0000055!under!LBO:0000001")
    ]


def test_nested_elements(spark):
    facts = spark.createDataFrame(
        [
            ("c", 0, [("male", "PATO:0000384")]),                  # ok
            ("c", 1, [("MALE", "PATO:0000384")]),                  # case-insensitive ok
            ("c", 2, [("female", "PATO:0000384")]),                # label mismatch -> warning
            ("c", 3, [("x", "PATO:9999999"), ("male", "PATO_0000384")]),  # missing + ok
        ],
        "conv_id string, turn_idx int, hs array<struct<text:string,term:string>>",
    ).withColumn("ds", F.lit("d"))
    out = O.nested_elements_rule(facts, _dim(spark), "hs", "R_hs_exists", "R_hs_label")
    got = {(r["turn_idx"], r["rule_id"], r["severity"], r["observed"]) for r in out.collect()}
    assert got == {
        (2, "R_hs_label", "warning", "female"),
        (3, "R_hs_exists", "error", "PATO:9999999"),
    }


def test_build_term_closure(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("x", "a")], "child string, parent string"
    )
    closure = {r["term"]: r["is_a_path"] for r in O.build_term_closure(edges).collect()}
    assert closure["d"] == ["a", "b", "c", "d"]
    assert closure["x"] == ["a", "x"]
    assert closure["b"] == ["a", "b"]
