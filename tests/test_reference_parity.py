"""Differential parity with the reference's OWN test data (SURVEY.md §5.3):
run this engine's rule kinds over /root/reference/json_files/new_example.json
and assert the same per-record verdict classes, error rules, warnings, and
relationship errors that the reference's golden output
(/root/reference/validation_results.json) records:

  organism:  3 total, ECA_UKY_H11 INVALID (Secondary Project enum),
             ECA_UKY_H1 + OCU_INRAE_PND18 VALID with 2 recommended-missing
             warnings each, 1 relationship error (H1 lists itself in
             Child Of -> circular, generic_validator_classes.py:561-574)
  organoid:  2 total, OCU_INRAE_S2 INVALID (Organ Model term prefix not
             UBERON/BTO, organoid_ruleset prefix routing) + missing
             Derived From ref (J6)
  teleostei_post_hatching: 2 total, #1 INVALID (Term Source ID enum +
             non-numeric Sampling Weight) with an ontology label-mismatch
             warning ('normal' vs 'absent' for PATO:0000462)

Scalar/array/cross-field rules are DATA, loaded from the checked-in
ruleset documents (rulesets/*.rules.json — the analog of the reference's
rulesets-json/*.json), proving "one engine, many rulesets" without test
code declaring rules; the join/ontology relationship passes stay code, as
they do in the reference.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from faang_pydantics_validation_spark.operators.joins import (
    anti_join_rule,
    circular_reference_rule,
)
from faang_pydantics_validation_spark.operators.ontology import (
    nested_elements_rule,
    prefix_route_rule,
)
from faang_pydantics_validation_spark.rules.compiler import compile_row_rules
from faang_pydantics_validation_spark.rules.loader import load_ruleset

REF = "/root/reference/json_files/new_example.json"
GOLDEN = "/root/reference/validation_results.json"
RULESETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "rulesets")


def _ruleset(name: str):
    return load_ruleset(os.path.join(RULESETS, f"{name}.rules.json"))


@pytest.fixture(scope="module")
def ref_data():
    return json.load(open(REF))


@pytest.fixture(scope="module")
def golden():
    return json.load(open(GOLDEN))["validation_results"]


def _df(spark, rows, cols, schema):
    data = [tuple(r.get(c) for c in cols) for r in rows]
    return spark.createDataFrame(data, schema)


ORGANISM_ALIASES = {
    "sample_name": "Sample Name", "material": "Material",
    "term": "Term Source ID", "project": "Project",
    "secondary_project": "Secondary Project", "availability": "Availability",
    "organism": "Organism", "organism_term": "Organism Term Source ID",
    "sex": "Sex", "sex_term": "Sex Term Source ID",
    "birth_date": "Birth Date", "unit": "Unit",
    "breed": "Breed", "breed_term": "Breed Term Source ID",
    "birth_location_latitude": "Birth Location Latitude",
    "birth_location_latitude_unit": "Birth Location Latitude Unit",
    "birth_location_longitude": "Birth Location Longitude",
    "birth_location_longitude_unit": "Birth Location Longitude Unit",
    "birth_weight": "Birth Weight", "birth_weight_unit": "Birth Weight Unit",
    "placental_weight": "Placental Weight",
    "placental_weight_unit": "Placental Weight Unit",
    "pregnancy_length": "Pregnancy Length",
    "pregnancy_length_unit": "Pregnancy Length Unit",
    "delivery_timing": "Delivery Timing", "delivery_ease": "Delivery Ease",
    "pedigree": "Pedigree",
}


def test_organism_sheet_parity(spark, ref_data, golden):
    rows = ref_data["organism"]
    # the FULL shipped organism ruleset (37 rules transcribing
    # organism_ruleset.py:46-281: core metadata, NCBITaxon/PATO/LBO term
    # formats, birth date by unit, lat/lon ranges, weight/length numerics +
    # unit enums, delivery enums, breed pairing, child_of cardinality,
    # pedigree URL) over every column the golden sheet carries
    rules = _ruleset("organism")
    df = _sheet_df(spark, rows, rules, ORGANISM_ALIASES).withColumn(
        "conv_id", F.col("sample_name")
    ).withColumn("turn_idx", F.lit(0))
    v = compile_row_rules(df, rules, key_cols=("conv_id", "turn_idx"), partition_col=None)
    by_sample: dict[str, dict[str, set]] = {}
    for r in v.collect():
        d = by_sample.setdefault(r["conv_id"], {"error": set(), "warning": set()})
        d[r["severity"]].add(r["rule_id"])

    # circular child_of (J9)
    ents = df.select(
        F.col("sample_name").alias("name"),
        F.coalesce(F.col("child_of"), F.array()).alias("parents"),
    )
    circ = {r["conv_id"] for r in circular_reference_rule(ents, "name", "parents", "R_circular").collect()}
    # referential existence of child_of (J6) against the batch
    names = df.select(F.col("sample_name").alias("id"))
    exploded = df.select("conv_id", F.lit(0).alias("turn_idx"),
                         F.explode("child_of").alias("ref"))
    missing_refs = {r["conv_id"] for r in anti_join_rule(exploded, names, "ref", "id", "R_ref", ds=False).collect()}

    g = golden["results_by_type"]["organism"]
    golden_invalid = {e["sample_name"] for e in g["invalid_organisms"]}
    golden_valid = {e["sample_name"] for e in g["valid_organisms"]}

    engine_invalid = {s for s, d in by_sample.items() if d["error"]}
    assert engine_invalid == golden_invalid == {"ECA_UKY_H11"}
    assert by_sample["ECA_UKY_H11"]["error"] == {"R_secondary_project"}

    # both golden-valid records carry exactly the two breed warnings
    for s in golden_valid:
        assert by_sample[s]["warning"] == {"W_breed", "W_breed_term"}, s
        assert not by_sample[s]["error"]

    # relationship errors: golden reports exactly one (H1's circular listing)
    assert circ == {"ECA_UKY_H1"}
    assert missing_refs == set()
    assert g["summary"] == {"total": 3, "valid": 2, "invalid": 1,
                            "warnings": 2, "relationship_errors": 1}


ORGANOID_ALIASES = {
    "sample_name": "Sample Name", "material": "Material",
    "term": "Term Source ID", "project": "Project",
    "secondary_project": "Secondary Project", "availability": "Availability",
    "organ_model": "Organ Model",
    "organ_model_term": "Organ Model Term Source ID",
    "organ_part_model": "Organ Part Model",
    "organ_part_model_term": "Organ Part Model Term Source ID",
    "freezing_method": "Freezing Method",
    "freezing_date": "Freezing Date", "freezing_date_unit": "Unit",
    "freezing_protocol": "Freezing Protocol",
    "organoid_passage": "Organoid Passage",
    "organoid_passage_unit": "Organoid Passage Unit",
    "organoid_passage_protocol": "Organoid Passage Protocol",
    "organoid_culture_and_passage_protocol": "Organoid Culture And Passage Protocol",
    "type_of_organoid_culture": "Type Of Organoid Culture",
    "growth_environment": "Growth Environment",
    "number_of_frozen_cells": "Number Of Frozen Cells",
    "number_of_frozen_cells_unit": "Number Of Frozen Cells Unit",
}


def test_organoid_sheet_parity(spark, ref_data, golden):
    rows = ref_data["organoid"]
    rules = _ruleset("organoid")
    df = _sheet_df(spark, rows, rules, ORGANOID_ALIASES).withColumn(
        "conv_id", F.col("sample_name")
    ).withColumn("turn_idx", F.lit(0)).withColumn("ds", F.lit("d"))

    # prefix routing: organ model term must be UBERON or BTO
    # (organoid ruleset; golden error on 'UBERONx:0001153') — routing stays
    # a code-side ontology pass (J2), as in the reference's OntologyValidator
    pref = prefix_route_rule(df, "organ_model_term", {"organ": ["UBERON", "BTO"]},
                             "R_organ_model_prefix")
    errors = {r["conv_id"]: r["observed"] for r in pref.collect()}

    # the FULL shipped organoid ruleset (33 rules transcribing
    # organoid_ruleset.py:17-228: freezing-method/growth-environment/culture
    # enums, passage numeric+unit, protocol URLs, freezing date by unit +
    # real-calendar, X3 conditional freezing, X2 organ-part pairing,
    # derived_from == 1) must emit ZERO rows on the two golden records —
    # both are 'fresh' with sentinel freezing fields and valid values
    x3 = compile_row_rules(
        df, rules, key_cols=("conv_id", "turn_idx"), partition_col=None
    )
    assert x3.count() == 0

    # J6: derived_from must exist in the batch (organism + specimen + organoid)
    batch_names = [r["Sample Name"] for sheet in
                   ("organism", "specimen_from_organism", "organoid")
                   for r in ref_data[sheet]]
    dim = spark.createDataFrame([(n,) for n in batch_names], "id string")
    probe = df.select("conv_id", "turn_idx", "ds",
                      F.explode("derived_from").alias("ref"))
    missing = anti_join_rule(probe, dim, "ref", "id", "R_derived_exists", ds=False)
    missing_by = {r["conv_id"]: r["observed"] for r in missing.collect()}

    g = golden["results_by_type"]["organoid"]
    golden_invalid = {e["sample_name"] for e in g["invalid_organoids"]}
    assert set(errors) == golden_invalid == {"OCU_INRAE_S2"}
    assert errors["OCU_INRAE_S2"] == "UBERONx:0001153"
    assert missing_by == {"OCU_INRAE_S2": "OCU_INRAE_PND18_S19"}
    assert g["summary"]["relationship_errors"] == 1


TPH_ALIASES = {
    "sample_name": "Sample Name", "material": "Material",
    "term": "Term Source ID", "project": "Project",
    "secondary_project": "Secondary Project", "availability": "Availability",
    "unit": "Unit",
    "specimen_collection_date": "Specimen Collection Date",
    "geographic_location": "Geographic Location",
    "animal_age_at_collection": "Animal Age At Collection",
    "animal_age_at_collection_unit": "Animal Age At Collection Unit",
    "developmental_stage": "Developmental Stage",
    "organism_part": "Organism Part",
    "specimen_collection_protocol": "Specimen Collection Protocol",
    "fasted_status": "Fasted Status", "number_of_pieces": "Number of Pieces",
    "specimen_volume": "Specimen Volume",
    "specimen_volume_unit": "Specimen Volume Unit",
    "specimen_size": "Specimen Size", "specimen_size_unit": "Specimen Size Unit",
    "specimen_weight": "Specimen Weight",
    "specimen_weight_unit": "Specimen Weight Unit",
    "gestational_age_at_sample_collection": "Gestational Age At Sample Collection",
    "gestational_age_at_sample_collection_unit": "Gestational Age At Sample Collection Unit",
    "average_incubation_temperature": "Average Incubation temperature",
    "average_incubation_temperature_unit": "Average Incubation temperature Unit",
    "average_incubation_humidity": "Average Incubation Humidity",
    "average_incubation_humidity_unit": "Average Incubation Humidity Unit",
    "embryonic_stage": "Embryonic Stage",
    "embryonic_stage_unit": "Embryonic Stage Unit",
    "origin": "Origin", "reproductive_strategy": "Reproductive Strategy",
    "gonad_type": "Gonad Type", "hatching": "Hatching",
    "maturity_state": "Maturity State",
    "maturity_state_term": "Maturity State Term Source ID",
    "time_post_fertilisation": "Time Post Fertilisation",
    "time_post_fertilisation_unit": "Time Post Fertilisation Unit",
    "post_hatching_animal_density": "Post-hatching Animal Density",
    "post_hatching_animal_density_unit": "Post-hatching Animal Density Unit",
    "food_restriction": "Food Restriction",
    "food_restriction_unit": "Food Restriction Unit",
    "post_hatching_water_temperature_average": "Post-hatching Water Temperature Average",
    "post_hatching_water_temperature_average_unit": "Post-hatching Water Temperature Average Unit",
    "average_water_salinity": "Average Water Salinity",
    "average_water_salinity_unit": "Average Water Salinity Unit",
    "photoperiod": "Photoperiod",
    "sampling_weight": "Sampling Weight",
    "sampling_weight_unit": "Sampling Weight Unit",
    "method_of_euthanasia": "Method Of Euthanasia",
    "generations_from_wild": "Generations From Wild",
    "generations_from_wild_unit": "Generations From Wild Unit",
    "standard_length": "Standard Length",
    "standard_length_unit": "Standard Length Unit",
    "total_length": "Total Length", "total_length_unit": "Total Length Unit",
    "fork_length": "Fork Length", "fork_length_unit": "Fork Length Unit",
    "water_rearing_system": "Water Rearing System",
    "average_water_oxygen": "Average Water Oxygen",
    "average_water_oxygen_unit": "Average Water Oxygen Unit",
    "sampling_day_start_time": "Sampling Day Start Time",
    "sampling_day_end_time": "Sampling Day End Time",
    "anaesthetic_or_sedative_name": "Anaesthetic Or Sedative Name",
}


def test_teleostei_post_hatching_parity(spark, ref_data, golden):
    rows = ref_data["teleostei_post_hatching"]
    # the FULL shipped post-hatching ruleset (73 rules: the inherited
    # specimen core block + teleostei_post_hatching_ruleset.py:16-232
    # transcriptions — gonad/origin/euthanasia/anaesthetic enums, maturity
    # PATO term format, density/food/temperature/salinity/length numerics
    # with unit enums, photoperiod, HH:MM sampling times, water oxygen)
    rules = _ruleset("teleostei_post_hatching")
    df = _sheet_df(spark, rows, rules, TPH_ALIASES).withColumn(
        "conv_id", F.col("sample_name")
    ).withColumn("turn_idx", F.lit(0)).withColumn("ds", F.lit("d"))
    v = compile_row_rules(df, rules, key_cols=("conv_id", "turn_idx"), partition_col=None)
    by_sample: dict[str, set] = {}
    for r in v.collect():
        by_sample.setdefault(r["conv_id"], set()).add(r["rule_id"])

    # A5/J3: nested Health Status label match against the PATO dim
    dim_terms = spark.createDataFrame(
        [("PATO:0000461", "normal", "PATO", ["PATO:0000461"]),
         ("PATO:0000462", "absent", "PATO", ["PATO:0000462"])],
        "term string, label string, ontology string, is_a_path array<string>",
    )
    nested = nested_elements_rule(df, dim_terms, "health_status",
                                  "R_hs_exists", "R_hs_label")
    nested_by = {(r["conv_id"], r["rule_id"]) for r in nested.collect()}

    g = golden["results_by_type"]["teleostei_post_hatching"]
    golden_invalid = {e["sample_name"] for e in g["invalid_teleostei_post_hatchings"]}
    assert set(by_sample) == golden_invalid == {"teleostei_post_hatching_1"}
    # R_material_term fires alongside R_term_source_enum: both are facets
    # of the same broken Term Source ID ('OBI_0001479777'); the reference's
    # Pydantic stops at the Literal failure and skips validate_material_term
    # for the already-failed field, while this engine evaluates every rule
    # independently — the record-level verdict is identical
    assert by_sample["teleostei_post_hatching_1"] == {
        "R_term_source_enum", "R_material_term", "R_sampling_weight",
    }
    # golden ontology warning: 'normal' vs label 'absent' for PATO:0000462
    # (term arrives in underscore form -> P3 normalization inside the rule)
    assert nested_by == {("teleostei_post_hatching_1", "R_hs_label")}


def test_backfilled_rulesets_seeded_violations(spark, ref_data):
    """Negative controls for the back-filled organism / organoid /
    teleostei_post_hatching rulesets: corrupt fields of golden-valid
    records and assert exactly those rules fire — without seeding, the
    all-valid golden rows would leave most of the new rules vacuously
    green (the test_teleostei_embryo_seeded_violations pattern)."""
    # organism: out-of-range latitude, enum miss, bad URL scheme, non-PATO sex
    orows = [dict(ref_data["organism"][1])]
    orows[0]["Birth Location Latitude"] = "95"
    orows[0]["Delivery Ease"] = "teleportation"
    orows[0]["Pedigree"] = "gopher://pedigree.example"
    orows[0]["Sex Term Source ID"] = "EFO_0000383"
    rules = _ruleset("organism")
    df = _sheet_df(spark, orows, rules, ORGANISM_ALIASES).withColumn(
        "conv_id", F.col("sample_name")).withColumn("turn_idx", F.lit(0))
    v = compile_row_rules(df, rules, key_cols=("conv_id", "turn_idx"), partition_col=None)
    fired = {r["rule_id"] for r in v.collect() if r["severity"] == "error"}
    assert fired == {"R_lat", "R_delivery_ease", "R_pedigree_url",
                     "R_sex_term_format"}, fired

    # organoid: enum misses + negative passage on the otherwise-clean S1
    arows = [dict(ref_data["organoid"][0])]
    arows[0]["Freezing Method"] = "microwave"
    arows[0]["Organoid Passage"] = "-1"
    arows[0]["Growth Environment"] = "lava"
    rules = _ruleset("organoid")
    df = _sheet_df(spark, arows, rules, ORGANOID_ALIASES).withColumn(
        "conv_id", F.col("sample_name")).withColumn("turn_idx", F.lit(0))
    v = compile_row_rules(df, rules, key_cols=("conv_id", "turn_idx"), partition_col=None)
    fired = {r["rule_id"] for r in v.collect() if r["severity"] == "error"}
    assert fired == {"R_freezing_method", "R_organoid_passage",
                     "R_growth_environment"}, fired

    # post-hatching: enum miss, euthanasia miss, HH:MM violation,
    # non-PATO maturity term, out-of-range photoperiod hours
    trows = [dict(ref_data["teleostei_post_hatching"][1])]
    trows[0]["Gonad Type"] = "brain"
    trows[0]["Method Of Euthanasia"] = "old age"
    trows[0]["Sampling Day Start Time"] = "25:61"
    trows[0]["Maturity State Term Source ID"] = "EFO:0001701"
    trows[0]["Photoperiod"] = "99L:12D"
    rules = _ruleset("teleostei_post_hatching")
    df = _sheet_df(spark, trows, rules, TPH_ALIASES).withColumn(
        "conv_id", F.col("sample_name")).withColumn("turn_idx", F.lit(0))
    v = compile_row_rules(df, rules, key_cols=("conv_id", "turn_idx"), partition_col=None)
    fired = {r["rule_id"] for r in v.collect() if r["severity"] == "error"}
    assert fired == {"R_gonad_type", "R_euthanasia", "R_sampling_start_time",
                     "R_maturity_state_term_format", "R_photoperiod"}, fired


def test_organism_biosample_export_parity(spark, ref_data):
    """Byte-level S7 parity: the valid new_example.json organism records
    run through export_organism_biosample and must equal the reference's
    golden biosample_exports payloads KEY-FOR-KEY (validation_results.json
    'biosample_exports'.organism, produced by organism_validator.py:36-95
    via unified_validator.py:252-269): OBO PURL expansion, unit carriage,
    conditional omission of blank birth date / breed / health status /
    relationships. to_json drops NULL struct fields, which IS the
    reference's key-omission semantics."""
    from faang_pydantics_validation_spark.plans.verdicts import (
        export_organism_biosample,
    )

    rules = _ruleset("organism")
    rows = ref_data["organism"]
    df = _sheet_df(spark, rows, rules, ORGANISM_ALIASES)
    v = compile_row_rules(
        df.withColumn("conv_id", F.col("sample_name")).withColumn("turn_idx", F.lit(0)),
        rules, key_cols=("conv_id", "turn_idx"), partition_col=None,
    )
    bad = sorted({r["conv_id"] for r in v.collect() if r["severity"] == "error"})
    exp = export_organism_biosample(
        df.where(~F.col("sample_name").cast("string").isin(bad))
    )
    got = {
        r["sample_name"]: json.loads(r["js"])
        for r in exp.select(
            "sample_name", F.to_json("biosample_format").alias("js")
        ).collect()
    }
    want = {
        e["sample_name"]: e["biosample_format"]
        for e in json.load(open(GOLDEN))["biosample_exports"]["organism"]
    }
    assert got == want, {k: (got.get(k), want.get(k)) for k in set(got) ^ set(want) or got}


# ---- byte-level BioSamples export parity, all five exported types ----------

_EXPORT_CORE = {
    "sample_name": "Sample Name", "material": "Material",
    "term": "Term Source ID",
}
_EXPORT_SPECIMEN_BASE = {
    **_EXPORT_CORE,
    "specimen_collection_date": "Specimen Collection Date", "unit": "Unit",
    "geographic_location": "Geographic Location",
    "animal_age_at_collection": "Animal Age At Collection",
    "animal_age_at_collection_unit": "Animal Age At Collection Unit",
    "developmental_stage": "Developmental Stage",
    "developmental_stage_term": "Developmental Stage Term Source ID",
    "organism_part": "Organism Part",
    "organism_part_term": "Organism Part Term Source ID",
    "specimen_collection_protocol": "Specimen Collection Protocol",
}
EXPORT_ALIASES = {
    "organism": {
        **_EXPORT_CORE,
        "organism": "Organism", "organism_term": "Organism Term Source ID",
        "sex": "Sex", "sex_term": "Sex Term Source ID",
        "birth_date": "Birth Date", "unit": "Unit",
        "breed": "Breed", "breed_term": "Breed Term Source ID",
    },
    "organoid": {
        **{k: v for k, v in ORGANOID_ALIASES.items()
           if k not in ("project", "secondary_project", "availability")},
        "organoid_morphology": "Organoid Morphology",
    },
    "specimen_from_organism": {
        **_EXPORT_SPECIMEN_BASE,
        "fasted_status": "Fasted Status",
        "number_of_pieces": "Number of Pieces",
        "number_of_pieces_unit": "Number of Pieces Unit",
        "specimen_volume": "Specimen Volume",
        "specimen_volume_unit": "Specimen Volume Unit",
        "specimen_size": "Specimen Size",
        "specimen_size_unit": "Specimen Size Unit",
        "specimen_weight": "Specimen Weight",
        "specimen_weight_unit": "Specimen Weight Unit",
        "gestational_age_at_sample_collection": "Gestational Age At Sample Collection",
        "gestational_age_at_sample_collection_unit": "Gestational Age At Sample Collection Unit",
        "average_incubation_temperature": "Average Incubation temperature",
        "average_incubation_temperature_unit": "Average Incubation temperature Unit",
        "average_incubation_humidity": "Average Incubation Humidity",
        "average_incubation_humidity_unit": "Average Incubation Humidity Unit",
        "embryonic_stage": "Embryonic Stage",
        "embryonic_stage_unit": "Embryonic Stage Unit",
    },
    "teleostei_embryo": {
        **_EXPORT_SPECIMEN_BASE,
        "origin": "Origin", "reproductive_strategy": "Reproductive Strategy",
        "hatching": "Hatching",
        "time_post_fertilisation": "Time Post Fertilisation",
        "time_post_fertilisation_unit": "Time Post Fertilisation Unit",
        "pre_hatching_water_temperature_average": "Pre-hatching Water Temperature Average",
        "pre_hatching_water_temperature_average_unit": "Pre-hatching Water Temperature Average Unit",
        "post_hatching_water_temperature_average": "Post-hatching Water Temperature Average",
        "post_hatching_water_temperature_average_unit": "Post-hatching Water Temperature Average Unit",
        "degree_days": "Degree Days", "degree_days_unit": "Degree Days Unit",
        "growth_media": "Growth Media",
        "medium_replacement_frequency": "Medium Replacement Frequency",
        "medium_replacement_frequency_unit": "Medium Replacement Frequency Unit",
        "percentage_total_somite_number": "Percentage Total Somite Number",
        "percentage_total_somite_number_unit": "Percentage Total Somite Number Unit",
        "average_water_salinity": "Average Water Salinity",
        "average_water_salinity_unit": "Average Water Salinity Unit",
        "photoperiod": "Photoperiod",
        "generations_from_wild": "Generations From Wild",
        "generations_from_wild_unit": "Generations From Wild Unit",
    },
    "teleostei_post_hatching": {
        **_EXPORT_SPECIMEN_BASE,
        **{k: v for k, v in (
            ("origin", "Origin"),
            ("reproductive_strategy", "Reproductive Strategy"),
            ("gonad_type", "Gonad Type"), ("hatching", "Hatching"),
            ("maturity_state", "Maturity State"),
            ("maturity_state_term", "Maturity State Term Source ID"),
            ("time_post_fertilisation", "Time Post Fertilisation"),
            ("time_post_fertilisation_unit", "Time Post Fertilisation Unit"),
            ("post_hatching_animal_density", "Post-hatching Animal Density"),
            ("post_hatching_animal_density_unit", "Post-hatching Animal Density Unit"),
            ("food_restriction", "Food Restriction"),
            ("food_restriction_unit", "Food Restriction Unit"),
            ("post_hatching_water_temperature_average", "Post-hatching Water Temperature Average"),
            ("post_hatching_water_temperature_average_unit", "Post-hatching Water Temperature Average Unit"),
            ("average_water_salinity", "Average Water Salinity"),
            ("average_water_salinity_unit", "Average Water Salinity Unit"),
            ("photoperiod", "Photoperiod"),
            ("sampling_weight", "Sampling Weight"),
            ("sampling_weight_unit", "Sampling Weight Unit"),
            ("method_of_euthanasia", "Method Of Euthanasia"),
            ("generations_from_wild", "Generations From Wild"),
            ("generations_from_wild_unit", "Generations From Wild Unit"),
            ("diet", "Diet"),
            ("experimental_strain_id", "Experimental Strain Id"),
            ("genetic_background", "Genetic Background"),
            ("water_rearing_system", "Water Rearing System"),
            ("standard_length", "Standard Length"),
            ("standard_length_unit", "Standard Length Unit"),
            ("total_length", "Total Length"),
            ("total_length_unit", "Total Length Unit"),
            ("fork_length", "Fork Length"),
            ("fork_length_unit", "Fork Length Unit"),
            ("average_water_oxygen", "Average Water Oxygen"),
            ("average_water_oxygen_unit", "Average Water Oxygen Unit"),
            ("sampling_day_start_time", "Sampling Day Start Time"),
            ("sampling_day_end_time", "Sampling Day End Time"),
            ("anaesthetic_or_sedative_name", "Anaesthetic Or Sedative Name"),
        )},
    },
}
_EXPORT_HS = {"organism", "specimen_from_organism", "teleostei_embryo",
              "teleostei_post_hatching"}
_EXPORT_ARRAYS = {
    "organism": {"child_of": "Child Of"},
    "organoid": {"derived_from": "Derived From"},
    "specimen_from_organism": {"derived_from": "Derived From",
                               "specimen_picture_url": "Specimen Picture URL"},
    "teleostei_embryo": {"derived_from": "Derived From"},
    "teleostei_post_hatching": {"derived_from": "Derived From"},
}


def _export_input(spark, rows, aliases, with_hs, arrays):
    cols = sorted(aliases)
    data = []
    for r in rows:
        vals = [
            None if (x := r.get(aliases[c])) is None or str(x).strip() == "" else str(x)
            for c in cols
        ]
        if with_hs:
            hs = r.get("Health Status")
            vals.append([(e["text"], e["term"]) for e in hs] if hs else None)
        for c in sorted(arrays):
            vals.append(_scalar_or_list(r.get(arrays[c])))
        data.append(tuple(vals))
    schema = ", ".join(f"{c} string" for c in cols)
    if with_hs:
        schema += ", health_status array<struct<text:string,term:string>>"
    for c in sorted(arrays):
        schema += f", {c} array<string>"
    return spark.createDataFrame(data, schema)


@pytest.mark.parametrize("rtype", sorted(EXPORT_ALIASES))
def test_biosample_export_parity_all_types(spark, ref_data, rtype):
    """Byte-level S7 parity for EVERY exported record type: the golden's
    biosample_exports payloads (validation_results.json, produced by the
    per-type export_to_biosample_format methods) must equal this engine's
    declarative export-spec projection (plans/exports.py) key-for-key —
    OBO PURL expansion, str(float) rendering ('2.0'), unit carriage and
    `or ""` defaults, conditional key omission via NULL-struct-drop in
    to_json, 'derived from'[0] vs all-'child of' relationship shapes."""
    from faang_pydantics_validation_spark.plans.exports import (
        EXPORT_SPECS,
        biosample_export,
    )

    want = {
        e["sample_name"]: e["biosample_format"]
        for e in json.load(open(GOLDEN))["biosample_exports"][rtype]
    }
    rows = [r for r in ref_data[rtype] if r["Sample Name"] in want]
    assert rows, rtype
    df = _export_input(
        spark, rows, EXPORT_ALIASES[rtype], rtype in _EXPORT_HS,
        _EXPORT_ARRAYS[rtype],
    )
    got = {
        r["sample_name"]: json.loads(r["js"])
        for r in biosample_export(df, EXPORT_SPECS[rtype])
        .select("sample_name", F.to_json("biosample_format").alias("js"))
        .collect()
    }
    assert got == want, {
        k: (got.get(k), want.get(k)) for k in (set(got) ^ set(want)) or got
    }


def test_export_spec_edge_semantics(spark):
    """Reference-faithful export edges the golden data cannot exercise:
    numeric fields render 'restricted access' VERBATIM (the models type
    them Union[float, Literal['restricted access']] and export str(v));
    zero-valued `if model.field:`-guarded numerics are OMITTED (Python
    falsy); blank unit strings fall through to the `or`-default."""
    from faang_pydantics_validation_spark.plans.exports import (
        ORGANOID_EXPORT,
        SPECIMEN_EXPORT,
        biosample_export,
    )

    org = spark.createDataFrame(
        [("s1", "Caecum", "UBERON:1", None, None, "fresh", None, None,
          "restricted access", "passages", "matrigel", "2D", None, "5", "",
          ["D1"])],
        "sample_name string, organ_model string, organ_model_term string, "
        "organ_part_model string, organ_part_model_term string, "
        "freezing_method string, freezing_date string, freezing_date_unit string, "
        "organoid_passage string, organoid_passage_unit string, "
        "growth_environment string, type_of_organoid_culture string, "
        "organoid_morphology string, number_of_frozen_cells string, "
        "number_of_frozen_cells_unit string, derived_from array<string>",
    )
    got = json.loads(
        biosample_export(org, ORGANOID_EXPORT)
        .select(F.to_json("biosample_format").alias("js")).first()["js"]
    )["characteristics"]
    assert got["organoid passage"] == [
        {"text": "restricted access", "unit": "passages"}
    ]
    # blank unit -> `or "organoids"` default; numeric str(float) render
    assert got["number of frozen cells"] == [{"text": "5.0", "unit": "organoids"}]

    spec = spark.createDataFrame(
        [("s2", "specimen from organism", "OBI_0001479", "2020-01", "YYYY-MM",
          "Denmark", "2", "month", "adult", "EFO_1", "liver", "UBERON_2",
          "http://p", None, "0", "count", "3", "grams", None, None, None, None,
          None, None, None, None, None, None, ["P1"], None, None, None, None)],
        "sample_name string, material string, term string, "
        "specimen_collection_date string, unit string, geographic_location string, "
        "animal_age_at_collection string, animal_age_at_collection_unit string, "
        "developmental_stage string, developmental_stage_term string, "
        "organism_part string, organism_part_term string, "
        "specimen_collection_protocol string, fasted_status string, "
        "specimen_volume string, specimen_volume_unit string, "
        "specimen_weight string, specimen_weight_unit string, "
        "number_of_pieces string, number_of_pieces_unit string, "
        "specimen_size string, specimen_size_unit string, "
        "gestational_age_at_sample_collection string, "
        "gestational_age_at_sample_collection_unit string, "
        "average_incubation_temperature string, "
        "average_incubation_temperature_unit string, "
        "average_incubation_humidity string, average_incubation_humidity_unit string, "
        "derived_from array<string>, embryonic_stage string, embryonic_stage_unit string, "
        "health_status array<struct<text:string,term:string>>, "
        "specimen_picture_url array<string>",
    )
    got2 = json.loads(
        biosample_export(spec, SPECIMEN_EXPORT)
        .select(F.to_json("biosample_format").alias("js")).first()["js"]
    )["characteristics"]
    assert "specimen volume" not in got2  # 0 is falsy -> key omitted
    assert got2["specimen weight"] == [{"text": "3.0", "unit": "grams"}]


def test_numeric_export_matches_python_float_repr(spark):
    """Byte-level export parity for numeric magnitudes the golden fixtures
    never reach: Spark's cast(double as string) switches to scientific
    notation at |v| >= 1e7 / < 1e-3 ('5.0E7', '1.0E-4') while the
    reference renders str(float(v)) ('50000000.0', '0.0001') fixed-point
    through [1e-4, 1e16). _py_float_repr must equal Python's str(float(v))
    across both regimes, including Python's scientific shape ('1e+16',
    '1.5e-05') outside the fixed range."""
    from faang_pydantics_validation_spark.plans.exports import _py_float_repr

    values = [
        "50000000", "5e7", "10000000", "0.0001", "1e-3", "0.001", "123.456",
        "2.5", "-3", "0", "-0.5", "0.1", "1e15", "9999999999999998",
        "123456789.12345679", "7", "1000000", "3.14159",
        # outside Python's fixed range -> 'me±XX' scientific
        "1e16", "1.5e16", "0.00001", "-2.5e-7", "1e100", "-1e-20",
        "1.7976931348623157e308", "6.02e23",
        # Spark's string->double cast ACCEPTS these, so try_cast succeeds
        # and the renderer (not the raw-string fallback) must produce
        # Python's spellings, not Java's 'NaN'/'Infinity'
        "NaN", "Infinity", "-Infinity",
    ]
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = {
        r["v"]: r["r"]
        for r in df.select(
            "v", _py_float_repr(F.col("v").try_cast("double")).alias("r")
        ).collect()
    }
    for v in values:
        assert got[v] == str(float(v)), (v, got[v], str(float(v)))


def test_numeric_export_parity_at_5e7(spark):
    """The ADVICE repro: number_of_frozen_cells in the tens of millions
    must export '50000000.0', not '5.0E7' (organoid_validator.py renders
    str(float) on the Union[float, Literal] field)."""
    from faang_pydantics_validation_spark.plans.exports import (
        ORGANOID_EXPORT,
        biosample_export,
    )

    org = spark.createDataFrame(
        [("s1", "Caecum", "UBERON:1", None, None, "fresh", None, None,
          "2", "passages", "matrigel", "2D", None, "50000000", "cells",
          ["D1"])],
        "sample_name string, organ_model string, organ_model_term string, "
        "organ_part_model string, organ_part_model_term string, "
        "freezing_method string, freezing_date string, freezing_date_unit string, "
        "organoid_passage string, organoid_passage_unit string, "
        "growth_environment string, type_of_organoid_culture string, "
        "organoid_morphology string, number_of_frozen_cells string, "
        "number_of_frozen_cells_unit string, derived_from array<string>",
    )
    got = json.loads(
        biosample_export(org, ORGANOID_EXPORT)
        .select(F.to_json("biosample_format").alias("js")).first()["js"]
    )["characteristics"]
    assert got["number of frozen cells"] == [{"text": "50000000.0", "unit": "cells"}]


def test_organism_all_blank_child_of_keeps_relationships_key(spark):
    """organism_validator.py:86-93 gates the relationships key on the
    UNFILTERED child_of: a non-empty list of all-blank parents still emits
    'relationships': [] (key present, empty array); only a None/empty
    child_of omits the key."""
    from faang_pydantics_validation_spark.plans.exports import (
        ORGANISM_EXPORT,
        biosample_export,
    )

    schema = (
        "sample_name string, material string, term string, organism string, "
        "organism_term string, sex string, sex_term string, birth_date string, "
        "unit string, breed string, breed_term string, "
        "health_status array<struct<text:string,term:string>>, "
        "child_of array<string>"
    )
    rows = [
        ("all_blank", *(None,) * 10, None, ["", "  "]),
        ("none_rel", *(None,) * 10, None, None),
        ("empty_rel", *(None,) * 10, None, []),
        ("mixed_rel", *(None,) * 10, None, ["P1", ""]),
    ]
    df = spark.createDataFrame(rows, schema)
    got = {
        r["sample_name"]: json.loads(r["js"])
        for r in biosample_export(df, ORGANISM_EXPORT)
        .select("sample_name", F.to_json("biosample_format").alias("js"))
        .collect()
    }
    assert got["all_blank"]["relationships"] == []
    assert "relationships" not in got["none_rel"]
    assert "relationships" not in got["empty_rel"]
    assert got["mixed_rel"]["relationships"] == [
        {"type": "child of", "target": "P1"}
    ]


def test_total_summary_parity(spark, golden):
    assert golden["total_summary"] == {
        "total_samples": 10, "valid_samples": 7, "invalid_samples": 3,
        "warnings": 2, "relationship_errors": 2,
    }


# ---- the two remaining golden record types (5/5 coverage) -------------------

SPECIMEN_ALIASES = {
    "Sample Name": "sample_name", "Material": "material",
    "Term Source ID": "term", "Project": "project",
    "Secondary Project": "secondary_project", "Availability": "availability",
    "Specimen Collection Date": "specimen_collection_date", "Unit": "unit",
    "Geographic Location": "geographic_location",
    "Animal Age At Collection": "animal_age_at_collection",
    "Animal Age At Collection Unit": "animal_age_at_collection_unit",
    "Developmental Stage": "developmental_stage",
    "Organism Part": "organism_part",
    "Specimen Collection Protocol": "specimen_collection_protocol",
    "Fasted Status": "fasted_status", "Number of Pieces": "number_of_pieces",
    "Specimen Volume": "specimen_volume",
    "Specimen Volume Unit": "specimen_volume_unit",
    "Specimen Size": "specimen_size", "Specimen Size Unit": "specimen_size_unit",
    "Specimen Weight": "specimen_weight",
    "Specimen Weight Unit": "specimen_weight_unit",
    "Gestational Age At Sample Collection": "gestational_age_at_sample_collection",
    "Gestational Age At Sample Collection Unit": "gestational_age_at_sample_collection_unit",
    "Average Incubation temperature": "average_incubation_temperature",
    "Average Incubation temperature Unit": "average_incubation_temperature_unit",
    "Average Incubation Humidity": "average_incubation_humidity",
    "Average Incubation Humidity Unit": "average_incubation_humidity_unit",
    "Embryonic Stage": "embryonic_stage",
    "Embryonic Stage Unit": "embryonic_stage_unit",
}

EMBRYO_ALIASES = {
    **SPECIMEN_ALIASES,
    "Origin": "origin", "Reproductive Strategy": "reproductive_strategy",
    "Hatching": "hatching",
    "Time Post Fertilisation": "time_post_fertilisation",
    "Time Post Fertilisation Unit": "time_post_fertilisation_unit",
    "Pre-hatching Water Temperature Average": "pre_hatching_water_temperature_average",
    "Pre-hatching Water Temperature Average Unit": "pre_hatching_water_temperature_average_unit",
    "Post-hatching Water Temperature Average": "post_hatching_water_temperature_average",
    "Post-hatching Water Temperature Average Unit": "post_hatching_water_temperature_average_unit",
    "Degree Days": "degree_days", "Degree Days Unit": "degree_days_unit",
    "Growth Media": "growth_media",
    "Medium Replacement Frequency": "medium_replacement_frequency",
    "Medium Replacement Frequency Unit": "medium_replacement_frequency_unit",
    "Percentage Total Somite Number": "percentage_total_somite_number",
    "Percentage Total Somite Number Unit": "percentage_total_somite_number_unit",
    "Average Water Salinity": "average_water_salinity",
    "Average Water Salinity Unit": "average_water_salinity_unit",
    "Photoperiod": "photoperiod",
    "Generations From Wild": "generations_from_wild",
    "Generations From Wild Unit": "generations_from_wild_unit",
}


def _scalar_or_list(v):
    """A1 normalize (specimen_ruleset.py:248-264): scalar -> [scalar],
    drop blanks."""
    if v is None:
        return None
    if isinstance(v, list):
        out = [str(x).strip() for x in v if x and str(x).strip()]
        return out or None
    return [str(v).strip()] if str(v).strip() else None


def _specimen_df(spark, rows, aliases):
    str_cols = sorted(set(aliases.values()))
    data = [
        tuple(
            [None if (x := r.get(a)) is None or str(x).strip() == "" else str(x)
             for a, c in sorted(aliases.items(), key=lambda kv: kv[1])]
            + [_scalar_or_list(r.get("Derived From"))]
            + [_scalar_or_list(r.get("Specimen Picture URL"))]
            + [[(e["text"], e["term"]) for e in r.get("Health Status") or []] or None]
        )
        for r in rows
    ]
    schema = (
        ", ".join(f"{c} string" for c in str_cols)
        + ", derived_from array<string>, specimen_picture_url array<string>"
        + ", health_status array<struct<text:string,term:string>>"
    )
    df = _df_raw(spark, data, schema)
    return df.withColumn("conv_id", F.col("sample_name")).withColumn("turn_idx", F.lit(0))


def _df_raw(spark, data, schema):
    return spark.createDataFrame(data, schema)


def test_specimen_from_organism_parity(spark, ref_data, golden):
    """Golden: 1 record, all-valid, 0 warnings, 0 relationship errors —
    the full shipped specimen ruleset (38 rules) must emit zero error
    rows, zero warnings (health_status present), and the derived_from
    reference must resolve in-batch."""
    rows = ref_data["specimen_from_organism"]
    df = _specimen_df(spark, rows, SPECIMEN_ALIASES)
    v = compile_row_rules(df, _ruleset("specimen"),
                          key_cols=("conv_id", "turn_idx"), partition_col=None)
    got = [(r["conv_id"], r["rule_id"], r["severity"]) for r in v.collect()]
    assert got == [], got

    # J6: Derived From resolves against the organism sheet
    names = spark.createDataFrame(
        [(r["Sample Name"],) for r in ref_data["organism"]], "id string"
    )
    exploded = df.select("conv_id", F.lit(0).alias("turn_idx"),
                         F.explode("derived_from").alias("ref"))
    missing = anti_join_rule(exploded, names, "ref", "id", "R_ref", ds=False)
    assert missing.count() == 0

    g = golden["results_by_type"]["specimen_from_organism"]
    assert g["summary"] == {"total": 1, "valid": 1, "invalid": 0,
                            "warnings": 0, "relationship_errors": 0}
    assert {e["sample_name"] for e in g["valid_specimen_from_organisms"]} == {
        "OCU_INRAE_PND18_S1"
    }


def test_teleostei_embryo_parity(spark, ref_data, golden):
    """Golden: 2 records, all-valid under the full inherited ruleset
    (specimen core + 22 embryo rules, 59 total)."""
    rows = ref_data["teleostei_embryo"]
    df = _specimen_df(spark, rows, EMBRYO_ALIASES)
    v = compile_row_rules(df, _ruleset("teleostei_embryo"),
                          key_cols=("conv_id", "turn_idx"), partition_col=None)
    got = [(r["conv_id"], r["rule_id"], r["severity"]) for r in v.collect()]
    assert got == [], got

    g = golden["results_by_type"]["teleostei_embryo"]
    assert g["summary"]["total"] == 2 and g["summary"]["invalid"] == 0
    assert g["summary"]["warnings"] == 0 and g["summary"]["relationship_errors"] == 0


def test_teleostei_embryo_seeded_violations(spark, ref_data):
    """Negative control for the embryo ruleset: corrupt three fields of a
    golden-valid record and assert exactly those rules fire (the golden is
    all-valid, so without seeding the parity signal would be vacuous)."""
    rows = [dict(ref_data["teleostei_embryo"][0])]
    rows[0]["Photoperiod"] = "25L:12D"          # L hours out of 1-24 range
    rows[0]["Degree Days"] = "-3"               # negative numeric
    rows[0]["Growth Media"] = "Lava"            # enum miss
    df = _specimen_df(spark, rows, EMBRYO_ALIASES)
    v = compile_row_rules(df, _ruleset("teleostei_embryo"),
                          key_cols=("conv_id", "turn_idx"), partition_col=None)
    fired = {r["rule_id"] for r in v.collect()}
    assert fired == {"R_photoperiod", "R_degree_days", "R_growth_media"}, fired


# ---- sample1.json differential: the remaining 8 shipped rulesets -------------
# (sample1.json is the reference's full-coverage input, SURVEY.md §5; it has
# no golden output file, so expectations are the seeded errors the reference's
# own validators raise — e.g. 'Person Role': 'submitterxxx', cell-line breed
# term from NCBITaxon instead of LBO)

SAMPLE1 = "/root/reference/json_files/sample1.json"

CORE_ALIASES = {
    "sample_name": "Sample Name", "material": "Material",
    "term": "Term Source ID", "project": "Project",
    "secondary_project": "Secondary Project", "availability": "Availability",
}

SHEET_CASES = [
    ("person", "person", {
        "person_last_name": "Person Last Name",
        "person_first_name": "Person First Name",
        "person_email": "Person Email", "person_role": "Person Role",
    }, {("Harrison", "R_person_role")}),  # seeded: 'submitterxxx'
    ("organization", "organization", {
        "organization_name": "Organization Name",
        "organization_address": "Organization Address",
        "organization_uri": "Organization URI",
        "organization_role": "Organization Role",
    }, set()),
    ("submission", "submission", {
        "submission_title": "Submission Title",
        "submission_description": "Submission Description",
    }, set()),
    ("pool of specimens", "pool_of_specimens", {
        **CORE_ALIASES,
        "pool_creation_date": "Pool Creation Date", "unit": "Unit",
        "pool_creation_protocol": "Pool Creation Protocol",
        "specimen_volume": "Specimen Volume",
        "specimen_volume_unit": "Specimen Volume Unit",
        "specimen_size": "Specimen Size",
        "specimen_size_unit": "Specimen Size Unit",
        "specimen_weight": "Specimen Weight",
        "specimen_weight_unit": "Specimen Weight Unit",
    }, set()),  # '2018-07-12 00:00:00' must strip to a valid YYYY-MM-DD
    ("cell specimen", "cell_specimen", {
        **CORE_ALIASES,
        "purification_protocol": "Purification Protocol",
    }, set()),
    ("cell culture", "cell_culture", {
        **CORE_ALIASES,
        "culture_type": "Culture Type",
        "culture_type_term": "Culture Type Term Source ID",
        "cell_culture_protocol": "Cell Culture Protocol",
        "culture_conditions": "Culture Conditions",
        "number_of_passages": "Number Of Passages",
    }, set()),
    ("cell line", "cell_line", {
        **CORE_ALIASES,
        "organism": "Organism", "organism_term": "Organism Term Source ID",
        "sex": "Sex", "sex_term": "Sex Term Source ID",
        "cell_line": "Cell Line", "biomaterial_provider": "Biomaterial Provider",
        "number_of_passages": "Number of Passages",
        "date_established": "Date Established", "unit": "Unit",
        "breed": "Breed", "breed_term": "Breed Term Source ID",
        "culture_protocol": "Culture Protocol",
        "disease": "Disease", "disease_term": "Disease Term Source ID",
    }, {
        # both records carry Breed Term Source ID 'NCBITaxon:9796' — the
        # reference's validate_breed_term raises 'should be from LBO'
        ("cell_line_1", "R_breed_term_format"),
        ("cell_line_2", "R_breed_term_format"),
    }),
    ("single cell specimen", "single_cell_specimen", {
        **CORE_ALIASES,
        "tissue_dissociation": "Tissue Dissociation",
        "cell_enrichment": "Cell Enrichment",
        "enrichment_markers": "Enrichment Markers",
        "single_cell_isolation": "Single Cell Isolation",
        "single_cell_entity": "Single Cell Entity",
        "single_cell_quality": "Single Cell Quality",
        "cell_number": "Cell Number", "cell_number_unit": "Unit",
        "single_cell_isolation_protocol": "Single Cell Isolation Protocol",
    }, set()),
]

ARRAY_KINDS1 = {"array_size", "array_element_regex", "array_element_enum"}
STRUCT_COLS1 = {"health_status", "cell_type"}
SHEET_ARRAY_ALIASES = {
    "derived_from": "Derived From",
    "specimen_picture_url": "Specimen Picture URL",
    "cell_type": "Cell Type",
    "health_status": "Health Status",
    "child_of": "Child Of",
}


def _sheet_df(spark, rows, ruleset, aliases):
    """Build a DataFrame carrying every column the ruleset references,
    pulled from the sheet via alias maps; arrays get A1 normalization."""
    cols: dict[str, str] = {}
    for r in ruleset:
        for i, c in enumerate(r.columns):
            if c in STRUCT_COLS1:
                cols[c] = "array<struct<text:string,term:string>>"
            elif i == 0 and r.kind in ARRAY_KINDS1:
                cols[c] = "array<string>"
            else:
                cols.setdefault(c, "string")
    data = []
    for row in rows:
        vals = []
        for c, t in sorted(cols.items()):
            if t == "string":
                x = row.get(aliases.get(c, "\x00"))
                vals.append(None if x is None or str(x).strip() == "" else str(x))
            elif c in STRUCT_COLS1:
                hs = row.get(SHEET_ARRAY_ALIASES[c])
                vals.append([(e["text"], e["term"]) for e in hs] if hs else None)
            else:
                vals.append(_scalar_or_list(row.get(SHEET_ARRAY_ALIASES.get(c))))
        data.append(tuple(vals))
    schema = ", ".join(f"{c} {t}" for c, t in sorted(cols.items()))
    return spark.createDataFrame(data, schema)


@pytest.mark.parametrize("sheet,rs_name,aliases,expected", SHEET_CASES,
                         ids=[c[1] for c in SHEET_CASES])
def test_sample1_differential(spark, sheet, rs_name, aliases, expected):
    rows = json.load(open(SAMPLE1))[sheet]
    ruleset = _ruleset(rs_name)
    name_col = next(c for c in ("sample_name", "person_last_name",
                                "organization_name", "submission_title")
                    if any(c in r.columns for r in ruleset))
    df = _sheet_df(spark, rows, ruleset, aliases).withColumn(
        "conv_id", F.col(name_col)
    ).withColumn("turn_idx", F.lit(0))
    v = compile_row_rules(df, ruleset, key_cols=("conv_id", "turn_idx"),
                          partition_col=None)
    got = {(r["conv_id"], r["rule_id"]) for r in v.collect()}
    assert got == expected, (sheet, got ^ expected)
