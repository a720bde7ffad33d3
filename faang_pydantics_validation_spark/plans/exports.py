"""BioSamples export projections as DATA (S7): each reference validator's
`export_to_biosample_format` (organism_validator.py:36-95,
organoid_validator.py:22-103, specimen_validator.py:22-150,
teleostei_embryo_validator.py:22-155,
teleostei_post_hatching_validator.py:22-217) is transcribed to a
declarative field spec compiled into ONE nested-struct Column expression —
the export analog of rules-as-data. No shuffle, no UDF; a full table
exports in a single projection.

Conditional key OMISSION maps to NULL struct fields: `to_json` drops
them, which is exactly the reference's dict-key omission. Byte-level
parity with the golden `validation_results.json` biosample_exports is
asserted for ALL FIVE exported record types in
tests/test_reference_parity.py::test_biosample_export_parity_all_types.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..rules.library import norm_term_colon

_OBO = "http://purl.obolibrary.org/obo/"
# organism's convert_term_to_url blanks only these
# (organism_validator.py:38-45); the other validators blank the full
# sentinel set (e.g. specimen_validator.py:24-31)
RESTRICTED_ONLY = ("restricted access",)
ALL_SENTINELS = (
    "restricted access", "not applicable", "not collected", "not provided",
)


@dataclass(frozen=True)
class ExportField:
    """One characteristic entry. `when`:
    - 'always'         unconditional (required reference fields)
    - 'truthy'         emit when text value is non-null/non-blank
                       (the reference's `if model.field:`)
    - 'notnull'        emit when non-null (the reference's `is not None`)
    - 'not_restricted' truthy AND != 'restricted access' (freezing date)
    """

    key: str
    text: str | None = None
    term: str | None = None
    unit: str | None = None
    unit_default: str | None = None  # reference's `model.unit or "..."`
    numeric: bool = False  # text = str(float(v)) -> '2.0'-style
    when: str = "always"
    nested: str | None = None  # array<struct<text,term>> fan-out
    nested_text: str | None = None  # array<string> -> [{text}...]
    raw_term_url: bool = False  # organism health_status: ':'->'_' only
    term_sentinels: tuple = ALL_SENTINELS
    const_text: str | None = None
    const_term: str | None = None


@dataclass(frozen=True)
class ExportSpec:
    fields: tuple
    rel_type: str  # 'child of' | 'derived from'
    rel_col: str  # array<string> column
    rel_all: bool  # True: one edge per non-blank element; False: [0] only
    rel_optional: bool  # True: omit key when empty (organism)


def _py_float_repr(d: Column) -> Column:
    """Render a double EXACTLY as Python's str(float(v)) — the reference
    emits str(model.field) on Union[float, ...] fields, so byte-level
    export parity needs Python's notation, not Java's:

    - fixed-point for 1e-4 <= |v| < 1e16 (Python's repr range; Java/Spark
      switches to scientific already at |v| >= 1e7 or < 1e-3 — cast of
      5e7 is '5.0E7' where Python says '50000000.0'),
    - scientific 'm e±XX' outside it (Python: lowercase 'e', signed,
      >=2-digit exponent, integral mantissa without '.0' — '1e+16',
      '1.5e-05'; Java: '1.0E16', '1.5E-5').

    Fixed-point goes through decimal(38,20): Spark's double->decimal cast
    uses the shortest-roundtrip decimal form (BigDecimal of
    Double.toString), and within the range non-integral doubles need at
    most 17 significant digits + 3 leading fraction zeros, so scale 20
    never rounds. Trailing zeros are trimmed; integral values keep the
    '.0'. NULL in, NULL out (the caller's coalesce falls back to the raw
    string). Non-finite values render as Python's 'nan'/'inf'/'-inf' —
    Spark's string->double cast ACCEPTS 'NaN'/'Infinity', so try_cast
    succeeds and the raw-string fallback never fires; without the
    explicit branches the Java spellings would leak into the export.
    Exact zero carries no 'E' and falls through to the plain cast."""
    absd = F.abs(d)
    in_fixed = (absd >= 1e-4) & (absd < 1e16)
    trimmed = F.regexp_replace(d.cast("decimal(38,20)").cast("string"), "0+$", "")
    fixed = F.when(trimmed.endswith("."), F.concat(trimmed, F.lit("0"))).otherwise(trimmed)
    sci = d.cast("string")
    mantissa = F.regexp_replace(F.regexp_extract(sci, r"^([^E]+)E", 1), r"\.0$", "")
    exp_sign = F.when(
        F.regexp_extract(sci, r"E(-?)\d+$", 1) == "-", F.lit("-")
    ).otherwise(F.lit("+"))
    # lpad TRUNCATES beyond its length — pad 1-digit exponents by hand so
    # 3-digit ones ('e+100') survive
    exp_raw = F.regexp_extract(sci, r"E-?(\d+)$", 1)
    exp_digits = F.when(
        F.length(exp_raw) < 2, F.concat(F.lit("0"), exp_raw)
    ).otherwise(exp_raw)
    py_sci = F.concat(mantissa, F.lit("e"), exp_sign, exp_digits)
    return F.when(d.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(F.isnan(d), F.lit("nan"))
        .when(d == F.lit(float("inf")), F.lit("inf"))
        .when(d == F.lit(float("-inf")), F.lit("-inf"))
        .when(in_fixed, fixed)
        .when(sci.contains("E"), py_sci)
        .otherwise(sci)
    )


def _obo_url(c: Column, sentinels: tuple) -> Column:
    t = F.trim(c.cast("string"))
    return F.when(
        t.isNull() | (t == "") | t.isin(list(sentinels)), F.lit("")
    ).otherwise(
        F.concat(F.lit(_OBO), F.regexp_replace(norm_term_colon(t), ":", "_"))
    )


def _field_entry(f: ExportField) -> Column:
    if f.nested is not None:
        # health-status style: one {text, ontologyTerms} per element
        if f.raw_term_url:
            # organism_validator.py:81-86: ':'->'_' only — no
            # underscore->colon normalization, no sentinel blanking
            url = lambda s: F.concat(  # noqa: E731
                F.lit(_OBO), F.regexp_replace(s["term"], ":", "_")
            )
        else:
            url = lambda s: _obo_url(s["term"], f.term_sentinels)  # noqa: E731
        entry = F.transform(
            f.nested,
            lambda s: F.struct(
                s["text"].alias("text"), F.array(url(s)).alias("ontologyTerms")
            ),
        )
        return F.when(
            F.col(f.nested).isNotNull() & (F.size(f.nested) > 0), entry
        )
    if f.nested_text is not None:
        entry = F.transform(f.nested_text, lambda x: F.struct(x.alias("text")))
        return F.when(
            F.col(f.nested_text).isNotNull() & (F.size(f.nested_text) > 0), entry
        )

    if f.const_text is not None:
        text = F.lit(f.const_text)
    elif f.numeric:
        # the reference renders str(model.field) where the field is
        # Union[float, Literal['restricted access']]: floats get PYTHON's
        # repr (fixed-point through 1e16 — _py_float_repr; a plain Spark
        # cast diverges at |v| >= 1e7), the sentinel passes through
        # VERBATIM. try_cast (never ANSI-throwing cast) + fallback to the
        # raw string reproduces both branches.
        raw = F.col(f.text).cast("string")
        text = F.coalesce(_py_float_repr(raw.try_cast("double")), raw)
    else:
        text = F.col(f.text).cast("string")

    parts = [text.alias("text")]
    if f.const_term is not None:
        parts.append(
            F.array(_obo_url(F.lit(f.const_term), f.term_sentinels)).alias(
                "ontologyTerms"
            )
        )
    elif f.term is not None:
        parts.append(
            F.array(_obo_url(F.col(f.term), f.term_sentinels)).alias("ontologyTerms")
        )
    if f.unit is not None:
        u = F.col(f.unit).cast("string")
        if f.unit_default is not None:
            # the reference's `model.unit or "default"`: blank strings fall
            # through to the default too, not just None
            u = F.when(u.isNull() | (F.trim(u) == ""), F.lit(f.unit_default)).otherwise(u)
        parts.append(u.alias("unit"))
    entry = F.array(F.struct(*parts))

    if f.when == "always":
        return entry
    raw = F.col(f.text).cast("string")
    present = raw.isNotNull() & (F.trim(raw) != "")
    if f.when == "not_restricted":
        present = present & (raw != "restricted access")
    if f.when == "truthy" and f.numeric:
        # the reference guards numerics with `if model.field:` — 0.0 is
        # falsy and the key is OMITTED (while 'restricted access' stays
        # truthy; eqNullSafe keeps non-numeric strings present)
        present = present & ~raw.try_cast("double").eqNullSafe(F.lit(0.0))
    # 'notnull' == present: blank-to-None stripping upstream makes the
    # reference's `is not None` equivalent to non-blank here
    return F.when(present, entry)


def biosample_export(
    df: DataFrame, spec: ExportSpec, name_col: str = "sample_name"
) -> DataFrame:
    """(sample_name, biosample_format) — one nested projection per row."""
    characteristics = F.struct(
        *[_field_entry(f).alias(f.key) for f in spec.fields]
    )
    rel_src = F.coalesce(F.col(spec.rel_col), F.array().cast("array<string>"))
    parents = F.filter(rel_src, lambda x: x.isNotNull() & (F.trim(x) != ""))
    if not spec.rel_all:
        parents = F.slice(parents, 1, 1)
    rels = F.transform(
        parents,
        lambda x: F.struct(F.lit(spec.rel_type).alias("type"), x.alias("target")),
    )
    if spec.rel_optional:
        # organism_validator.py:86-93 gates the key on the UNFILTERED
        # child_of being truthy: a non-empty list of all-blank elements
        # still emits 'relationships': [] (key present, empty array);
        # only a None/empty child_of omits the key.
        rels = F.when(F.size(rel_src) > 0, rels)
    return df.select(
        F.col(name_col).alias("sample_name"),
        F.struct(
            characteristics.alias("characteristics"),
            rels.alias("relationships"),
        ).alias("biosample_format"),
    )


E = ExportField

ORGANISM_EXPORT = ExportSpec(
    fields=(
        E("material", text="material", term="term", term_sentinels=RESTRICTED_ONLY),
        E("organism", text="organism", term="organism_term", term_sentinels=RESTRICTED_ONLY),
        E("sex", text="sex", term="sex_term", term_sentinels=RESTRICTED_ONLY),
        E("birth date", text="birth_date", unit="unit", unit_default="", when="truthy"),
        E("breed", text="breed", term="breed_term", term_sentinels=RESTRICTED_ONLY, when="truthy"),
        E("health status", nested="health_status", raw_term_url=True),
    ),
    rel_type="child of", rel_col="child_of", rel_all=True, rel_optional=True,
)

ORGANOID_EXPORT = ExportSpec(
    fields=(
        E("material", const_text="organoid", const_term="NCIT:C172259",
          term_sentinels=RESTRICTED_ONLY),
        E("organ model", text="organ_model", term="organ_model_term",
          term_sentinels=RESTRICTED_ONLY),
        E("organ part model", text="organ_part_model",
          term="organ_part_model_term", term_sentinels=RESTRICTED_ONLY,
          when="truthy"),
        E("freezing method", text="freezing_method"),
        E("freezing date", text="freezing_date", unit="freezing_date_unit",
          unit_default="", when="not_restricted"),
        E("organoid passage", text="organoid_passage", numeric=True,
          unit="organoid_passage_unit", unit_default="passages"),
        E("growth environment", text="growth_environment"),
        E("type of organoid culture", text="type_of_organoid_culture"),
        E("organoid morphology", text="organoid_morphology", when="truthy"),
        E("number of frozen cells", text="number_of_frozen_cells",
          numeric=True, unit="number_of_frozen_cells_unit",
          unit_default="organoids", when="notnull"),
    ),
    rel_type="derived from", rel_col="derived_from", rel_all=False,
    rel_optional=False,
)

_SPECIMEN_CORE_FIELDS = (
    E("material", text="material", term="term"),
    E("specimen collection date", text="specimen_collection_date", unit="unit"),
    E("geographic location", text="geographic_location"),
    E("animal age at collection", text="animal_age_at_collection",
      numeric=True, unit="animal_age_at_collection_unit"),
    E("developmental stage", text="developmental_stage",
      term="developmental_stage_term"),
    E("organism part", text="organism_part", term="organism_part_term"),
    E("specimen collection protocol", text="specimen_collection_protocol"),
    E("health status at collection", nested="health_status"),
)

SPECIMEN_EXPORT = ExportSpec(
    fields=_SPECIMEN_CORE_FIELDS + (
        E("fasted status", text="fasted_status", when="truthy"),
        E("number of pieces", text="number_of_pieces", numeric=True,
          unit="number_of_pieces_unit", when="truthy"),
        E("specimen volume", text="specimen_volume", numeric=True,
          unit="specimen_volume_unit", when="truthy"),
        E("specimen size", text="specimen_size", numeric=True,
          unit="specimen_size_unit", when="truthy"),
        E("specimen weight", text="specimen_weight", numeric=True,
          unit="specimen_weight_unit", when="truthy"),
        E("specimen picture url", nested_text="specimen_picture_url"),
        E("gestational age at sample collection",
          text="gestational_age_at_sample_collection", numeric=True,
          unit="gestational_age_at_sample_collection_unit", when="truthy"),
        E("average incubation temperature",
          text="average_incubation_temperature", numeric=True,
          unit="average_incubation_temperature_unit", when="truthy"),
        E("average incubation humidity", text="average_incubation_humidity",
          numeric=True, unit="average_incubation_humidity_unit", when="truthy"),
        E("embryonic stage", text="embryonic_stage",
          unit="embryonic_stage_unit", when="truthy"),
    ),
    rel_type="derived from", rel_col="derived_from", rel_all=False,
    rel_optional=False,
)

TELEOSTEI_EMBRYO_EXPORT = ExportSpec(
    fields=_SPECIMEN_CORE_FIELDS + (
        E("origin", text="origin"),
        E("reproductive strategy", text="reproductive_strategy"),
        E("hatching", text="hatching"),
        E("time post fertilisation", text="time_post_fertilisation",
          numeric=True, unit="time_post_fertilisation_unit"),
        E("pre-hatching water temperature average",
          text="pre_hatching_water_temperature_average", numeric=True,
          unit="pre_hatching_water_temperature_average_unit"),
        E("post-hatching water temperature average",
          text="post_hatching_water_temperature_average", numeric=True,
          unit="post_hatching_water_temperature_average_unit"),
        E("degree days", text="degree_days", numeric=True,
          unit="degree_days_unit"),
        E("growth media", text="growth_media"),
        E("medium replacement frequency", text="medium_replacement_frequency",
          numeric=True, unit="medium_replacement_frequency_unit"),
        E("percentage total somite number",
          text="percentage_total_somite_number", numeric=True,
          unit="percentage_total_somite_number_unit"),
        E("average water salinity", text="average_water_salinity",
          numeric=True, unit="average_water_salinity_unit"),
        E("photoperiod", text="photoperiod"),
        E("generations from wild", text="generations_from_wild",
          numeric=True, unit="generations_from_wild_unit", unit_default="",
          when="notnull"),
    ),
    rel_type="derived from", rel_col="derived_from", rel_all=False,
    rel_optional=False,
)

TELEOSTEI_POST_HATCHING_EXPORT = ExportSpec(
    fields=_SPECIMEN_CORE_FIELDS + (
        E("origin", text="origin"),
        E("reproductive strategy", text="reproductive_strategy"),
        E("gonad type", text="gonad_type"),
        E("hatching", text="hatching"),
        E("maturity state", text="maturity_state", term="maturity_state_term"),
        E("time post fertilisation", text="time_post_fertilisation",
          numeric=True, unit="time_post_fertilisation_unit"),
        E("post-hatching animal density", text="post_hatching_animal_density",
          numeric=True, unit="post_hatching_animal_density_unit"),
        E("food restriction", text="food_restriction", numeric=True,
          unit="food_restriction_unit"),
        E("post-hatching water temperature average",
          text="post_hatching_water_temperature_average", numeric=True,
          unit="post_hatching_water_temperature_average_unit"),
        E("average water salinity", text="average_water_salinity",
          numeric=True, unit="average_water_salinity_unit"),
        E("photoperiod", text="photoperiod"),
        E("sampling weight", text="sampling_weight", numeric=True,
          unit="sampling_weight_unit"),
        E("method of euthanasia", text="method_of_euthanasia"),
        E("generations from wild", text="generations_from_wild",
          numeric=True, unit="generations_from_wild_unit", unit_default="",
          when="notnull"),
        E("diet", text="diet", when="truthy"),
        E("experimental strain ID", text="experimental_strain_id", when="truthy"),
        E("genetic background", text="genetic_background", when="truthy"),
        E("water rearing system", text="water_rearing_system", when="truthy"),
        E("standard length", text="standard_length", numeric=True,
          unit="standard_length_unit", unit_default="", when="notnull"),
        E("total length", text="total_length", numeric=True,
          unit="total_length_unit", unit_default="", when="notnull"),
        E("fork length", text="fork_length", numeric=True,
          unit="fork_length_unit", unit_default="", when="notnull"),
        E("average water oxygen", text="average_water_oxygen", numeric=True,
          unit="average_water_oxygen_unit", unit_default="", when="notnull"),
        E("sampling day start time", text="sampling_day_start_time", when="truthy"),
        E("sampling day end time", text="sampling_day_end_time", when="truthy"),
        E("anaesthetic or sedative name", text="anaesthetic_or_sedative_name",
          when="truthy"),
    ),
    rel_type="derived from", rel_col="derived_from", rel_all=False,
    rel_optional=False,
)

EXPORT_SPECS: dict[str, ExportSpec] = {
    "organism": ORGANISM_EXPORT,
    "organoid": ORGANOID_EXPORT,
    "specimen_from_organism": SPECIMEN_EXPORT,
    "teleostei_embryo": TELEOSTEI_EMBRYO_EXPORT,
    "teleostei_post_hatching": TELEOSTEI_POST_HATCHING_EXPORT,
}
