"""P17 unknown-field rejection at table grain.

The reference forbids unknown fields on every record type (pydantic
`extra = "forbid"` in every ruleset Config, e.g. organism_ruleset.py:
277-281), so a payload with a typo'd field name errors instead of being
silently dropped. In a columnar engine an unknown field is an unknown
COLUMN: it is detected ONCE per table from the scan schema — driver-side
metadata, zero data read, zero cost at any corpus size — rather than per
row. Reading with an explicit StructType alone (streaming/incremental.py)
silently DROPS extras; this check is the loud half.

Emits `scope='table'` violation rows:
    R_unknown_column   column present in the table but not declared
    R_missing_column   declared column absent from the table
    R_column_type      declared column present with a different type
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

# the engine's input contract for transcript tables (input_hint), plus the
# ds identity-partition column the table layer adds
TRANSCRIPT_EXPECTED: dict[str, str] = {
    "conv_id": "string",
    "turn_idx": "int",
    "role": "string",
    "text": "string",
    "tool": "string",
    "ts": "timestamp",
    "ds": "date",
}

_VIOLATION_DDL = (
    "conv_id string, turn_idx int, rule_id string, severity string, "
    "scope string, observed string"
)


def schema_check(
    df: DataFrame,
    expected: dict[str, str] | StructType,
    check_types: bool = True,
) -> DataFrame:
    """Compare df's schema against the declared one; return violation rows
    (empty DataFrame when conformant). `expected` maps column name ->
    Spark simpleString type (e.g. 'string', 'int', 'timestamp'); a None
    type declares the column without pinning its type."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    if isinstance(expected, StructType):
        exp: dict[str, str | None] = {
            f.name: f.dataType.simpleString() for f in expected.fields
        }
    else:
        exp = dict(expected)

    rows: list[tuple] = []
    for c in sorted(set(actual) - set(exp)):
        rows.append((None, None, "R_unknown_column", "error", "table", f"{c}:{actual[c]}"))
    for c in sorted(set(exp) - set(actual)):
        rows.append(
            (None, None, "R_missing_column", "error", "table", f"{c}:{exp[c] or 'any'}")
        )
    if check_types:
        for c in sorted(set(exp) & set(actual)):
            if exp[c] is not None and actual[c] != exp[c]:
                rows.append(
                    (
                        None,
                        None,
                        "R_column_type",
                        "error",
                        "table",
                        f"{c}:{actual[c]}!={exp[c]}",
                    )
                )
    return df.sparkSession.createDataFrame(rows, _VIOLATION_DDL)
