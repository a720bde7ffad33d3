"""The default transcript ruleset — the engine's analog of one Pydantic
ruleset class (e.g. rulesets_pydantics/organism_ruleset.py), declared as
data and compiled to Column expressions.

Scalar rules here; relational rules (anti-joins, uniqueness, windows) are
wired in plans.pipeline because they need dimension tables.
"""

from __future__ import annotations

from ..datagen import ROLES
from ..rules.spec import RuleSpec

TOOL_ID_PATTERN = r"^TOOL:[0-9]{4}$"


def transcript_scalar_rules() -> list[RuleSpec]:
    return [
        # P1 + P5: role present, sentinel policy mandatory
        # (validation_utils.py:214-223; constants.py:214-228)
        RuleSpec("R_role_required", "required", ("role",), tier="mandatory"),
        # P4: role enum (person_ruleset.py:10-28 analog); sentinels are the
        # presence rule's job
        RuleSpec(
            "R_role_enum",
            "enum",
            ("role",),
            params={"values": ROLES},
            skip_sentinels=True,
        ),
        # P1: per-turn text must be non-blank (the text-equality invariant's
        # precondition)
        RuleSpec("R_text_required", "required", ("text",)),
        # P3+P10: tool id shape, warning tier 'recommended'
        # ('not collected'/'not provided' -> warning, per constants.py:219-223)
        RuleSpec(
            "R_tool_format",
            "regex",
            ("tool",),
            params={"pattern": TOOL_ID_PATTERN},
            severity="warning",
            tier="recommended",
        ),
        # --- transcript-native density backfill: the checks a production
        # transcript ruleset carries alongside the seeded four, as data —
        # identity/ordering-key hygiene, timestamp presence, text quality
        # thresholds, canonical tool-term form. Kinds span
        # required/enum/regex/numeric/term_format/expr, the same ruleset
        # density as the reference classes (organism 37 / organoid 33 ...).
        # P1+P5: the conversation key itself (Sample Name analog,
        # base_validator.py:127)
        RuleSpec("R_conv_required", "required", ("conv_id",), tier="mandatory"),
        # P16 analog: key must be a clean identifier token
        RuleSpec(
            "R_conv_id_format",
            "regex",
            ("conv_id",),
            params={"pattern": r"^[A-Za-z0-9_.:-]+$"},
            skip_sentinels=True,
        ),
        # P6: ordering key is a non-negative integer
        RuleSpec("R_turn_idx_nonneg", "numeric", ("turn_idx",), params={"min": 0}),
        # P1 on the event-time column (expr: `required` trims strings; ts
        # is a native timestamp)
        RuleSpec(
            "R_ts_required",
            "expr",
            ("ts",),
            params={"sql": "ts IS NULL", "observed_sql": "cast(ts as string)"},
        ),
        # P4-adjacent: role values are lowercase word tokens even when not
        # in the enum (the enum rule owns membership; this owns shape)
        RuleSpec(
            "R_role_token",
            "regex",
            ("role",),
            params={"pattern": r"^[a-z_]+$"},
            skip_sentinels=True,
        ),
        # P3+P16: tool id must be canonical after underscore->colon
        # normalization (term_format kind; R_tool_format above checks the
        # RAW form as a recommended-tier warning)
        RuleSpec(
            "R_tool_term_format",
            "term_format",
            ("tool",),
            params={"pattern": TOOL_ID_PATTERN},
            skip_sentinels=True,
        ),
        # text quality thresholds (the fused plan's pre-shuffle projection
        # evaluates these JVM-side like every other scalar rule)
        RuleSpec(
            "R_text_control_chars",
            "regex",
            ("text",),
            params={
                # no C0 control characters except tab/newline/CR.
                # Forbidden-pattern (negate) form: the positive-class
                # containment scan is ~30x faster than the equivalent
                # anchored negated-class match (see rules/library._regex)
                "pattern": "[\\u0000-\\u0008\\u000B\\u000C\\u000E-\\u001F]",
                "negate": True,
            },
        ),
        RuleSpec(
            "R_text_len_max",
            "expr",
            ("text",),
            params={
                "sql": "length(text) > 20000",
                "observed_sql": "cast(length(text) as string)",
            },
            severity="warning",
        ),
        RuleSpec(
            "R_text_token_max",
            "expr",
            ("text",),
            params={
                # length guard first: >8192 space-separated tokens needs
                # >=8192 separators, so short texts (the overwhelming
                # majority) never pay the split() array allocation —
                # codegen short-circuits the AND
                "sql": "length(text) > 8191 AND size(split(text, ' ')) > 8192",
                "observed_sql": "cast(size(split(text, ' ')) as string)",
            },
            severity="warning",
        ),
    ]
