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
    ]
