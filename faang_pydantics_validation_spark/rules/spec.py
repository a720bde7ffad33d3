"""Rule declarations: the engine's analog of the reference's Pydantic
ruleset classes (/root/reference/rulesets_pydantics/*.py), but as *data*.

A RuleSpec names a rule kind from the library (SURVEY.md §2.2-§2.4), the
column(s) it applies to, parameters, a severity, and a sentinel tier.
The compiler turns each spec into a single Spark Column expression of type
struct<severity, observed> (NULL = pass), so the whole scalar rule suite
evaluates in ONE wide projection — no per-row Python, no shuffles.

Sentinel ("missing value") tier semantics mirror the reference exactly
(constants.py:214-228 MISSING_VALUES):

    mandatory:   "not applicable"/"not collected"/"not provided" -> error,
                 "restricted access" -> warning
    recommended: "not collected"/"not provided" -> warning,
                 "not applicable"/"restricted access" -> pass
    optional:    all four sentinels -> error

When a value is a sentinel the underlying check is short-circuited
(the reference validators return early on sentinels, e.g.
organism_ruleset.py:120-121).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

Severity = str  # 'error' | 'warning'
Tier = str  # 'mandatory' | 'recommended' | 'optional'

ERROR = "error"
WARNING = "warning"

SENTINELS = [
    "not applicable",
    "not collected",
    "not provided",
    "restricted access",
]

# tier -> sentinel value -> resulting severity (absent = pass)
MISSING_VALUE_POLICY: dict[Tier, dict[str, Severity]] = {
    "mandatory": {
        "not applicable": ERROR,
        "not collected": ERROR,
        "not provided": ERROR,
        "restricted access": WARNING,
    },
    "recommended": {
        "not collected": WARNING,
        "not provided": WARNING,
    },
    "optional": {s: ERROR for s in SENTINELS},
}


@dataclass(frozen=True)
class RuleSpec:
    """One declarative rule.

    kind names an expression builder registered in rules.library.
    columns[0] is the primary target; extra columns feed cross-column
    kinds (e.g. date_by_unit reads the unit column).
    """

    rule_id: str
    kind: str
    columns: tuple[str, ...]
    params: dict[str, Any] = field(default_factory=dict)
    severity: Severity = ERROR
    tier: Tier | None = None  # None = no sentinel wrapping
    # When True, sentinel values silently pass this rule (the column's
    # presence rule owns sentinel reporting — avoids double-counting the
    # way Pydantic fires one validator chain per field, not per check).
    skip_sentinels: bool = False

    def __post_init__(self) -> None:
        if self.severity not in (ERROR, WARNING):
            raise ValueError(f"bad severity {self.severity!r}")
        if self.tier is not None and self.tier not in MISSING_VALUE_POLICY:
            raise ValueError(f"bad tier {self.tier!r}")


def ruleset_hash(rules: list[RuleSpec]) -> str:
    """Stable hash of a ruleset — recorded in the checkpoint manifest so a
    changed ruleset invalidates prior partition checkpoints."""
    import hashlib
    import json

    payload = json.dumps(
        [
            {
                "rule_id": r.rule_id,
                "kind": r.kind,
                "columns": list(r.columns),
                "params": r.params,
                "severity": r.severity,
                "tier": r.tier,
                "skip_sentinels": r.skip_sentinels,
            }
            for r in sorted(rules, key=lambda r: r.rule_id)
        ],
        sort_keys=True,
        default=str,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]
