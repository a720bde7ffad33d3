"""Ruleset (de)serialization: rules as JSON documents.

The reference keeps its rulesets twice — JSON-Schema documents
(rulesets-json/*.metadata_rules.json) hand-compiled into Pydantic classes
(rulesets_pydantics/*.py). Here the JSON document IS the ruleset: the
compiler consumes RuleSpec objects loaded straight from it, so adding a
rule to production is a data change, not a code change.

Document shape (one object per rule):
    {"rule_id": "R_role_required", "kind": "required", "columns": ["role"],
     "params": {}, "severity": "error", "tier": "mandatory",
     "skip_sentinels": false}
"""

from __future__ import annotations

import json

from .library import kinds
from .spec import RuleSpec


def rules_to_json(rules: list[RuleSpec]) -> str:
    return json.dumps(
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
            for r in rules
        ],
        indent=1,
    )


def rules_from_json(doc: str | list) -> list[RuleSpec]:
    items = json.loads(doc) if isinstance(doc, str) else doc
    known = set(kinds())
    out = []
    for d in items:
        if d["kind"] not in known:
            raise ValueError(f"rule {d.get('rule_id')}: unknown kind {d['kind']!r} (known: {sorted(known)})")
        out.append(
            RuleSpec(
                rule_id=d["rule_id"],
                kind=d["kind"],
                columns=tuple(d["columns"]),
                params=d.get("params", {}),
                severity=d.get("severity", "error"),
                tier=d.get("tier"),
                skip_sentinels=d.get("skip_sentinels", False),
            )
        )
    ids = [r.rule_id for r in out]
    if len(set(ids)) != len(ids):
        dupes = sorted({i for i in ids if ids.count(i) > 1})
        raise ValueError(f"duplicate rule_ids: {dupes}")
    return out


def load_ruleset(path: str) -> list[RuleSpec]:
    with open(path) as f:
        return rules_from_json(f.read())
