"""E3 analog of the reference's POST /validate-file (app.py:102-153):
validate a JSON file of turn records synchronously and print the full
response payload as JSON.

Usage:
    spark-submit faang_pydantics_validation_spark/jobs/validate_json.py \
        --json records.json [--master local[8]] [--pretty]

The file holds a JSON array of turn objects with keys
(conv_id, turn_idx, role, text, tool, ts[, ds]); unknown keys fail fast
(P17 / pydantic extra='forbid' analog). Exit code 0 on success, 1 on
verdict 'fail', 2 on request errors (bad JSON / unknown fields).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="validate a JSON batch of turns")
    ap.add_argument("--json", required=True, help="path to a JSON array of turn records")
    ap.add_argument("--master", default=None)
    ap.add_argument("--pretty", action="store_true")
    args = ap.parse_args(argv)

    try:
        with open(args.json) as f:
            records = json.load(f)
        if not isinstance(records, list):
            raise ValueError("expected a JSON array of records")
    except (json.JSONDecodeError, ValueError) as e:
        print(json.dumps({"status": "error", "message": f"invalid JSON file: {e}"}))
        return 2

    from faang_pydantics_validation_spark.serving import validate_json_batch
    from faang_pydantics_validation_spark.session import get_spark

    spark = get_spark(master=args.master)
    resp = validate_json_batch(spark, records)
    print(json.dumps(resp, indent=1 if args.pretty else None, default=str))
    spark.stop()
    if resp["status"] != "success":
        return 2
    return 1 if any(v["verdict"] == "fail" for v in resp["verdicts"]) else 0


if __name__ == "__main__":
    raise SystemExit(main())
