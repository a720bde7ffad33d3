"""Job surfaces for the training-data pipeline (dedup CLI) and the live
HTTP serving analog (E2/E3 — reference app.py:60-161)."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),                                   # exact dup of 1
        (3, base.replace("lazy", "sleepy")),         # near dup of 1
        (4, base + " entirely"),                     # near dup of 1
        (5, "completely different words about spark and distributed query engines"),
        (6, "der hund und die katze und das pferd in dem haus der ein nicht"),
        (7, "short"),                                # fails min_words
        (8, "!!! ??? ... ;;; ::: --- !!! ??? ... ;;;"),  # fails alpha ratio
    ]
    path = str(tmp_path_factory.mktemp("corpus") / "docs.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(path)
    return path


def test_dedup_pipeline_stages(spark, corpus):
    """Stage order is enforced by the tool: exact collapse first, minhash
    near-dup over survivors, quality/langid filter last — each stage's
    in/kept counts are reported."""
    from faang_pydantics_validation_spark.jobs.dedup_cli import run_dedup_pipeline

    docs = spark.read.parquet(corpus)
    res = run_dedup_pipeline(
        spark, docs, threshold=0.5, num_hashes=32, bands=8,
        min_words=3, min_alpha_ratio=0.5,
    )
    by = {s["stage"]: s for s in res["stages"]}
    assert by["exact_dedup"]["in"] == 8 and by["exact_dedup"]["kept"] == 7  # 2 dropped
    # near-dups 3 and 4 collapse into 1 (greedy keep-lowest-id)
    assert by["near_dedup_minhash"]["kept"] == 5
    # 7 (too short) and 8 (punctuation soup) dropped by quality
    kept_ids = {r["doc_id"] for r in res["kept"].collect()}
    assert kept_ids == {1, 5, 6}

    # language allowlist composes
    res_en = run_dedup_pipeline(
        spark, docs, threshold=0.5, num_hashes=32, bands=8,
        min_words=3, min_alpha_ratio=0.5, langs=["en"],
    )
    assert {r["doc_id"] for r in res_en["kept"].collect()} == {1, 5}


def test_dedup_cli_smoke(spark, corpus, tmp_path, monkeypatch):
    from pyspark.sql import SparkSession

    from faang_pydantics_validation_spark.jobs.dedup_cli import main

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)
    out = str(tmp_path / "out")
    rc = main(["--input", corpus, "--out", out, "--threshold", "0.5",
               "--num-hashes", "32", "--bands", "8", "--min-words", "3",
               "--report"])
    assert rc == 0
    report = json.load(open(f"{out}/report.json"))
    assert [s["stage"] for s in report["stages"]] == [
        "exact_dedup", "near_dedup_minhash", "quality_langid_filter"
    ]
    kept = spark.read.parquet(f"{out}/kept")
    assert kept.count() == report["stages"][-1]["kept"] > 0


@pytest.fixture(scope="module")
def http_srv(spark):
    from http.server import HTTPServer

    from faang_pydantics_validation_spark.jobs.serve_http import make_handler

    srv = HTTPServer(("127.0.0.1", 0), make_handler(spark, {}))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_validate_roundtrip(http_srv):
    code, health = 200, None
    with urllib.request.urlopen(f"{http_srv}/health") as r:
        health = json.loads(r.read())
    assert health == {"status": "ok"}

    records = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello",
         "tool": None, "ts": "2026-03-01T10:00:00"},
        {"conv_id": "c1", "turn_idx": 1, "role": "", "text": "x",
         "tool": None, "ts": "2026-03-01T10:00:05"},
    ]
    code, out = _post(f"{http_srv}/validate", {"records": records})
    assert code == 200 and out["status"] == "success"
    assert out["verdicts"][0]["verdict"] == "fail"
    assert any(v["rule_id"] == "R_role_required" for v in out["violations"])

    # P17 unknown field -> structured error payload, HTTP 422
    code, out = _post(f"{http_srv}/validate", [{"conv_id": "c", "surprise": 1}])
    assert code == 422 and out["status"] == "error"
    assert out["violations"][0]["rule_id"] == "R_unknown_column"

    # malformed body -> 400
    req = urllib.request.Request(
        f"{http_srv}/validate", data=b"{not json",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        urllib.request.urlopen(req)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
