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


def test_dedup_pipeline_failure_releases_cache_mark(spark, corpus):
    """A pipeline that throws mid-flight must not orphan its live cache
    mark: an unreleased mark permanently bounds every later default-scope
    release_caches(0) in a long-lived driver, re-creating the session-wide
    leak the scoped registry exists to prevent."""
    import pytest

    from faang_pydantics_validation_spark.jobs.dedup_cli import run_dedup_pipeline
    from faang_pydantics_validation_spark.operators import dedup as DD

    marks_before = list(DD._LIVE_MARKS)
    caches_before = len(DD._CACHES)
    docs = spark.read.parquet(corpus)
    with pytest.raises(Exception):
        run_dedup_pipeline(spark, docs, text_col="no_such_column")
    assert DD._LIVE_MARKS == marks_before
    assert len(DD._CACHES) == caches_before


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


def test_build_dims_job(spark, tmp_path):
    """jobs/build_dims.py: an OLS-export-shaped dump compiles into
    dim_tools + term_closure (canonical ':' term ids, transitive
    is_a_path) and a registry dump into dim_conversations — then the
    FUSED plan consumes the built dims directly: unknown tools and
    unknown conversations fire J1/J6 off the parquet this job wrote."""
    import datetime as dt

    from faang_pydantics_validation_spark.jobs.build_dims import build_dims
    from faang_pydantics_validation_spark.plans.fused import (
        validate_transcripts_fused,
    )

    terms = [
        # underscore form in the dump -> colon-canonical in the dim (P3)
        {"term": "TOOL_0001", "label": "label_0001", "family": "search",
         "parents": ["TOOL:0000"]},
        {"term": "TOOL:0002", "label": "label_0002", "family": "code",
         "parents": ["TOOL:0001"]},
        {"term": "TOOL:0000", "label": "root", "family": "search"},
    ]
    convs = [
        {"conv_id": "c_known", "expected_roles": ["user"], "species_tag": "s0"},
        {"conv_id": "c_known", "expected_roles": ["user"], "species_tag": "s0"},
    ]
    tpath, cpath = str(tmp_path / "terms.json"), str(tmp_path / "convs.json")
    with open(tpath, "w") as f:
        json.dump(terms, f)
    with open(cpath, "w") as f:
        json.dump(convs, f)
    out = str(tmp_path / "dims")
    counts = build_dims(spark, out, terms_path=tpath, conversations_path=cpath)
    assert counts == {"dim_tools": 3, "term_closure": 3, "dim_conversations": 1}

    dim_tools = spark.read.parquet(f"{out}/dim_tools")
    assert {r["tool_id"] for r in dim_tools.collect()} == {
        "TOOL:0000", "TOOL:0001", "TOOL:0002"
    }
    closure = {
        r["term"]: list(r["is_a_path"])
        for r in spark.read.parquet(f"{out}/term_closure").collect()
    }
    # transitive: 0002 -> 0001 -> 0000
    assert closure["TOOL:0002"] == ["TOOL:0000", "TOOL:0001", "TOOL:0002"]
    assert closure["TOOL:0000"] == ["TOOL:0000"]

    ts = dt.datetime(2026, 3, 1, 10, 0, 0)
    ds = dt.date(2026, 3, 1)
    facts = spark.createDataFrame(
        [
            ("c_known", 0, "user", "hi", "TOOL:0001", ts, ds),
            ("c_unknown", 0, "user", "hi", "TOOL:9999", ts, ds),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, ds date",
    )
    dims = {
        "dim_tools": dim_tools,
        "dim_conversations": spark.read.parquet(f"{out}/dim_conversations"),
    }
    res = validate_transcripts_fused(facts, dims)
    got = {
        (r["conv_id"], r["rule_id"])
        for r in res.violations.collect()
    }
    assert ("c_unknown", "R_tool_exists") in got
    assert ("c_unknown", "R_conv_known") in got
    assert not any(c == "c_known" for c, _ in got)


def test_build_dims_duplicate_rows_first_write_wins(spark, tmp_path):
    """Duplicate term/conv rows resolve like the reference's dict cache:
    the FIRST row in the dump wins WHOLE — label, family and parent edges
    together. A min()-per-column winner would pick 'alpha' over the first
    row's 'zeta' and union BOTH rows' parent edges into the closure,
    diverging the J3 label-match and J4 subclass verdicts from the
    reference on dumps with duplicate ids."""
    from faang_pydantics_validation_spark.jobs.build_dims import build_dims

    terms = [
        {"term": "TOOL:0001", "label": "zeta", "family": "search",
         "parents": ["TOOL:0002"]},
        {"term": "TOOL:0001", "label": "alpha", "family": "code",
         "parents": ["TOOL:0009"]},
        {"term": "TOOL:0002", "label": "p", "family": "search"},
        {"term": "TOOL:0009", "label": "q", "family": "code"},
    ]
    convs = [
        {"conv_id": "c1", "expected_roles": ["user"], "species_tag": "first"},
        {"conv_id": "c1", "expected_roles": ["assistant"], "species_tag": "second"},
    ]
    tpath, cpath = str(tmp_path / "terms.json"), str(tmp_path / "convs.json")
    with open(tpath, "w") as f:
        json.dump(terms, f)
    with open(cpath, "w") as f:
        json.dump(convs, f)
    out = str(tmp_path / "dims")
    build_dims(spark, out, terms_path=tpath, conversations_path=cpath)

    row = spark.read.parquet(f"{out}/dim_tools").where("tool_id = 'TOOL:0001'").first()
    assert (row["label"], row["family"]) == ("zeta", "search")
    closure = {
        r["term"]: list(r["is_a_path"])
        for r in spark.read.parquet(f"{out}/term_closure").collect()
    }
    # only the FIRST row's parent edge exists: 0001 -> 0002, never 0009
    assert set(closure["TOOL:0001"]) == {"TOOL:0001", "TOOL:0002"}
    assert "TOOL:0009" not in closure["TOOL:0001"]
    conv = spark.read.parquet(f"{out}/dim_conversations").first()
    assert conv["species_tag"] == "first" and list(conv["expected_roles"]) == ["user"]


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


def _post_multipart(url, filename, payload: bytes, content_type=None):
    boundary = "sparkGraftBoundary42"
    head = (
        f"--{boundary}\r\n"
        f'Content-Disposition: form-data; name="file"; filename="{filename}"\r\n'
        "Content-Type: application/json\r\n\r\n"
    ).encode()
    body = head + payload + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        url,
        data=body,
        headers={
            "Content-Type": content_type
            or f"multipart/form-data; boundary={boundary}"
        },
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_validate_file_roundtrip(http_srv):
    """POST /validate-file (E3, app.py:101-149): multipart JSON upload runs
    the same pipeline as /validate and echoes the uploaded filename; the
    422/400 contract matches the JSON endpoint."""
    records = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hello",
         "tool": None, "ts": "2026-03-01T10:00:00"},
        {"conv_id": "c1", "turn_idx": 1, "role": "", "text": "x",
         "tool": None, "ts": "2026-03-01T10:00:05"},
    ]
    code, out = _post_multipart(
        f"{http_srv}/validate-file", "batch.json",
        json.dumps({"records": records}).encode(),
    )
    assert code == 200 and out["status"] == "success"
    assert out["filename"] == "batch.json"
    assert out["verdicts"][0]["verdict"] == "fail"
    assert any(v["rule_id"] == "R_role_required" for v in out["violations"])

    # P17 unknown field -> 422 structured error, filename still echoed
    code, out = _post_multipart(
        f"{http_srv}/validate-file", "bad.json",
        json.dumps([{"conv_id": "c", "surprise": 1}]).encode(),
    )
    assert code == 422 and out["status"] == "error"
    assert out["filename"] == "bad.json"
    assert out["violations"][0]["rule_id"] == "R_unknown_column"

    # malformed JSON inside the uploaded file -> 400
    code, out = _post_multipart(f"{http_srv}/validate-file", "nope.json", b"{oops")
    assert code == 400 and out["status"] == "error"

    # non-multipart body -> 400
    code, out = _post(f"{http_srv}/validate-file", {"records": []})
    assert code == 400 and "multipart" in out["message"]
