"""E2/E3 live HTTP analog: a minimal stdlib http.server wrapper around
serving.validate_json_batch — the long-running counterpart of the
reference's FastAPI app (app.py:60-161). The container ships no
FastAPI/uvicorn, and a Spark driver serves one request at a time anyway
(the SparkSession is not concurrency-safe across queries that share
cached state), so a single-threaded stdlib server IS the honest
equivalent: same endpoints, same payloads, same structured-error contract.

    spark-submit faang_pydantics_validation_spark/jobs/serve_http.py \
        [--port 8642] [--master local[8]]

Endpoints (mirroring app.py):
    POST /validate        body: {"records": [...]} or a bare JSON array
                          -> validate_json_batch payload
                          (status success|error, verdicts, violations,
                          report, exports)
    POST /validate-file   multipart/form-data upload of a JSON file
                          (app.py:101-149) -> same payload + the uploaded
                          filename echoed back; parsed with the stdlib
                          email package (no python-multipart dependency)
    GET  /health          -> {"status": "ok"}

A request with unknown fields returns the P17 structured-error payload
with HTTP 422 (the FastAPI validation-error status); malformed JSON or
multipart gets 400; internal errors 500 with {"status": "error"} —
app.py:92-98's except-Exception contract.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))


def make_handler(spark, dims):
    from faang_pydantics_validation_spark.serving import validate_json_batch

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib naming)
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"status": "error", "message": "not found"})

        def _read_body(self) -> bytes:
            n = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(n)

        @staticmethod
        def _parse_multipart_file(content_type: str, body: bytes):
            """First file part of a multipart/form-data body via the stdlib
            email parser (the reference's python-multipart equivalent,
            app.py:101-105): returns (filename, payload bytes)."""
            import email.parser
            import email.policy

            msg = email.parser.BytesParser(policy=email.policy.HTTP).parsebytes(
                b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body
            )
            if not msg.is_multipart():
                raise ValueError("body is not multipart/form-data")
            for part in msg.iter_parts():
                fname = part.get_filename()
                if fname is not None:
                    return fname, part.get_payload(decode=True)
            raise ValueError("no file part in multipart body")

        @staticmethod
        def _records_of(doc):
            records = doc["records"] if isinstance(doc, dict) else doc
            if not isinstance(records, list):
                raise ValueError("body must be a JSON array or {'records': [...]}")
            return records

        def do_POST(self):  # noqa: N802
            if self.path not in ("/validate", "/validate-file"):
                self._send(404, {"status": "error", "message": "not found"})
                return
            filename = None
            try:
                body = self._read_body()
                if self.path == "/validate-file":
                    filename, payload = self._parse_multipart_file(
                        self.headers.get("Content-Type", ""), body
                    )
                    records = self._records_of(json.loads(payload or b"null"))
                else:
                    records = self._records_of(json.loads(body or b"null"))
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                self._send(400, {"status": "error", "message": f"bad request: {e}"})
                return
            try:
                out = validate_json_batch(spark, records, dims=dims)
            except Exception as e:  # app.py:92-98 except-Exception contract
                self._send(500, {"status": "error", "message": str(e)})
                return
            if filename is not None:
                out = {"filename": filename, **out}  # app.py:147 echo
            self._send(200 if out["status"] == "success" else 422, out)

        def log_message(self, fmt, *args):  # quiet by default
            print(f"{self.address_string()} {fmt % args}", file=sys.stderr)

    return Handler


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="serve synchronous validation over HTTP")
    ap.add_argument("--port", type=int, default=8642)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--master", default=None)
    ap.add_argument("--dims", default=None, help="optional dataset dir with dim_* parquet")
    args = ap.parse_args(argv)

    from faang_pydantics_validation_spark.session import get_spark

    spark = get_spark(master=args.master)
    dims = {}
    if args.dims:
        for name in ("dim_roles", "dim_tools", "dim_conversations", "allowed_transitions"):
            p = os.path.join(args.dims, name)
            if os.path.isdir(p):
                dims[name] = spark.read.parquet(p)
    srv = HTTPServer((args.host, args.port), make_handler(spark, dims))
    print(json.dumps({"serving": f"http://{args.host}:{args.port}/validate"}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.server_close()
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
