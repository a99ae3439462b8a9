"""CLI entry point — the ``ray job submit`` surface (SURVEY.md S2/S3).

Usage (each owns its Ray session; on a cluster drop ``--local``)::

    python -m faang_pydantics_validation_ray.cli validate \
        --input /tmp/fpv_imgtable/n2000_s42_f4_v1_d1 --out /tmp/run1 \
        [--profile ref_profile.parquet] [--resume/--no-resume] [--report]

    python -m faang_pydantics_validation_ray.cli build-profile \
        --input <clean_table_dir> --out profile.parquet

    python -m faang_pydantics_validation_ray.cli export \
        --input <table_dir> --out /tmp/export

On a multi-node cluster this module is the entrypoint for
``ray job submit -- python -m faang_pydantics_validation_ray.cli validate …``
(the driver connects to the cluster instead of local mode).
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(args):
    import ray
    if not ray.is_initialized():
        ray.init(address="local" if args.local else "auto",
                 include_dashboard=False, logging_level="ERROR",
                 **({"num_cpus": args.num_cpus} if args.num_cpus else {}))
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False
    return ray


def _serve(args) -> int:
    """Stdlib-http analog of the reference service (app.py:16-138): a
    module-level-singleton-style setup — rulesets compiled ONCE before the
    first request (the reference's warm caches) — then POST /validate maps
    a JSON submission body to ``validate_many`` with the same
    400-on-malformed-JSON contract the ``validate-submission
    --strict-json`` CLI reproduces. Single-threaded by design: the heavy
    lifting is Ray-parallel per request; a batch engine fronted by a toy
    server needs no request concurrency."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from .pipelines.queries import (
        ruleset_customer, ruleset_events, ruleset_lineitem, ruleset_orders,
    )
    from .pipelines.unified import validate_many
    from .sources.readers import submission_datasets

    rulesets = {t: f()[0] for t, f in
                {"orders": ruleset_orders, "lineitem": ruleset_lineitem,
                 "customer": ruleset_customer,
                 "events": ruleset_events}.items()}

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj) -> None:
            body = json.dumps(obj, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):             # noqa: N802 (stdlib handler name)
            if self.path != "/validate":
                self._send(404, {"status": 404, "error": "not found",
                                 "detail": "POST /validate"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                doc = json.loads(self.rfile.read(n))
                dss = submission_datasets(doc)
            except (json.JSONDecodeError, ValueError) as e:
                # reference app.py:101-138: malformed body is a CLIENT error
                self._send(400, {"status": 400,
                                 "error": "malformed submission JSON",
                                 "detail": str(e)})
                return
            unknown = sorted(set(dss) - set(rulesets))
            if unknown:
                self._send(400, {"status": 400,
                                 "error": f"no ruleset for record types "
                                          f"{unknown}",
                                 "detail": f"known: {sorted(rulesets)}"})
                return
            out = validate_many({t: (dss[t], rulesets[t]) for t in dss})
            self._send(200, json.loads(out.to_json(orient="records")))

        def log_message(self, *a):     # keep stdout to the one status line
            pass

    httpd = HTTPServer((args.host, args.port), Handler)
    print(json.dumps({"serving": f"http://{args.host}:{args.port}/validate",
                      "record_types": sorted(rulesets)}), flush=True)
    if args.max_requests:
        for _ in range(args.max_requests):
            httpd.handle_request()
    else:                              # pragma: no cover — interactive mode
        httpd.serve_forever()
    return 0


def main(argv=None) -> int:
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--local", action="store_true", default=True)
    common.add_argument("--num-cpus", type=int, default=None)
    p = argparse.ArgumentParser(prog="faang_pydantics_validation_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="checkpointed validation run",
                       parents=[common])
    v.add_argument("--input", required=True)
    v.add_argument("--out", required=True)
    v.add_argument("--profile", default=None)
    v.add_argument("--no-resume", dest="resume", action="store_false")
    v.add_argument("--report", action="store_true")

    b = sub.add_parser("build-profile", help="reference profile from clean table",
                       parents=[common])
    b.add_argument("--input", required=True)
    b.add_argument("--out", required=True)

    e = sub.add_parser("export", help="clean-row export", parents=[common])
    e.add_argument("--input", required=True)
    e.add_argument("--out", required=True)

    s = sub.add_parser("validate-submission",
                       help="reference-style JSON submission: every record "
                            "type validated, per-type + total summary",
                       parents=[common])
    s.add_argument("--input", required=True, help="submission .json path")
    s.add_argument("--out", default=None, help="optional summary.json path")
    s.add_argument("--strict-json", action="store_true",
                   help="malformed/mis-shaped JSON → one structured error "
                        "line (the reference service's HTTP-400 body, "
                        "app.py:101-138) and exit code 2, never a traceback")

    srv = sub.add_parser(
        "serve",
        help="minimal HTTP service analog of the reference's FastAPI app "
             "(POST /validate, app.py:101-138): JSON submission body → "
             "per-type + total summary; malformed body → 400 JSON",
        parents=[common])
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=8337)
    srv.add_argument("--max-requests", type=int, default=None,
                     help="serve N requests then exit (tests); default "
                          "serve forever")

    args = p.parse_args(argv)
    ray = _session(args)
    try:
        if args.cmd == "validate":
            from .state.checkpoint import run_validation_checkpointed
            summary = run_validation_checkpointed(
                args.input, args.out, ref_profile_path=args.profile,
                resume=args.resume)
            print(json.dumps(summary, default=str))
            if args.report:
                import pandas as pd
                verd = pd.read_parquet(f"{args.out}/verdicts.parquet")
                print(verd.to_string())
        elif args.cmd == "build-profile":
            import ray.data as rd
            from .pipelines.profile import build_reference_profile, save_profile
            prof = build_reference_profile(rd.read_parquet(f"{args.input}/images"))
            save_profile(prof, args.out)
            print(json.dumps({c: p.summary() for c, p in prof.items()},
                             default=str))
        elif args.cmd == "export":
            import os

            import pyarrow.parquet as pq
            import ray.data as rd
            from .pipelines.export import export_clean_images
            cap_path = os.path.join(args.input, "captions.parquet")
            voc_path = os.path.join(args.input, "vocab.parquet")
            ds = export_clean_images(
                rd.read_parquet(f"{args.input}/images"), out_dir=args.out,
                captions_ds=rd.read_parquet(cap_path)
                if os.path.exists(cap_path) else None,
                vocab=pq.read_table(voc_path).column("label").to_pylist()
                if os.path.exists(voc_path) else None)
            print(json.dumps({"exported_rows": ds.count()}))
        elif args.cmd == "validate-submission":
            from .pipelines.queries import (
                ruleset_customer, ruleset_events, ruleset_lineitem,
                ruleset_orders,
            )
            from .pipelines.unified import validate_many
            from .sources.readers import read_submission_json
            known = {"orders": ruleset_orders, "lineitem": ruleset_lineitem,
                     "customer": ruleset_customer, "events": ruleset_events}
            try:
                dss = read_submission_json(args.input)
            except (json.JSONDecodeError, ValueError) as e:
                if not args.strict_json:
                    raise      # legacy path: traceback on stderr, empty stdout
                # reference app.py:101-138: a malformed body is a CLIENT
                # error — structured 400-style record, no traceback
                err = {"status": 400, "error": "malformed submission JSON",
                       "detail": str(e), "input": args.input}
                print(json.dumps(err))
                return 2
            unknown = sorted(set(dss) - set(known))
            if unknown:
                raise SystemExit(f"no ruleset for record types {unknown}; "
                                 f"known: {sorted(known)}")
            out = validate_many({t: (dss[t], known[t]()[0]) for t in dss})
            print(out.to_json(orient="records"))
            if args.out:
                out.to_json(args.out, orient="records")
        elif args.cmd == "serve":
            return _serve(args)
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
