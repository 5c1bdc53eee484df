#!/usr/bin/env python3
"""Executable REST-contract parity: the reference's backend_api.py (run
in-process, unmodified, via Flask's test client through a sandbox
symlink) vs the engine's RestServer (graft.api.RestParityMain over real
HTTP), compared endpoint by endpoint on the JSON SHAPES the reference's
frontend consumes:

  GET  /scripts       -> 200 {"scripts":[...]}
  POST /run           -> 200 {"stdout","stderr","returncode"} for a
                         COMPLETED stage (a failing stage is returncode
                         != 0, NOT an HTTP error), 4xx {"error"} for an
                         invalid name
  GET  /output-files  -> 200 {"files":[...]}
  GET  /output/<f>    -> 200 {"content":"..."} / 404 {"error"}

The engine may carry EXTRA keys (stage/ok/seconds/log); the contract is
that every key the reference emits exists with the same status-code
class and semantics. Driver-side tooling only (flask); the engine
library has no Python.

Usage: python3 tools/rest_parity.py
"""

import importlib.util
import json
import os
import re
import shutil
import signal
import socket
import subprocess
import sys
import tempfile
import time

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

failures = []


def check(name, cond, detail=""):
    tag = "ok  " if cond else "FAIL"
    print(f"[restparity] {tag} {name}" + (f" — {detail}" if detail else ""))
    if not cond:
        failures.append(name)


def ref_client(sb):
    """backend_api.py imported from a sandbox (its CLEANING_DIR/OUTPUT_DIR
    are __file__-relative) with two canned scripts mirroring the engine's
    canned stages."""
    shutil.copy(os.path.join(REF, "backend_api.py"),
                os.path.join(sb, "backend_api.py"))
    os.makedirs(os.path.join(sb, "cleaning"))
    os.makedirs(os.path.join(sb, "output"))
    with open(os.path.join(sb, "cleaning", "ok_stage.py"), "w") as f:
        f.write("print('stage completed fine')\n")
    with open(os.path.join(sb, "cleaning", "fail_stage.py"), "w") as f:
        f.write("import sys\nsys.exit('stage failed')\n")
    with open(os.path.join(sb, "output", "result.txt"), "w") as f:
        f.write("hello artifact")
    spec = importlib.util.spec_from_file_location(
        "ref_api", os.path.join(sb, "backend_api.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # app.run is __main__-guarded
    return mod.app.test_client()


def start_engine(sb):
    os.makedirs(os.path.join(sb, "eng_output"))
    with open(os.path.join(sb, "eng_output", "result.txt"), "w") as f:
        f.write("hello artifact")
    proc = subprocess.Popen(
        ["sbt", "-batch",
         f"runMain graft.api.RestParityMain {os.path.join(sb, 'eng_output')}"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, preexec_fn=os.setsid)
    port = None
    deadline = time.time() + 300
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        m = re.search(r"\[restparity\] listening on :(\d+)", line)
        if m:
            port = int(m.group(1))
            break
    if port is None:
        sys.exit("[restparity] engine server never came up")
    return proc, port


def http(port, method, path, body=None):
    """Minimal HTTP/1.1 client (stdlib http.client)."""
    import http.client
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    headers = {"Content-Type": "application/json"} if body else {}
    conn.request(method, path, body=body, headers=headers)
    r = conn.getresponse()
    data = r.read().decode("utf-8")
    conn.close()
    try:
        parsed = json.loads(data)
    except json.JSONDecodeError:
        parsed = None
    return r.status, parsed


def main():
    sb = tempfile.mkdtemp(prefix="restparity_")
    ref = ref_client(sb)
    proc, port = start_engine(sb)
    try:
        # --- GET /scripts ---
        rr = ref.get("/scripts")
        es, ej = http(port, "GET", "/scripts")
        rj = rr.get_json()
        check("/scripts status", rr.status_code == 200 and es == 200)
        check("/scripts shape", set(rj) == {"scripts"} and "scripts" in ej,
              f"ref={rj} eng={ej}")
        check("/scripts lists the stages",
              {"ok_stage.py", "fail_stage.py"} <= set(rj["scripts"]) and
              {"ok_stage", "fail_stage"} <= set(ej["scripts"]),
              f"eng={ej['scripts']}")

        # --- POST /run, completed OK ---
        rr = ref.post("/run", json={"script": "ok_stage.py"})
        es, ej = http(port, "POST", "/run",
                      json.dumps({"stage": "ok_stage"}))
        rj = rr.get_json()
        check("/run ok status", rr.status_code == 200 and es == 200)
        check("/run ok keys",
              {"stdout", "stderr", "returncode"} <= set(rj) and
              {"stdout", "stderr", "returncode"} <= set(ej),
              f"ref={sorted(rj)} eng={sorted(ej)}")
        check("/run ok returncode", rj["returncode"] == 0
              and ej["returncode"] == 0)
        check("/run ok stdout carries the stage output",
              "stage completed fine" in rj["stdout"]
              and "stage completed fine" in ej["stdout"])

        # --- POST /run, stage FAILS: 200 + returncode != 0, not an HTTP error
        rr = ref.post("/run", json={"script": "fail_stage.py"})
        es, ej = http(port, "POST", "/run",
                      json.dumps({"stage": "fail_stage"}))
        rj = rr.get_json()
        check("/run fail status (completed = 200)",
              rr.status_code == 200 and es == 200)
        check("/run fail returncode nonzero",
              rj["returncode"] != 0 and ej["returncode"] != 0)
        check("/run fail stderr carries the failure",
              "stage failed" in rj["stderr"] and "stage failed" in ej["stderr"])

        # --- POST /run, invalid name: 4xx {"error"} ---
        rr = ref.post("/run", json={"script": "nope.py"})
        es, ej = http(port, "POST", "/run", json.dumps({"stage": "nope"}))
        rj = rr.get_json()
        check("/run unknown: 4xx + error key",
              rr.status_code in (400, 404) and es in (400, 404) and
              "error" in rj and "error" in ej)

        # --- GET /output-files ---
        rr = ref.get("/output-files")
        es, ej = http(port, "GET", "/output-files")
        rj = rr.get_json()
        check("/output-files shape",
              rr.status_code == 200 and es == 200 and
              set(rj) == {"files"} and "files" in ej)
        check("/output-files lists the artifact",
              "result.txt" in rj["files"] and "result.txt" in ej["files"])

        # --- GET /output/<f> ---
        rr = ref.get("/output/result.txt")
        es, ej = http(port, "GET", "/output/result.txt")
        rj = rr.get_json()
        check("/output content shape",
              rr.status_code == 200 and es == 200 and
              set(rj) == {"content"} and "content" in ej)
        check("/output content matches the file bytes",
              rj["content"] == "hello artifact"
              and ej["content"] == "hello artifact")

        rr = ref.get("/output/missing.txt")
        es, ej = http(port, "GET", "/output/missing.txt")
        rj = rr.get_json()
        check("/output missing: 404 + error key",
              rr.status_code == 404 and es == 404 and
              "error" in rj and "error" in ej)
    finally:
        os.killpg(os.getpgid(proc.pid), signal.SIGTERM)
    if failures:
        print(f"[restparity] {len(failures)} contract check(s) failed")
        sys.exit(1)
    print("[restparity] green — engine REST answers carry the reference's "
          "JSON contract on every endpoint")


if __name__ == "__main__":
    main()
