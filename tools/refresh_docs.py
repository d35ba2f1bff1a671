"""Regenerate the doc numbers that drift (VERDICT r4 item 8).

Two sources of truth, patched into the prose instead of typed by hand:

* **Test count** — ``pytest --collect-only -q`` — rewritten into README.md's
  ``tests/   N tests:`` line.
* **Live bench numbers** — ``.bench_cache.json`` (written by every
  ``bench.py`` run) — spliced between ``<!--BENCH:dotted.path-->`` /
  ``<!--/BENCH-->`` markers anywhere in README.md / docs/*.md.  A marker
  whose path is missing from the cache is left untouched (and reported).

Run after a bench run or after adding tests:

    python tools/refresh_docs.py          # patch files in place
    python tools/refresh_docs.py --check  # exit 1 if anything is stale
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", "docs/BENCHMARKS.md", "docs/DESIGN.md", "docs/API.md",
        "docs/COMPONENT_MAP.md", "docs/DEPLOYMENT.md", "docs/PARITY_NOTES.md"]
MARK = re.compile(r"<!--BENCH:([\w.]+)-->(.*?)<!--/BENCH-->", re.S)


def collect_test_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        cwd=REPO, capture_output=True, text=True, timeout=600)
    m = re.search(r"(\d+) tests collected", out.stdout)
    if m:
        return int(m.group(1))
    # this pytest's -q collect prints per-file "path: N" lines, no summary
    per_file = re.findall(r"^tests/\S+: (\d+)$", out.stdout, re.M)
    if per_file:
        return sum(int(n) for n in per_file)
    raise RuntimeError(f"could not parse collect-only output:\n"
                       f"{out.stdout[-500:]}{out.stderr[-500:]}")


def cache_lookup(cache: dict, path: str):
    cur = cache
    for part in path.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def fmt(v) -> str:
    if isinstance(v, float):
        if 0 < abs(v) < 1:  # keep significant digits (0.004 must not
            return f"{v:.3g}"  # splice in as "0")
        return f"{v:,.2f}".rstrip("0").rstrip(".")
    if isinstance(v, int):
        return f"{v:,}"
    return str(v)


def refresh(check: bool = False) -> int:
    stale = []
    cache_path = os.path.join(REPO, ".bench_cache.json")
    cache = (json.load(open(cache_path))
             if os.path.exists(cache_path) else {})

    n_tests = collect_test_count()
    for rel in DOCS:
        p = os.path.join(REPO, rel)
        if not os.path.exists(p):
            continue
        text = orig = open(p).read()
        text = re.sub(r"(\btests/\s+)\d+( tests:)",
                      rf"\g<1>{n_tests}\g<2>", text)

        def sub(m):
            val = cache_lookup(cache, m.group(1))
            if val is None:
                print(f"  {rel}: no cache value for BENCH:{m.group(1)} "
                      "(left as-is)")
                return m.group(0)
            return f"<!--BENCH:{m.group(1)}-->{fmt(val)}<!--/BENCH-->"

        text = MARK.sub(sub, text)
        if text != orig:
            stale.append(rel)
            if not check:
                open(p, "w").write(text)
                print(f"refreshed {rel}")
    if check and stale:
        print(f"STALE: {stale} (run tools/refresh_docs.py)")
        return 1
    if not stale:
        print(f"docs up to date ({n_tests} tests)")
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    raise SystemExit(refresh(check=ap.parse_args().check))
