"""Citation audit: every `/root/reference/...` path mentioned in repo source
docstrings/comments (and the repo markdown) must resolve to a real file, and
any `:LINE` suffix must be within the file's line count.  Keeps the repo's
reference-citation discipline falsifiable (VERDICT r4 "What's wrong" #2 found
one fabricated citation; this prevents regressions).

Usage: python tools/citecheck.py  → exits 0 iff zero dangling citations.
Importable: `collect_bad()` returns the list, used by tests/test_citations.py.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
# Two citation forms: the absolute `/root/reference/<path>[:line[-line]]` and
# the bare `lib/foo.js:12-34` / `test/foo.spec.js:5` shorthand used in most
# docstrings (both resolve under /root/reference/).
CITE = re.compile(
    r"(?:/root/reference/([\w./-]+?)|\b((?:lib|test)/[\w.-]+\.js))"
    r"(?::(\d+)(?:-(\d+))?)?(?=[^\w./-]|$)")

SCAN_DIRS = ("marc_record_merge_melindautils_ray", "tests", "tools")
SCAN_MD = ("SURVEY.md", "README.md", "COVERAGE.md", "BASELINE.md", "FIXTURES.md")


def _line_count(path: str, cache: dict) -> int:
    if path not in cache:
        with open(path, "rb") as f:
            cache[path] = f.read().count(b"\n") + 1
    return cache[path]


def collect_bad() -> list[str]:
    files: list[str] = []
    self_path = os.path.abspath(__file__)
    for d in SCAN_DIRS:
        for root, _, names in os.walk(os.path.join(REPO, d)):
            files += [os.path.join(root, n) for n in names
                      if n.endswith(".py")
                      and os.path.join(root, n) != self_path]
    files += [os.path.join(REPO, m) for m in SCAN_MD
              if os.path.exists(os.path.join(REPO, m))]
    bad: list[str] = []
    lc_cache: dict = {}
    for fp in files:
        try:
            text = open(fp, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for lineno, line in enumerate(text.splitlines(), 1):
            for m in CITE.finditer(line):
                rel = m.group(1) or m.group(2)
                a, b = m.group(3), m.group(4)
                tgt = os.path.join(REF, rel.rstrip("."))
                where = f"{os.path.relpath(fp, REPO)}:{lineno}"
                if not os.path.exists(tgt):
                    bad.append(f"{where}: dangling reference path {tgt}")
                    continue
                if a and os.path.isfile(tgt):
                    n = _line_count(tgt, lc_cache)
                    hi = int(b) if b else int(a)
                    if int(a) < 1 or hi > n:
                        bad.append(
                            f"{where}: line {a}{'-' + b if b else ''} out of "
                            f"range for {tgt} ({n} lines)")
    return bad


if __name__ == "__main__":
    problems = collect_bad()
    for p in problems:
        print(p)
    print(f"{len(problems)} dangling citation(s)")
    sys.exit(1 if problems else 0)
