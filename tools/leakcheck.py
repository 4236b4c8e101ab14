#!/usr/bin/env python3
"""Repo-local leak scan: greps the source tree for categories of
strings that must never appear in a public, from-public-knowledge-only
codebase (proprietary package roots, internal-looking URLs/buckets,
chat shortlinks, credential material, internal env vars).

The driver emits its own LEAKCHECK.json per round; this emitter exists
so the committed artifact is PROVABLY a fresh scan — it stamps the scan
time, the commit it ran against, and the number of files scanned
(ADVICE r5: a round-number bump alone is indistinguishable from a
hand-edit).

Usage: python3 tools/leakcheck.py [outPath]   (default LEAKCHECK_local.json)
"""
import datetime
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# category -> regex. Deliberately broad: a hit is a human-review flag,
# not automatically a violation.
PATTERNS = {
    "internal-import": r"import\s+com\.(anthropic|internal)\b",
    "internal-url": r"https?://[\w.-]*\b(corp|internal|intranet)\b[\w./-]*",
    "internal-pkg2": r"\b(proprietary|confidential)[-_]?(pkg|lib|sdk)\b",
    "internal-bucket": r"\b(s3|gs)://[\w-]*(internal|corp|prod-secrets)[\w-]*",
    "slack-link": r"\b(slack\.com/archives|go/[a-z][\w-]{2,})\b",
    "api-key": r"\b(sk-[A-Za-z0-9]{20,}|AKIA[0-9A-Z]{16})\b",
    "axon-env": r"\b[A-Z_]*ANTHROPIC[A-Z_]*\b",
}

SCAN_DIRS = ["src", "tools", "project"]
SCAN_FILES = ["build.sbt", "SURVEY.md", "SCALE.md"]
TEXT_EXT = {".scala", ".py", ".sbt", ".md", ".json", ".sql", ".txt", ".yml", ".yaml"}


def iter_files():
    for d in SCAN_DIRS:
        for root, _, files in os.walk(os.path.join(HERE, d)):
            for f in files:
                if os.path.splitext(f)[1] in TEXT_EXT:
                    yield os.path.join(root, f)
    for f in SCAN_FILES:
        p = os.path.join(HERE, f)
        if os.path.exists(p):
            yield p


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        HERE, "LEAKCHECK_local.json")
    compiled = {k: re.compile(v, re.IGNORECASE) for k, v in PATTERNS.items()}
    hits = {k: [] for k in PATTERNS}
    n_files = 0
    self_path = os.path.abspath(__file__)
    for path in iter_files():
        if os.path.abspath(path) == self_path:
            continue  # the pattern table itself is not a leak
        n_files += 1
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        rel = os.path.relpath(path, HERE)
        for lineno, line in enumerate(text.splitlines(), 1):
            for cat, rx in compiled.items():
                if rx.search(line):
                    hits[cat].append(f"{rel}:{lineno}: {line.strip()[:120]}")
    try:
        commit = subprocess.run(["git", "rev-parse", "HEAD"], cwd=HERE,
                                capture_output=True, text=True).stdout.strip()
    except OSError:
        commit = None
    out = {
        "scanned_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
        "commit": commit,
        "n_files_scanned": n_files,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"scanned {n_files} files, {out['n_hits']} hit(s) -> {out_path}")
    return 1 if out["n_hits"] else 0


if __name__ == "__main__":
    sys.exit(main())
