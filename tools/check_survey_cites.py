#!/usr/bin/env python3
"""Verify every graft-module cite in SURVEY.md resolves.

Extracts each `<path>.scala[:line]` reference, checks the file exists
under src/main/scala/graft (bare names like `CdcStream.scala` are
resolved by basename), and that any cited line number is within the
file. Run from the repo root; exits non-zero on drift so the round
workflow catches stale cites the moment a refactor moves a module.
"""
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "src", "main", "scala", "graft")

by_basename = {}
for dirpath, _, files in os.walk(os.path.join(ROOT, "src")):
    for f in files:
        if f.endswith(".scala"):
            by_basename.setdefault(f, []).append(os.path.join(dirpath, f))

text = open(os.path.join(ROOT, "SURVEY.md")).read()
cites = re.findall(r"(/?[A-Za-z][A-Za-z0-9_/]*\.scala)(?::(\d+))?", text)

bad = []
checked = 0
for path, line in cites:
    if path.startswith("/root/repo/"):
        cand = [path]
    elif "/" in path:
        cand = [os.path.join(SRC, path)]
    else:
        cand = by_basename.get(path, [])
    hit = next((c for c in cand if os.path.exists(c)), None)
    if hit is None:
        bad.append(f"{path}: file not found")
        continue
    checked += 1
    if line:
        n = sum(1 for _ in open(hit))
        if int(line) > n:
            bad.append(f"{path}:{line}: file has only {n} lines")

if bad:
    print(f"SURVEY.md cite drift ({len(bad)}):")
    for b in sorted(set(bad)):
        print(f"  {b}")
    sys.exit(1)
print(f"all {checked} SURVEY.md module cites resolve")
