#!/usr/bin/env python3
"""Regenerate SURVEY.md's query-surface counts from round-close artifacts
(VERDICT r11 #7: the survey is the blueprint — its numbers must be
generated, not hand-maintained, so they cannot drift from the artifact).

Reads CORRECTNESS_SELF.json (oracle-checked count) and the Verify dump
dir (total dumped queries + oracle_sql.json), then rewrites the block
between the survey's generated-counts markers.
"""
import json
import os
import re
import sys

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_roundclose"
survey = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")

summary = json.load(open("CORRECTNESS_SELF.json"))
oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
dumped = sorted(d for d in os.listdir(out_dir)
                if os.path.isdir(os.path.join(out_dir, d))
                and not d.startswith("_") and d != "oracle_sql.json")
total = len(dumped)
checked = summary["n_total"]
matched = summary["n_match"]
rows_only = sorted(set(dumped) - set(oracles))

block = (
    "<!-- generated-counts:start (scripts/update_survey_counts.py — do not hand-edit) -->\n"
    f"Driver query surface (generated at round close): **{total} queries "
    f"dumped; {matched}/{checked} oracle-checked MATCH; "
    f"{len(rows_only)} rows-only by design** "
    f"({', '.join(rows_only) if rows_only else 'none'}).\n"
    "<!-- generated-counts:end -->"
)

text = open(survey).read()
pat = re.compile(
    r"<!-- generated-counts:start.*?<!-- generated-counts:end -->", re.S)
if pat.search(text):
    text = pat.sub(block, text)
else:
    # first run: install the block right under the §8 heading line
    m = re.search(r"^## 8\..*$", text, re.M)
    if not m:
        sys.exit("SURVEY.md: cannot find the §8 heading")
    text = text[: m.end()] + "\n\n" + block + text[m.end():]

open(survey, "w").write(text)
print(f"SURVEY.md counts: {total} queries, {matched}/{checked} matched, "
      f"{len(rows_only)} rows-only")
