#!/usr/bin/env python3
"""Refresh SURVEY.md §8 line anchors of the form
`SparkEntry.scala:<n>` on rows whose first cell is a backticked gate
query name: the anchor is rewritten to the query's CURRENT definition
line in src/main/scala/graft/SparkEntry.scala. Rows whose query no
longer exists are reported (not deleted). Idempotent; run after any
SparkEntry edit that shifts lines.
"""
import re, sys

SRC = "src/main/scala/graft/SparkEntry.scala"
SURVEY = "SURVEY.md"

src = open(SRC).read().splitlines()
defs = {}
for i, l in enumerate(src):
    m = re.match(r'    "([a-z0-9_]+)" -> \(\(s, dir\)', l)
    if m:
        defs[m.group(1)] = i + 1

out, fixed, missing = [], 0, []
for line in open(SURVEY).read().splitlines():
    m = re.match(r'\| `([a-z0-9_]+)` \| `SparkEntry\.scala:(\d+)` \|', line)
    if m:
        name, old = m.group(1), int(m.group(2))
        if name in defs:
            if defs[name] != old:
                line = line.replace(f"`SparkEntry.scala:{old}`",
                                    f"`SparkEntry.scala:{defs[name]}`", 1)
                fixed += 1
        else:
            missing.append(name)
    out.append(line)

open(SURVEY, "w").write("\n".join(out) + "\n")
print(f"refreshed {fixed} anchors; {len(missing)} rows without a live query")
for n in missing:
    print("  MISSING:", n)
sys.exit(1 if missing else 0)
