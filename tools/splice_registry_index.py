#!/usr/bin/env python3
"""Regenerate SURVEY.md §2.11 in place (round 12).

Runs gen_registry_index.py and splices its table over the current §2.11
table body, updating the heading's operator count. One command instead of
a generate-then-hand-paste ritual: RegistryIndexSpec fails `sbt test` when
the committed table drifts from the code, and this is the command that
makes it pass again. Run from the repo root.
"""
import re, subprocess, sys

gen = subprocess.run(
    [sys.executable, "tools/gen_registry_index.py"],
    capture_output=True, text=True)
sys.stderr.write(gen.stderr)
if gen.returncode != 0:
    sys.exit(gen.returncode)
new_rows = [l + "\n" for l in gen.stdout.splitlines() if l.startswith("| `")]
if not new_rows:
    sys.exit("generator produced no rows")

lines = open("SURVEY.md").read().splitlines(keepends=True)
start = next(i for i, l in enumerate(lines) if l.startswith("### 2.11"))
end = len(lines)
for i in range(start + 1, len(lines)):
    if lines[i].startswith("## ") or lines[i].startswith("### "):
        end = i
        break
body = [i for i in range(start + 1, end) if lines[i].startswith("| `")]
if not body:
    sys.exit("no existing table body found under the 2.11 heading")
lines[start] = re.sub(r"\d+ operators", f"{len(new_rows)} operators",
                      lines[start])
out = lines[:body[0]] + new_rows + lines[body[-1] + 1:]
open("SURVEY.md", "w").write("".join(out))
print(f"spliced {len(new_rows)} rows; heading: {lines[start].strip()}")
