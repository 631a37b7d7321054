#!/usr/bin/env python3
"""Regenerate the SURVEY.md §2.11 registry index from the Spec( sites.

Scans src/main/scala for `Spec(` / `Spec.noOracle(` definitions, takes the
first string literal within the next two lines as the operator name, and
prints the markdown table (noOracle rows marked with a dagger). Run from
the repo root; paste the output over the table body in SURVEY.md §2.11.
"""
import os, re, sys

rows = []
for root, _, files in os.walk("src/main/scala"):
    for f in sorted(files):
        if not f.endswith(".scala"):
            continue
        path = os.path.join(root, f)
        lines = open(path).read().splitlines()
        for i, line in enumerate(lines):
            m = re.search(r"\bSpec(\.noOracle)?\(", line)
            if not m:
                continue
            # skip scaladoc/comment mentions and the Spec definition itself
            stripped = line.lstrip()
            if stripped.startswith("*") or stripped.startswith("//"):
                continue
            if "case class Spec" in line or "def apply" in line \
               or "def noOracle" in line or "Spec(name," in line:
                continue  # the Spec companion's own constructors
            no_oracle = bool(m.group(1))
            tail = line[m.end():] + "\n" + "\n".join(lines[i + 1:i + 3])
            nm = re.search(r'"([a-z0-9_]+)"', tail)
            if nm:
                rows.append((nm.group(1), path, i + 1, no_oracle))
            else:
                # Loud, not silent: a Spec whose name literal sits more
                # than two lines below the call would otherwise just
                # vanish from the regenerated table.
                print(f"WARNING: Spec( at {path}:{i + 1} with no name "
                      "literal within 2 lines — NOT indexed", file=sys.stderr)

names = [r[0] for r in rows]
dups = {n for n in names if names.count(n) > 1}
if dups:
    print(f"DUPLICATE NAMES: {sorted(dups)}", file=sys.stderr)
rows.sort()
print(f"# {len(rows)} operators, {sum(1 for r in rows if r[3])} noOracle",
      file=sys.stderr)
for name, path, line, no_oracle in rows:
    dag = " †" if no_oracle else ""
    print(f"| `{name}`{dag} | {path}:{line} |")
