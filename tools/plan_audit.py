#!/usr/bin/env python3
"""Registry-wide physical-plan audit — thin wrapper (round 16).

The checks and triage allowlists are single-sourced in
src/main/scala/graft/PlanAudit.scala (they also gate every commit via
PlanAuditSpec in `sbt test`). This wrapper only preserves the round-15
ritual invocation:

  sbt -batch "runMain graft.Explain /root/testdata/sf0.001" > /tmp/allplans.txt
  python3 tools/plan_audit.py /tmp/allplans.txt    # exit 1 on untriaged flags

which now delegates to `runMain graft.PlanAudit --file <dump>`.
Auditing live plans without a dump: `sbt -batch "runMain graft.PlanAudit <sfDir>"`.
"""
import os, subprocess, sys


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    dump = os.path.abspath(sys.argv[1])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        ["sbt", "-batch", f"runMain graft.PlanAudit --file {dump}"],
        cwd=repo, stdout=subprocess.PIPE, text=True)
    # surface only the audit's own lines, not sbt framing
    for line in proc.stdout.splitlines():
        if line.startswith(("audited ", "FLAG ", "CLEAN")) or \
           "flags need triage" in line:
            print(line)
    return 1 if proc.returncode else 0


if __name__ == '__main__':
    sys.exit(main())
