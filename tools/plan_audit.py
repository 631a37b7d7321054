#!/usr/bin/env python3
"""Registry-wide physical-plan audit (round 15).

Usage:
  sbt -batch "runMain graft.Explain /root/testdata/sf0.001" > /tmp/allplans.txt
  python3 tools/plan_audit.py /tmp/allplans.txt

Flags the plan smells that have produced real finds (the round-15
lateral-TVF domain-clone trap was caught by the MANY-SCANS check):
  - FAILED-EXPLAIN: the Spec fn threw while planning
  - CARTESIAN:      any CartesianProduct (none is ever expected)
  - BNLJ:           BroadcastNestedLoopJoin outside the known-bounded
                    allowlist (scalar-subquery crosses, top-k-bounded
                    builds, the mandated non-equi demos)
  - MANY-SCANS:     >2 distinct scans of one fixture file (formatted
                    mode prints each scan twice) — duplicate-scan
                    shapes like an unfiltered decorrelation clone
  - WIDE-SCAN:      ReadSchema with >=10 columns outside scan_parquet
                    (the deliberate full-scan row) — lost pruning

Every flag needs human triage — a BNLJ over a one-row aggregate build
is scale-safe; the tool only selects what to look at. Exit 1 iff a
non-allowlisted flag fires, so the closing ritual can gate on it.
"""
import re, sys, collections

# Triaged round 15: every entry below was inspected and is bounded —
# single-row/global-aggregate crosses (cms/cooccur/domain_mix/
# tablesample/rolling_distinct band or spine builds), probe-bounded or
# blocked similarity (cosine/ann/embed/ngram/vocab), and the mandated
# non-equi demos (bnlj_theta, cross, the levenshtein-rule rewrite demo).
KNOWN_BNLJ = {
    'join_bnlj_theta', 'join_cross', 'llm_cosine_topk', 'llm_vocab',
    'llm_dedup_embed', 'llm_ann_lsh', 'llm_ann_ivf', 'llm_dedup_ngram',
    'agg_sketch_cms', 'llm_cooccur', 'llm_domain_mix',
    'opt_levenshtein_rule', 'sql_tablesample', 'win_rolling_distinct',
}
KNOWN_MANY_SCANS = {
    # sample + exact-total + anti-join containment need the base twice
    ('sql_tablesample', 'lineitem'),
}
KNOWN_WIDE = {'scan_parquet'}


def main() -> int:
    txt = open(sys.argv[1], errors='replace').read()
    blocks = re.split(r'\n========== (\S+) ==========\n', txt)
    plans = dict(zip(blocks[1::2], blocks[2::2]))
    flags = []
    for name, p in plans.items():
        if 'failed:' in p[:200]:
            flags.append((name, 'FAILED-EXPLAIN', p[:120].replace('\n', ' ')))
            continue
        if 'CartesianProduct' in p:
            flags.append((name, 'CARTESIAN', ''))
        if 'BroadcastNestedLoopJoin' in p and name not in KNOWN_BNLJ:
            flags.append((name, 'BNLJ', 'triage the build side'))
        locs = re.findall(
            r'Location: InMemoryFileIndex \[[^\]]*/(\w+)\.parquet\]?', p)
        for f, n in collections.Counter(locs).items():
            if n > 4 and (name, f) not in KNOWN_MANY_SCANS:
                flags.append((name, f'MANY-SCANS {f}x{n // 2}',
                              'duplicate scan — decorrelation clone?'))
        if name not in KNOWN_WIDE:
            for m in re.finditer(r'ReadSchema: struct<([^>]*)>', p):
                if m.group(1).count(':') >= 10:
                    flags.append((name, 'WIDE-SCAN', m.group(1)[:80]))
        # GLOBAL-WINDOW: a Window with an empty partition spec runs in
        # ONE task regardless of cluster size (the trap win_ntile's r3
        # departitioning removed). The detail block is
        # "(n) Window\n[Input...]\nArguments: [exprs], [part], [order]";
        # an empty partition spec renders as "], [], [". 33 Window
        # nodes audited clean at round 15 — keep it that way.
        for m in re.finditer(r'\(\d+\) Window\b.*\n(?:.*\n){0,3}?Arguments: (.*)',
                             p):
            if re.search(r'\],?\s*\[\],\s*\[', m.group(1)):
                flags.append((name, 'GLOBAL-WINDOW', m.group(1)[:80]))
    print(f"audited {len(plans)} plans")
    for f in sorted(set(flags)):
        print("FLAG", f)
    print("CLEAN" if not flags else f"{len(set(flags))} flags need triage")
    return 1 if flags else 0


if __name__ == '__main__':
    sys.exit(main())
