"""Fold additional full bench runs into a GATE_rN.json element-wise min.

The round's gate protocol (CHANGES_r05 onward): per-query minimum across
every full bench run of the round — the shared host swings a warmed
query several-x between runs, and the min is the only stable estimator
observed so far. This tool makes the fold reproducible instead of a
session-local snippet.

Usage: python tools/gate_fold.py GATE_rN.json run1.json [run2.json ...]
Rewrites GATE_rN.json in place: per_query = element-wise min,
headline_total = sum(per_query), matched_r1_subtotal = sum over the
run's matched_r1_set. Refuses runs whose query set differs from the
gate's (added/removed entries need a fresh gate, not a fold).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    gate_path, runs = sys.argv[1], sys.argv[2:]
    with open(gate_path) as fh:
        gate = json.load(fh)
    per = dict(gate["per_query"])
    matched_set = None
    for rp in runs:
        with open(rp) as fh:
            text = fh.read()
        try:
            run = json.loads(text)
        except json.JSONDecodeError:
            run = json.loads(text.strip().splitlines()[-1])
        run = run.get("parsed", run)
        q = run["queries"]
        if set(q) != set(per):
            extra = sorted(set(q) - set(per))
            missing = sorted(set(per) - set(q))
            print(
                f"FATAL: {rp} query set differs from gate\n"
                f"  in run, not gate: {extra}\n  in gate, not run: {missing}",
                file=sys.stderr,
            )
            return 1
        if run.get("sf") != gate.get("sf"):
            print(f"FATAL: {rp} sf {run.get('sf')} != gate {gate.get('sf')}", file=sys.stderr)
            return 1
        for k, v in q.items():
            if v < per[k]:
                per[k] = v
        if run.get("matched_r1_set"):
            matched_set = run["matched_r1_set"]
    # The gate's own matched set wins (ADVICE r13: a folded run must
    # not silently override what the subtotal means); a run that
    # disagrees is an error, not a reinterpretation.
    if gate.get("matched_r1_set"):
        if matched_set and set(matched_set) != set(gate["matched_r1_set"]):
            print(
                "FATAL: folded run's matched_r1_set differs from gate's",
                file=sys.stderr,
            )
            return 1
        matched_set = gate["matched_r1_set"]
    elif matched_set:
        gate["matched_r1_set"] = matched_set
    gate["per_query"] = dict(sorted(per.items()))
    gate["headline_total"] = round(sum(per.values()), 4)
    if matched_set:
        gate["matched_r1_subtotal"] = round(
            sum(per[k] for k in matched_set if k in per), 4
        )
    with open(gate_path, "w") as fh:
        json.dump(gate, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        f"folded {len(runs)} run(s): headline_total={gate['headline_total']}"
        f" matched_r1_subtotal={gate.get('matched_r1_subtotal')}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
