#!/usr/bin/env python3
"""Round-over-round bench comparison with the rules ADVICE r7 asked for:

- any run with a non-empty `failed` list is flagged loudly, and totals
  are compared only over the INTERSECTION of succeeded query keys (a
  failed query's absence must not read as a speedup);
- pass multiple files per side to take the min-of-twins per query
  (separates plan cost from this box's run-to-run variance, which is
  routinely +/-50% on heavy queries);
- regressions are |new - old| > ABS_S and new > REL * old, the same
  filter every round's verdict uses.

Usage: tools/benchcmp.py OLD.json[,OLD2.json] NEW.json[,NEW2.json]
"""
import json
import sys

ABS_S = 0.3
REL = 1.3


def load_side(arg):
    runs = [json.load(open(p)) for p in arg.split(",")]
    failed = sorted({q for r in runs for q in r.get("failed", [])})
    merged = {}
    for r in runs:
        for k, v in r["queries"].items():
            merged[k] = min(v, merged.get(k, float("inf")))
    return merged, failed


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old, old_failed = load_side(sys.argv[1])
    new, new_failed = load_side(sys.argv[2])
    for name, failed in (("OLD", old_failed), ("NEW", new_failed)):
        if failed:
            print(f"!! {name} side has FAILED queries (excluded from "
                  f"comparison, NOT a speedup): {', '.join(failed)}")
    both = sorted(set(old) & set(new))
    print(f"comparable queries: {len(both)} "
          f"(old-only: {sorted(set(old) - set(new))or '-'}, "
          f"new-only: {sorted(set(new) - set(old)) or '-'})")
    print(f"totals over intersection: old={sum(old[k] for k in both):.1f}s "
          f"new={sum(new[k] for k in both):.1f}s")
    regs = [(new[k] - old[k], k) for k in both
            if new[k] - old[k] > ABS_S and new[k] > REL * old[k]]
    if regs:
        print("regressions (>0.3s and >30%):")
        for d, k in sorted(regs, reverse=True):
            print(f"  {k}: {old[k]:.2f}s -> {new[k]:.2f}s (+{d:.2f}s)")
    else:
        print("zero regressions (>0.3s and >30% filter)")
    # old-side failures gate too: an old run with failed queries is not
    # a clean baseline, and a CI wrapper keying on the exit status must
    # see the "flagged loudly" condition, not just the printed banner
    sys.exit(2 if (regs or new_failed or old_failed) else 0)


if __name__ == "__main__":
    main()
