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

Round-14 verdict #4: bench rows now also carry box-state-immune work
metrics (`cpu_s`: executor CPU-time sum; `shuffle_bytes`: shuffle
read+write). When both sides have them, this prints their intersection
totals and classifies every wall-flagged regression: flat cpu AND flat
shuffle => box drift, not plan cost; either moving with the wall =>
a real plan change.

Round-15 verdict #5 — the cpu_s comparison RULE, after bit-identical
sf100 twins showed a 1.9x executor-CPU spread on identical code:

  1. cpu_s is compared MIN-OF-TWINS per side, like wall time. A single
     run's cpu_s is NOT trustworthy for adjudication on heavy rows: CPU
     burned by memory-pressure spilling and by JIT/GC interaction is
     real CPU that varies with box state. This tool warns when either
     side is a single file.
  2. Bench rows now carry `spill_bytes` (memory+disk spill, successful
     attempts only; failed/killed task attempts are excluded from all
     work metrics at the listener). A cpu move that arrives with a
     spill move is classified SPILL DRIFT (box memory state), not a
     plan change — spill volume is a function of free executor memory,
     not of the plan.
  3. shuffle_bytes remains the only metric that is bit-stable across
     identical plans; it adjudicates alone when cpu is ambiguous.

Usage: tools/benchcmp.py OLD.json[,OLD2.json] NEW.json[,NEW2.json]
"""
import json
import sys

ABS_S = 0.3
REL = 1.3
# a regression whose cpu AND shuffle stay within this relative band of
# the old run is classified as box drift (wall moved, work did not)
WORK_FLAT = 1.15
# a cpu move accompanied by a spill move of at least this many bytes on
# either side is attributed to box memory pressure, not the plan
SPILL_SIG = 64 * 1024 * 1024


def load_side(arg):
    paths = arg.split(",")
    runs = [json.load(open(p)) for p in paths]
    failed = sorted({q for r in runs for q in r.get("failed", [])})
    merged, cpu, shuffle, spill = {}, {}, {}, {}
    for r in runs:
        for k, v in r["queries"].items():
            merged[k] = min(v, merged.get(k, float("inf")))
        for k, v in r.get("cpu_s", {}).items():
            cpu[k] = min(v, cpu.get(k, float("inf")))
        for k, v in r.get("shuffle_bytes", {}).items():
            shuffle[k] = min(v, shuffle.get(k, float("inf")))
        for k, v in r.get("spill_bytes", {}).items():
            spill[k] = min(v, spill.get(k, float("inf")))
    return merged, failed, cpu, shuffle, spill, len(paths)


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old, old_failed, old_cpu, old_shf, old_spl, old_n = load_side(sys.argv[1])
    new, new_failed, new_cpu, new_shf, new_spl, new_n = load_side(sys.argv[2])
    for name, failed in (("OLD", old_failed), ("NEW", new_failed)):
        if failed:
            print(f"!! {name} side has FAILED queries (excluded from "
                  f"comparison, NOT a speedup): {', '.join(failed)}")
    for name, n in (("OLD", old_n), ("NEW", new_n)):
        if n < 2:
            print(f"note: {name} side is a single run — cpu_s is "
                  f"spill/JIT-noisy without min-of-twins; wall and cpu "
                  f"verdicts below carry LOW confidence, trust "
                  f"shuffle_bytes")
    both = sorted(set(old) & set(new))
    print(f"comparable queries: {len(both)} "
          f"(old-only: {sorted(set(old) - set(new))or '-'}, "
          f"new-only: {sorted(set(new) - set(old)) or '-'})")
    print(f"totals over intersection: old={sum(old[k] for k in both):.1f}s "
          f"new={sum(new[k] for k in both):.1f}s")
    cpu_both = sorted(set(old_cpu) & set(new_cpu) & set(both))
    if cpu_both:
        oc, nc = sum(old_cpu[k] for k in cpu_both), sum(
            new_cpu[k] for k in cpu_both)
        print(f"cpu_s over intersection ({len(cpu_both)} rows): "
              f"old={oc:.1f}s new={nc:.1f}s ({(nc - oc) / oc:+.1%})"
              if oc else f"cpu_s: old=0 new={nc:.1f}s")
    shf_both = sorted(set(old_shf) & set(new_shf) & set(both))
    if shf_both:
        os_, ns = sum(old_shf[k] for k in shf_both), sum(
            new_shf[k] for k in shf_both)
        print(f"shuffle_bytes over intersection ({len(shf_both)} rows): "
              f"old={os_ / 1e6:.1f}MB new={ns / 1e6:.1f}MB"
              + (f" ({(ns - os_) / os_:+.1%})" if os_ else ""))

    # Box-wide cpu drift normalization (r16): executor CPU inflates
    # UNIFORMLY when the whole box slows (thermal/contention) — the r16
    # final twins measured +9% cpu across 176 rows with shuffle
    # bit-identical on every one. A per-row cpu move should only read as
    # plan cost when it exceeds the box-wide drift, so normalize by the
    # MEDIAN per-row cpu ratio (robust to the few genuinely changed
    # rows) before applying the flat-work threshold.
    ratios = sorted(new_cpu[k] / old_cpu[k] for k in cpu_both
                    if old_cpu.get(k, 0) > 0.05)
    drift = ratios[len(ratios) // 2] if len(ratios) >= 8 else 1.0
    if drift != 1.0:
        print(f"box-wide cpu drift (median per-row ratio over "
              f"{len(ratios)} rows): {drift:.2f}x — cpu verdicts below "
              f"are normalized by it")

    def classify(k):
        """box drift vs spill drift vs plan change, when work metrics
        exist on both sides."""
        if k not in old_cpu or k not in new_cpu:
            return ""
        cpu_flat = new_cpu[k] <= WORK_FLAT * drift * old_cpu[k] + 0.05
        shf_flat = (k not in old_shf or k not in new_shf or
                    new_shf[k] <= WORK_FLAT * old_shf[k] + 1e6)
        spill_moved = (max(old_spl.get(k, 0), new_spl.get(k, 0)) -
                       min(old_spl.get(k, 0), new_spl.get(k, 0))) > SPILL_SIG
        detail = (f" [cpu {old_cpu[k]:.2f}->{new_cpu[k]:.2f}s"
                  + (f", shuffle {old_shf.get(k, 0) / 1e6:.1f}->"
                     f"{new_shf.get(k, 0) / 1e6:.1f}MB" if k in new_shf
                     else "")
                  + (f", spill {old_spl.get(k, 0) / 1e6:.0f}->"
                     f"{new_spl.get(k, 0) / 1e6:.0f}MB]"
                     if k in new_spl or k in old_spl else "]"))
        if cpu_flat and shf_flat:
            return f"{detail} => work flat: BOX DRIFT, not plan cost"
        if shf_flat and spill_moved:
            return (f"{detail} => cpu moved WITH spill, shuffle flat: "
                    f"SPILL DRIFT (box memory state), not plan cost")
        return f"{detail} => work moved with wall: PLAN CHANGE"

    regs = [(new[k] - old[k], k) for k in both
            if new[k] - old[k] > ABS_S and new[k] > REL * old[k]]
    if regs:
        print("regressions (>0.3s and >30%):")
        for d, k in sorted(regs, reverse=True):
            print(f"  {k}: {old[k]:.2f}s -> {new[k]:.2f}s (+{d:.2f}s)"
                  + classify(k))
    else:
        print("zero regressions (>0.3s and >30% filter)")
    # old-side failures gate too: an old run with failed queries is not
    # a clean baseline, and a CI wrapper keying on the exit status must
    # see the "flagged loudly" condition, not just the printed banner
    sys.exit(2 if (regs or new_failed or old_failed) else 0)


if __name__ == "__main__":
    main()
