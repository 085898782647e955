#!/usr/bin/env python3
"""Refresh docs/bench_budget.tsv from recorded batteries.

A query's budget is the MAX time any of the given recorded runs needed
(builder close runs + the driver's run, kept in docs/bench_history/),
so builder-vs-driver machine-class drift lives inside the budget base
rather than eating the 3x multiplier.  graft.Bench fails a query above
max(3 x budget, budget + 2 s) -- see graft.BenchBudget.

Usage:
  scripts/refresh_budget.py OUT.tsv RUN.json [RUN.json ...] \
      [--rebase name=RUN.json ...]

--rebase pins a query's budget to a SINGLE named run instead of the
max -- use it when the query's plan changed this round and older
recorded times describe a plan that no longer exists (round 10's
t226 explode plan, for example).

Batteries recorded with machine-speed normalization active
(machine_factor > 1 in the bench JSON -- graft.BenchBudget
.machineFactor scaled every limit because the battery medianed 20%+
over its historical-max base) are SKIPPED: max-merging a normalized
slow battery would permanently inflate budgets, compounding with the
normalization itself (the round-13 ADVICE). Pass --allow-normalized
to include one anyway (requires a written adjudication in the commit).
"""
import json
import sys


def main() -> None:
    args = sys.argv[1:]
    rebase = {}
    runs = []
    out = None
    allow_normalized = False
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--rebase":
            name, path = args[i + 1].split("=", 1)
            rebase[name] = path
            i += 2
        elif a == "--allow-normalized":
            allow_normalized = True
            i += 1
        elif out is None:
            out = a
            i += 1
        else:
            runs.append(a)
            i += 1
    if out is None or not runs:
        sys.exit(__doc__)

    by_path = {}
    for path in list(runs) + list(rebase.values()):
        with open(path) as f:
            rec = json.load(f)
        mf = float(rec.get("machine_factor", 1.0))
        if mf > 1.0 and not allow_normalized:
            print(f"SKIPPING {path}: recorded with machine-speed "
                  f"normalization active (machine_factor={mf:.3f}) -- "
                  "a normalized battery must not enter the budget base "
                  "(--allow-normalized overrides)", file=sys.stderr)
            if path in runs:
                runs.remove(path)
            continue
        by_path[path] = rec["queries"]

    budget = {}
    for path in runs:
        for k, v in by_path[path].items():
            budget[k] = max(budget.get(k, 0.0), float(v))
    for name, path in rebase.items():
        if path in by_path and name in by_path[path]:
            budget[name] = float(by_path[path][name])

    with open(out, "w") as f:
        f.write(
            "# per-query wall-time budget: MAX sf0.1 seconds across the\n"
            "# recorded batteries in docs/bench_history/ (refreshed by\n"
            "# scripts/refresh_budget.py). graft.Bench fails loudly above\n"
            "# max(3x budget, budget + 2s) -- best-of-all-passes, so a\n"
            "# violation means every pass tripped.\n")
        for k in sorted(budget):
            f.write(f"{k}\t{budget[k]:.3f}\n")
    print(f"wrote {len(budget)} budgets to {out} from {len(runs)} runs"
          + (f" ({len(rebase)} rebased)" if rebase else ""))


if __name__ == "__main__":
    main()
