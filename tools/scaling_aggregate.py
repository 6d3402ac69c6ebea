"""Aggregate calm-window scaling rounds with the a-priori clean rule.

The rule (fixed before any results are read, same as rounds 3/4): a
round is CLEAN iff both its level walls are within 1.5x the session
best at that level.  Efficiency per round = (sec_2 / sec_8) / 4 for
the 2-vs-8-cpu pair (N vs 4N).  Reports the clean-window median, the
all-rounds median, and every round with its measured steal so the
exclusions are auditable.

Usage:  python tools/scaling_aggregate.py scaling_r5_rounds.jsonl
"""
import json
import statistics
import sys


def main(path: str) -> None:
    rows = [json.loads(l) for l in open(path)]
    if not rows:
        print("no rounds")
        return
    best2 = min(r["sec_2"] for r in rows)
    best8 = min(r["sec_8"] for r in rows)
    lim2, lim8 = 1.5 * best2, 1.5 * best8
    clean, effs_all = [], []
    for i, r in enumerate(rows):
        eff = (r["sec_2"] / r["sec_8"]) / 4
        effs_all.append(eff)
        ok = r["sec_2"] <= lim2 and r["sec_8"] <= lim8
        if ok:
            clean.append(eff)
        print(f"round {i:2d}  sec_2={r['sec_2']:7.1f}  sec_8={r['sec_8']:6.1f}"
              f"  eff={eff:.3f}  steal={r.get('steal_ticks', '?'):>5}"
              f"  {'clean' if ok else 'EXCLUDED (wall rule)'}")
    print(f"\nsession best: sec_2={best2:.1f}  sec_8={best8:.1f}"
          f"  (clean limits {lim2:.1f} / {lim8:.1f})")
    clean_med = (f"{statistics.median(clean):.3f}" if clean
                 else "n/a (no round passed both wall limits)")
    print(f"clean rounds: {len(clean)}/{len(rows)}"
          f"  clean median eff: {clean_med}"
          f"  all-rounds median eff: {statistics.median(effs_all):.3f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "scaling_rounds.jsonl")
