"""Extract the in-loop adaptive-attack trajectory from a
train_es_kernel log into a committed artifact.

Each `--adapt-every` refresh re-attacks the CURRENT training center
with a fresh short CMA run (scripts/opt_bot.quick_attack) and logs
`{"adapt_at_gen": G, "pair": "T:M", "attacker_bb": X}` — the run's own
exploitability-vs-generation measurement. This parser collects those
lines (plus the fixed-holdout center anchors) so the trajectory
survives as data, not just a log file.

    python scripts/extract_adapt_trajectory.py logs/q_es5r.log \
        --save data/es5_adapt_trajectory.json
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--save", required=True)
    args = ap.parse_args()

    refreshes, centers, gens = [], [], []
    for path in args.logs:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    d = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "adapt_at_gen" in d:
                    refreshes.append({
                        "gen": d["adapt_at_gen"], "pair": d["pair"],
                        "attacker_bb": d["attacker_bb"]})
                elif "center_bb" in d:
                    centers.append({k: v for k, v in d.items()
                                    if k != "elapsed_s"})
                elif "gen" in d and "mean_bb" in d:
                    gens.append({"gen": d["gen"],
                                 "mean_bb": d["mean_bb"],
                                 "best_bb": d["best_bb"]})

    by_pair = {}
    for r in refreshes:
        by_pair.setdefault(r["pair"], []).append(
            [r["gen"], r["attacker_bb"]])
    out = {
        "logs": args.logs,
        "note": ("attacker_bb = what a fresh 10-gen CMA attack on the "
                 "CURRENT center extracts (bb/hand, seat-0 vs five "
                 "copies); weaker than the 50-gen honest optimizer but "
                 "comparable across refreshes"),
        "refresh_trajectory_by_pair": by_pair,
        "center_anchors": centers,
        "fitness_first_last": gens[:1] + gens[-1:] if gens else [],
    }
    with open(args.save, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"saved": args.save,
                      "refreshes": len(refreshes),
                      "pairs": sorted(by_pair)}))


if __name__ == "__main__":
    main()
