"""Extract the per-iteration exploitability trajectory from a pool-ES
training log (the ``center_*`` fixed-holdout lines train_es_kernel.py
prints at every checkpoint) into a committable JSON artifact.

    python scripts/extract_trajectory.py logs/train_es4.log \
        data/es4_trajectory.json

Lines that aren't JSON (retry-loop markers, tracebacks) are skipped;
resumed attempts concatenate naturally because gens_done persists.
"""

import json
import sys


def main():
    log_path, out_path = sys.argv[1], sys.argv[2]
    rows, gen = [], None
    with open(log_path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "gen" in d:
                gen = d["gen"]
            if "center_bb" in d:
                rows.append({"gen": gen, **{k: v for k, v in d.items()
                                            if k.startswith("center")}})
    with open(out_path, "w") as f:
        json.dump({"source": log_path, "checkpoints": rows}, f, indent=1)
    print(f"{len(rows)} checkpoints -> {out_path}")


if __name__ == "__main__":
    main()
