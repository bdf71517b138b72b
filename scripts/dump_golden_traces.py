"""Regenerate the golden trace artifacts under tests/golden/.

Each trace is a JSONL file of public board states for a fixed seeded
scenario; tests/test_golden_traces.py regenerates and diffs them, guarding
future engine refactors against silent semantic drift. Run this script
only when a semantic change is *intended*, and review the diff.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")


def generate_traces():
    """Returns {filename: [json-able state dict, ...]}."""
    jax.config.update("jax_platforms", "cpu")

    from montecarlo_tpu.engine import (
        TableConfig, clamp_action, init_state, public_board, settle_showdown,
        step_action, step_table,
    )

    def run(cfg, seed, script, ids, rules, continuous=False):
        st = init_state(jax.random.key(seed), cfg)
        out = [public_board(st, ids)]
        for a in script:
            step = step_table if continuous else step_action
            st = step(st, clamp_action(st, jnp.asarray(a, jnp.int32)),
                      rules=rules)
            out.append(public_board(st, ids))
        if not continuous and bool(st.hand_over):
            st = settle_showdown(st, rules=rules)
            out.append(public_board(st, ids))
        return out

    traces = {}
    # 1) Heads-up reference-rules hand to showdown (BASELINE config 1 shape).
    cfg = TableConfig(num_seats=2, small_blind=5, big_blind=5)
    traces["heads_up_reference.jsonl"] = run(
        cfg, 2024, [0, 0, 0, 0, 0, 0, 0, 0], ["hero", "villain"], "reference")
    # 2) 3-player reference hand with raise/fold/side action.
    cfg3 = TableConfig(num_seats=3)
    traces["three_way_reference.jsonl"] = run(
        cfg3, 7, [0, 10, -1, 0, 5, 0, 0, 0, 0, 0, 3, 0], ["p1", "p2", "p3"],
        "reference")
    # 3) Standard-rules all-in runout.
    cfgs = TableConfig(num_seats=3, rules="standard")
    traces["all_in_standard.jsonl"] = run(
        cfgs, 7, [90, 0, 0], ["p1", "p2", "p3"], "standard")
    # 4) Continuous mode: two hands roll over (reference rules).
    traces["continuous_reference.jsonl"] = run(
        TableConfig(num_seats=2), 5, [-1, -1, -1], ["a", "b"], "reference",
        continuous=True)
    return traces


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, states in generate_traces().items():
        path = os.path.join(GOLDEN_DIR, name)
        with open(path, "w") as f:
            for s in states:
                f.write(json.dumps(s, sort_keys=True) + "\n")
        print(f"wrote {path} ({len(states)} states)")


if __name__ == "__main__":
    main()
