"""Golden-trace regression: regenerate seeded scenarios and diff against the
committed artifacts (guards engine refactors against silent semantic drift;
regenerate deliberately with scripts/dump_golden_traces.py)."""

import json
import os

import pytest

from scripts.dump_golden_traces import GOLDEN_DIR, generate_traces


@pytest.fixture(scope="module")
def fresh():
    return generate_traces()


@pytest.mark.parametrize("name", [
    "heads_up_reference.jsonl",
    "three_way_reference.jsonl",
    "all_in_standard.jsonl",
    "continuous_reference.jsonl",
])
def test_golden_trace(name, fresh):
    path = os.path.join(GOLDEN_DIR, name)
    with open(path) as f:
        want = [json.loads(line) for line in f if line.strip()]
    got = [json.loads(json.dumps(s, sort_keys=True)) for s in fresh[name]]
    assert got == want, f"{name} drifted — diff and regenerate deliberately"
