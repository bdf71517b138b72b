"""Solver-strategy distillation (models/distill.py) on a toy subgame.

Certificates:
- ``best_response_strategy`` is exact: mixing its one-hot P1 (P2) nodes
  with the profile's other side reproduces ``best_response_values``'
  br1 (br2) through the independent ``strategy_values`` path.
- Example assembly maps tree distributions onto the net menu with the
  documented invariants (rows sum to 1, masked fold carries no mass,
  the small-raise column is never a target).
- Distillation moves the net toward the solver: cross-entropy falls
  and the distilled net's exploitability inside the toy subgame drops
  well below the untrained net's, while the prelude self-anchor keeps
  early-street play near the start params.
"""

import numpy as np
import pytest

import jax

from montecarlo_tpu.cards import make_card
from montecarlo_tpu.models.distill import (
    distill, prelude_examples, stack_examples, turn_river_examples,
)
from montecarlo_tpu.models.policy_net import init_params, policy_logits
from montecarlo_tpu.models.turn_solver import (
    best_response_strategy, best_response_values, exploitability_gap,
    make_turn_river_game, mix_strategies, net_turn_river_strategy,
    solve_turn_river, strategy_values, turn_combos,
    turn_river_node_states,
)

BOARD4 = [make_card(2, 13), make_card(0, 8), make_card(1, 5),
          make_card(3, 2)]  # Ks 8h 5d 2c
RIVERS = [make_card(2, 12), make_card(0, 3), make_card(1, 9)]


@pytest.fixture(scope="module")
def toy():
    """No-raise artifact-game geometry on a 3-river, ~70-combo toy."""
    combos = turn_combos(BOARD4)[::16]
    turn_states, river_states, sizes, prelude = turn_river_node_states(
        BOARD4, rivers=RIVERS, with_prelude=True)
    game, combos = make_turn_river_game(
        BOARD4, rivers=RIVERS, combos=combos, pot=sizes["pot"],
        bet=sizes["bet"], river_bets=sizes["river_bets"],
        turn_raise=False, river_raise=False)
    nash = solve_turn_river(game, iterations=400)
    return game, combos, turn_states, river_states, prelude, nash


def test_best_response_strategy_is_exact(toy):
    game, combos, *_, nash = toy
    br1, br2 = best_response_values(game, nash)
    br = best_response_strategy(game, nash)
    ev1_mix, _ = strategy_values(game, mix_strategies(br, nash))
    _, ev2_mix = strategy_values(game, mix_strategies(nash, br))
    tol = 1e-3 * max(1.0, abs(br1), abs(br2))
    assert ev1_mix == pytest.approx(br1, abs=tol)
    assert ev2_mix == pytest.approx(br2, abs=tol)
    # one-hot rows everywhere
    for node in br:
        a = np.asarray(node)
        assert np.all(np.max(a, axis=-1) == 1.0)
        assert np.allclose(np.sum(a, axis=-1), 1.0)


def test_example_mapping_invariants(toy):
    game, combos, turn_states, river_states, prelude, nash = toy
    sets = turn_river_examples(game, combos, turn_states, river_states,
                               nash, nash, nash)
    # 4 turn nodes + 3 lines x 4 river nodes
    assert len(sets) == 16
    data = stack_examples(sets)
    t = np.asarray(data.target)
    fm = np.asarray(data.fold_masked)
    assert np.allclose(t.sum(-1), 1.0, atol=1e-5)
    assert np.all(t[fm, 0] == 0.0)        # masked fold carries no mass
    assert np.all(t[:, 2] == 0.0)         # small-raise never targeted
    assert np.all(np.asarray(data.weight) > 0)

    anchor = stack_examples(prelude_examples(
        init_params(jax.random.key(0)), prelude, combos))
    at = np.asarray(anchor.target)
    assert np.allclose(at.sum(-1), 1.0, atol=1e-5)
    assert np.all(at[np.asarray(anchor.fold_masked), 0] < 1e-6)


def test_distill_moves_net_toward_solver(toy):
    game, combos, turn_states, river_states, prelude, nash = toy
    params0 = init_params(jax.random.key(0))
    sets = turn_river_examples(game, combos, turn_states, river_states,
                               nash, nash, nash)
    data = stack_examples(sets)
    anchor = stack_examples(prelude_examples(params0, prelude, combos))

    losses = []
    params = distill(params0, data, anchor=anchor, steps=400,
                     batch=2048, lr=1e-3, seed=1,
                     log=lambda d: losses.append(d["loss"]),
                     log_every=100)
    assert losses[-1] < 0.6 * losses[0], losses

    gap0 = exploitability_gap(game, net_turn_river_strategy(
        params0, turn_states, river_states, combos))
    gap1 = exploitability_gap(game, net_turn_river_strategy(
        params, turn_states, river_states, combos))
    assert gap1 < 0.6 * gap0, (gap0, gap1)

    # the prelude anchor held: argmax agreement with the start params
    # at early-street nodes stays high
    af = anchor.feats
    l0 = np.array(policy_logits(params0, af))
    l1 = np.array(policy_logits(params, af))
    fm = np.asarray(anchor.fold_masked)
    l0[fm, 0] = -1e9
    l1[fm, 0] = -1e9
    agree = float(np.mean(l0.argmax(-1) == l1.argmax(-1)))
    assert agree > 0.9, agree


def test_br_distillation_targets_attack_the_subject(toy):
    """BR one-hots as targets: the exact BR extracts a positive edge
    from an (untrained) subject inside the subgame, and the mixed-
    profile plumbing used by scripts/distill_nash.py is consistent."""
    game, combos, turn_states, river_states, *_ = toy
    subject = init_params(jax.random.key(7))
    sub_strat = net_turn_river_strategy(subject, turn_states,
                                        river_states, combos)
    br = best_response_strategy(game, sub_strat)
    br1, br2 = best_response_values(game, sub_strat)
    ev1, _ = strategy_values(game, mix_strategies(br, sub_strat))
    assert ev1 == pytest.approx(br1, abs=1e-3 * max(1.0, abs(br1)))
    # BR edge over the pot split is nonnegative vs any profile
    assert br1 + br2 - game.pot >= -1e-3
    sets = turn_river_examples(game, combos, turn_states, river_states,
                               br, mix_strategies(br, sub_strat),
                               mix_strategies(sub_strat, br))
    data = stack_examples(sets)
    t = np.asarray(data.target)
    # one-hot targets map to single menu entries
    assert np.all(np.isin(t, [0.0, 1.0]))
