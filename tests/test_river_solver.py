"""River subgame solver: analytic anchors + engine EV cross-validation.

Three independent checks:

1. The HALF-STREET clairvoyance game (P2 cannot bet or raise) has a
   closed-form Nash equilibrium ("Mathematics of Poker" ch. 11; derived
   inline): with pot P and bet B, the polarized bettor bets all nuts and
   bluffs air at ratio B/(P+2B)... — concretely, the indifference
   conditions pin P1's bluff frequency and P2's call frequency exactly.
   CFR+ must converge to those numbers.
2. Full-tree games must converge: exploitability gap -> ~0 on a real
   board with evaluator-derived payoffs.
3. Every terminal payoff formula must equal what the ACTUAL ENGINE pays:
   play each betting line through ``step_table`` on an injected deck and
   compare the settled chip delta against the solver's payoff matrix —
   the end-to-end validation of pot mechanics (``gameplay.clj:94-150``
   semantics) against the game-theoretic model. Since a strategy's EV is
   the reach-weighted sum of terminal payoffs, terminal-level equality
   extends solver EVs to engine EVs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from montecarlo_tpu.cards import make_card
from montecarlo_tpu.models.river_solver import (
    RiverGame,
    RiverStrategy,
    best_response_values,
    exploitability_gap,
    make_river_game,
    solve_cfr_plus,
    strategy_values,
)


def test_half_street_clairvoyance_closed_form():
    """P1 holds the nuts or air (equally likely), P2 a bluff-catcher.
    P2 may only call or fold (half-street). With pot=1, bet=1:

    - P2's indifference (call EV 0): P(air|bet)/(P(nuts|bet)) = B/(P+B)
      = 1/2, so P1 bluffs air with prob 1/2 (nuts always bet — dominant).
    - P1's bluff indifference: P2 folds B/(P+B) = 1/2 of the time, so
      P2 calls with prob P/(P+B) = 1/2.
    - Game value for P1: nuts 1.5, air 0 -> 0.75 on the uniform prior.
    """
    W = jnp.array([[1.0], [0.0]])     # hero row 0 = nuts, row 1 = air
    mask = jnp.ones((2, 1))
    game = RiverGame(W, mask, pot=1.0, bet=1.0, raise_=1.0,
                     p2_can_bet=False, p2_can_raise=False)
    strat = solve_cfr_plus(game, iterations=4000)

    s0 = np.asarray(strat.s0)
    s3 = np.asarray(strat.s3)
    assert s0[0, 1] > 0.99, f"nuts must always bet, got {s0[0]}"
    assert abs(s0[1, 1] - 0.5) < 0.02, f"air bluffs 1/2, got {s0[1]}"
    assert abs(s3[0, 1] - 0.5) < 0.02, f"P2 calls 1/2, got {s3[0]}"
    ev1, ev2 = strategy_values(game, strat)
    assert abs(ev1 - 0.75) < 0.01
    assert abs(ev1 + ev2 - 1.0) < 1e-5  # constant-sum
    assert exploitability_gap(game, strat) < 0.01


def test_half_street_pot_sized_bet():
    """Same game, pot=2, bet=2 (pot-sized): bluff ratio B/(P+B) = 1/2
    again, but value: nuts EV = P(fold)*2 + P(call)*4; P2 calls
    P/(P+B) = 1/2, folds 1/2 -> nuts 3.0, air 0 -> 1.5."""
    W = jnp.array([[1.0], [0.0]])
    mask = jnp.ones((2, 1))
    game = RiverGame(W, mask, pot=2.0, bet=2.0, raise_=1.0,
                     p2_can_bet=False, p2_can_raise=False)
    strat = solve_cfr_plus(game, iterations=4000)
    ev1, _ = strategy_values(game, strat)
    assert abs(ev1 - 1.5) < 0.02
    assert exploitability_gap(game, strat) < 0.02


def _board():
    # K♠ 8♥ 5♦ 2♣ Q♠ — a dry board (suit-major ids via make_card)
    return np.array([make_card(2, 13), make_card(0, 8), make_card(1, 5),
                     make_card(3, 2), make_card(2, 12)], np.int32)


def test_full_tree_converges_on_real_board():
    """Full tree (bet + raise enabled), evaluator payoffs, restricted
    ranges for CPU speed: the gap must shrink toward zero and the value
    must stay constant-sum."""
    board = _board()
    from montecarlo_tpu.models.river_solver import all_combos

    combos = all_combos(board)
    rng = np.random.default_rng(5)
    sub = combos[rng.choice(len(combos), size=120, replace=False)]
    game, _, _ = make_river_game(board, sub, sub, pot=4.0, bet=4.0,
                                 raise_=8.0)
    strat = solve_cfr_plus(game, iterations=1500)
    gap = exploitability_gap(game, strat)
    assert gap < 0.02 * game.pot, gap
    ev1, ev2 = strategy_values(game, strat)
    assert abs(ev1 + ev2 - game.pot) < 1e-3


def test_gap_detects_bad_strategy():
    """The meter itself: a uniformly-random profile must show a large
    positive gap on the same game where the solved profile shows ~0."""
    board = _board()
    from montecarlo_tpu.models.river_solver import all_combos

    combos = all_combos(board)[:80]
    game, _, _ = make_river_game(board, combos, combos, pot=4.0,
                                 bet=4.0, raise_=8.0)
    H = V = len(combos)
    uni = RiverStrategy(
        s0=jnp.full((H, 2), 0.5), s1=jnp.full((V, 2), 0.5),
        s2=jnp.full((H, 2), 0.5), s3=jnp.full((V, 3), 1 / 3),
        s4=jnp.full((H, 2), 0.5))
    gap_uni = exploitability_gap(game, uni)
    strat = solve_cfr_plus(game, iterations=1500)
    assert gap_uni > 10 * max(exploitability_gap(game, strat), 1e-4)


# ---------------------------------------------------------------------------
# Engine cross-validation: terminal payoffs through step_table
# ---------------------------------------------------------------------------

def _play_line(hero_hole, villain_hole, board, actions, cfg):
    """Drive a fresh HU hand to the river on an injected deck (checks
    through preflop/flop/turn), then apply the river ``actions``; return
    P1's settled chip delta for the hand (P1 = position 0 = SB)."""
    from montecarlo_tpu.engine.state import init_state, redeal
    from montecarlo_tpu.engine.step import clamp_action, step_table

    deck = np.zeros(52, np.int32)
    base = 4  # 2P holes
    pos = list(range(base)) + [base + 1, base + 2, base + 3, base + 5,
                               base + 7]
    dealt = np.array([hero_hole[0], villain_hole[0], hero_hole[1],
                      villain_hole[1], *board], np.int32)
    deck[pos] = dealt
    rest = np.setdiff1d(np.arange(52), dealt)
    deck[[p for p in range(52) if p not in pos]] = rest

    st = init_state(jax.random.key(0), cfg)
    st = redeal(st, jnp.asarray(deck))
    start = int(st.stacks[0]) + cfg.small_blind
    # preflop: SB calls, BB checks; flop + turn: check/check
    prelude = [0, 0, 0, 0, 0, 0]
    for a in prelude + list(actions):
        assert not bool(st.hand_over)
        st = step_table(st, clamp_action(st, jnp.asarray(a, jnp.int32)),
                        rules=cfg.rules)
    assert bool(st.hand_over) or int(st.hand_idx) == 1
    if int(st.hand_idx) != 1:
        return None
    # step_table settles, rotates, AND posts the next hand's blinds:
    # old position 0 is new position 1 (HU roll by -1), which posts the
    # big blind — add it back to read the settled stack.
    return int(st.stacks[1]) + cfg.big_blind - start


@pytest.mark.parametrize("w_case", ["hero_wins", "villain_wins", "tie"])
def test_engine_terminal_payoffs_match_solver_model(w_case):
    """Every terminal line's engine chip delta == the solver payoff
    minus P1's pre-river contribution (the blinds/checks prelude puts
    bb=10 in per player, so pot=20 at the river; B=20 and R=60 mirror
    the net menu's pot-raise sizes at those nodes)."""
    from montecarlo_tpu.engine.state import TableConfig
    from montecarlo_tpu.models.river_solver import _payoffs

    cfg = TableConfig(num_seats=2, rules="standard")
    board = _board()
    if w_case == "hero_wins":
        hero = [make_card(2, 14), make_card(0, 13)]   # AK: top pair TK
        vill = [make_card(0, 9), make_card(1, 9)]     # 99
        w = 1.0
    elif w_case == "villain_wins":
        hero = [make_card(0, 9), make_card(1, 9)]
        vill = [make_card(2, 14), make_card(0, 13)]
        w = 0.0
    else:
        hero = [make_card(0, 14), make_card(1, 7)]    # A7
        vill = [make_card(1, 14), make_card(3, 7)]    # A7 (same ranks)
        w = 0.5

    pot, B, R = 20.0, 20.0, 60.0
    game = RiverGame(jnp.array([[w]]), jnp.ones((1, 1)), pot, B, R)
    U = _payoffs(game)

    def u(name):
        v = U[name]
        return float(v if isinstance(v, float) else v[0, 0])

    lines = {
        # river actions (P1 first): engine ints fold=-1, check/call=0,
        # bet/raise=amount-above-call
        "cc": [0, 0],
        "xbf": [0, int(B), -1],
        "xbc": [0, int(B), 0],
        "bf": [int(B), -1],
        "bc": [int(B), 0],
        "brf": [int(B), int(R), -1],
        "brc": [int(B), int(R), 0],
    }
    for name, acts in lines.items():
        delta = _play_line(hero, vill, board, acts, cfg)
        assert delta is not None, f"line {name} did not finish the hand"
        expect = u(name) - cfg.big_blind
        assert delta == int(expect), (
            f"line {name}: engine delta {delta} != model {expect}")


def test_net_river_strategy_extraction_matches_bot_rules():
    """The net-strategy extraction path (river_node_states +
    net_river_strategy) runs packed rule bots through the real
    feature/logit pipeline; their known decision rules pin the mapping:
    fof_call facing the bet at n2 calls exactly the combos whose
    made-hand category is pair-or-better, and folds the rest."""
    from montecarlo_tpu.models.bots import panel
    from montecarlo_tpu.models.river_solver import (
        all_combos, net_river_strategy, river_node_states,
    )
    from montecarlo_tpu.ops.evaluator import (
        eval_masks_impl, suit_masks_from_cards,
    )
    from montecarlo_tpu.handval import CAT_SHIFT

    board = _board()
    states, _ = river_node_states(board)
    combos = all_combos(board)[:200]
    bot = panel()["fof_call"]
    strat = net_river_strategy(bot, states, combos, combos)

    cards = np.concatenate(
        [combos, np.broadcast_to(board[None], (len(combos), 5))], axis=1)
    keys = np.asarray(jax.vmap(
        lambda c: eval_masks_impl(*suit_masks_from_cards(c)))(
            jnp.asarray(cards))).astype(np.uint32)
    has_pair = (keys >> CAT_SHIFT) >= 1

    s2 = np.asarray(strat.s2)  # facing the check-bet: fold/call
    assert np.all(s2[has_pair, 1] > 0.99), "pair+ must call"
    assert np.all(s2[~has_pair, 0] > 0.99), "no pair must fold"
    # at the free root the bot checks (hi=call when s>t maps to check)
    s0 = np.asarray(strat.s0)
    assert np.all(s0[:, 0] > 0.99), "fof_call never bets the root"
