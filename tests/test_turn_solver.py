"""Two-street (turn+river) CFR+ solver: certificates and reductions.

The solver's own exploitability gap is the primary certificate; the
reductions cross-check the two-street machinery against the
independently tested one-street solver (tests/test_river_solver.py):

- river betting OFF  => EV-equivalent to ONE street on the
  chance-averaged equity matrix;
- turn betting OFF with a single river card => the game IS the river
  subgame on board+[r], solved by river_solver.

EV comparisons are gap-certified: any profile's EV sits within its own
exploitability gap of the (unique, zero-sum) Nash EV, so two profiles'
EVs can differ by at most the sum of their gaps.
"""

import numpy as np
import pytest

from montecarlo_tpu.cards import make_card
from montecarlo_tpu.models.river_solver import (
    make_river_game,
    solve_cfr_plus,
)
from montecarlo_tpu.models.river_solver import (
    exploitability_gap as river_gap,
)
from montecarlo_tpu.models.river_solver import (
    strategy_values as river_values,
)
from montecarlo_tpu.models.turn_solver import (
    chance_averaged_equity,
    exploitability_gap,
    make_turn_river_game,
    solve_turn_river,
    strategy_values,
    turn_combos,
)

BOARD4 = [make_card(2, 13), make_card(0, 8), make_card(1, 5),
          make_card(3, 2)]  # Ks 8h 5d 2c
RIVERS = [make_card(2, 12), make_card(0, 3), make_card(1, 9)]


def _combo_subset(board4, stride=16):
    """A diverse fixed subset keeps the toy games fast but non-trivial."""
    return turn_combos(board4)[::stride]


def test_two_street_gap_converges_and_constant_sum():
    combos = _combo_subset(BOARD4)
    game, _ = make_turn_river_game(BOARD4, rivers=RIVERS, combos=combos,
                                   pot=4.0, bet=4.0, raise_=12.0)
    strat = solve_turn_river(game, iterations=500)
    gap = exploitability_gap(game, strat)
    ev1, ev2 = strategy_values(game, strat)
    assert gap >= -1e-3  # BR can never do worse than the profile
    assert gap < 0.06 * game.pot, gap
    assert ev1 + ev2 == pytest.approx(game.pot)
    # profile EV within its own gap of the Nash EV band
    from montecarlo_tpu.models.turn_solver import best_response_values
    br1, br2 = best_response_values(game, strat)
    assert game.pot - br2 - 1e-4 <= ev1 <= br1 + 1e-4


def test_chance_averaged_equity_is_symmetric():
    combos = _combo_subset(BOARD4, stride=24)
    game, _ = make_turn_river_game(BOARD4, rivers=RIVERS, combos=combos)
    w = np.asarray(chance_averaged_equity(game))
    m = np.asarray(game.mask0)
    np.testing.assert_allclose((w + w.T)[m > 0], 1.0, atol=1e-5)


def test_river_betting_off_reduces_to_one_street():
    """With rivers checking down, the two-street game is EV-equivalent
    to a one-street game on the chance-averaged equity matrix."""
    combos = _combo_subset(BOARD4)
    game, _ = make_turn_river_game(BOARD4, rivers=RIVERS, combos=combos,
                                   pot=4.0, bet=2.0, raise_=6.0,
                                   river_betting=False)
    strat = solve_turn_river(game, iterations=600)
    gap2 = exploitability_gap(game, strat)
    ev1, _ = strategy_values(game, strat)

    from montecarlo_tpu.models.river_solver import RiverGame
    ref = RiverGame(W=chance_averaged_equity(game), mask=game.mask0,
                    pot=4.0, bet=2.0, raise_=6.0)
    rstrat = solve_cfr_plus(ref, iterations=600)
    gap1 = river_gap(ref, rstrat)
    rev1, _ = river_values(ref, rstrat)

    assert gap2 < 0.05 and gap1 < 0.05, (gap2, gap1)
    assert abs(ev1 - rev1) <= gap1 + gap2 + 1e-3, (ev1, rev1)


def test_turn_check_down_single_river_is_the_river_subgame():
    """turn_betting=False with one river card IS the river game on
    board+[r]: EVs must agree with the one-street solver."""
    r = RIVERS[0]
    combos = _combo_subset(BOARD4)
    pot, frac = 4.0, 0.5
    game, _ = make_turn_river_game(BOARD4, rivers=[r], combos=combos,
                                   pot=pot, river_bet_frac=frac,
                                   turn_betting=False)
    strat = solve_turn_river(game, iterations=600)
    gap2 = exploitability_gap(game, strat)
    ev1, _ = strategy_values(game, strat)

    bet = frac * pot
    board5 = list(BOARD4) + [r]
    sub = np.array([c for c in np.asarray(combos)
                    if r not in (int(c[0]), int(c[1]))], np.int32)
    ref, _, _ = make_river_game(board5, hero_combos=sub,
                                villain_combos=sub, pot=pot, bet=bet,
                                raise_=pot + 2 * bet)
    rstrat = solve_cfr_plus(ref, iterations=600)
    gap1 = river_gap(ref, rstrat)
    rev1, _ = river_values(ref, rstrat)

    # identical valid-pair sets => directly comparable averages
    assert float(np.asarray(game.mask0).sum()) == pytest.approx(
        float(np.asarray(ref.mask).sum()))
    assert gap2 < 0.05 and gap1 < 0.05, (gap2, gap1)
    assert abs(ev1 - rev1) <= gap1 + gap2 + 1e-3, (ev1, rev1)
