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


def test_no_raise_game_solves_and_brc_unreachable():
    """The artifact tree (turn_raise=river_raise=False — fits 100-chip
    stacks with pot-bet sizes) converges, and the average strategy puts
    zero mass on the gated raises."""
    combos = _combo_subset(BOARD4, stride=24)
    game, _ = make_turn_river_game(BOARD4, rivers=RIVERS, combos=combos,
                                   pot=4.0, bet=4.0,
                                   turn_raise=False, river_raise=False)
    strat = solve_turn_river(game, iterations=400)
    gap = exploitability_gap(game, strat)
    assert gap < 0.06 * game.pot, gap
    assert float(np.abs(np.asarray(strat.t3[:, 2])).max()) == 0.0
    assert float(np.abs(np.asarray(strat.s3[..., 2])).max()) == 0.0


def test_node_states_streets_and_pots():
    """The scripted prelude reaches the turn with a 2bb pot; each line's
    river state carries that line's (real) pot; bet sizes are the
    measured net menu (quirky-pot formula: 20 / 20, 30, 30)."""
    import jax

    from montecarlo_tpu.models.turn_solver import turn_river_node_states

    ts, rs, sizes = turn_river_node_states(BOARD4, RIVERS)
    assert sizes == {"pot": 20.0, "bet": 20.0,
                     "river_bets": (20.0, 30.0, 30.0, 30.0)}

    def total_pot(s):
        # real chips in the middle = what left the stacks (conservation;
        # the layered pot arrays carry the reference's n-inflation quirk
        # and cannot be summed directly)
        return 200 - int(np.asarray(s.stacks).sum())

    assert int(ts["n0"].n_community) == 4
    assert total_pot(ts["n0"]) == 20
    assert total_pot(ts["n3"]) == 40     # P1's bet is in
    for L, pot_l in (("cc", 20), ("xbc", 60), ("bc", 60)):
        n0 = jax.tree_util.tree_map(lambda x: x[0], rs[L]["n0"])
        assert int(n0.n_community) == 5
        assert total_pot(n0) == pot_l, (L, total_pot(n0))
        # each river deck deals its own river card
        comm = np.asarray(rs[L]["n0"].community[:, 4])
        np.testing.assert_array_equal(comm, np.asarray(RIVERS))


def test_net_extraction_known_bots():
    """Packed rule bots extract to the obvious tree strategies: a
    calling station never bets or folds; a pot-raise bot always bets and
    (facing a bet) continues — raise mass maps to call."""
    from montecarlo_tpu.models.bots import action_bot
    from montecarlo_tpu.models.turn_solver import (
        net_turn_river_strategy, turn_river_node_states,
    )

    combos = _combo_subset(BOARD4, stride=48)
    ts, rs, _ = turn_river_node_states(BOARD4, RIVERS)

    call = net_turn_river_strategy(action_bot(1), ts, rs, combos)
    np.testing.assert_allclose(np.asarray(call.t0[:, 0]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(call.t2[:, 1]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(call.s1[:3, ..., 0]), 1.0,
                               atol=1e-4)

    pot = net_turn_river_strategy(action_bot(3), ts, rs, combos)
    np.testing.assert_allclose(np.asarray(pot.t0[:, 1]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pot.t3[:, 1]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pot.s0[:3, ..., 1]), 1.0,
                               atol=1e-4)
    # rows are distributions everywhere
    for arr in (pot.t0, pot.t1, pot.t2, pot.t3, call.s0[:3], call.s2[:3],
                call.s3[:3]):
        np.testing.assert_allclose(np.asarray(arr).sum(-1), 1.0,
                                   atol=1e-4)


def test_mesh_sharded_solve_matches_single_device():
    """The rivers-axis shard_map solve (8-device CPU mesh) converges and
    agrees with the single-device solve: both gaps certify, and the EVs
    differ by at most the sum of the gaps (unique zero-sum Nash EV)."""
    import jax
    from jax.sharding import Mesh

    from montecarlo_tpu.models.turn_solver import strategy_values

    dead = {int(c) for c in BOARD4}
    rivers8 = [c for c in range(52) if c not in dead][:8]
    combos = _combo_subset(BOARD4, stride=24)
    game, _ = make_turn_river_game(BOARD4, rivers=rivers8, combos=combos,
                                   pot=4.0, bet=4.0, raise_=12.0)
    single = solve_turn_river(game, iterations=300)
    mesh = Mesh(np.array(jax.devices()[:8]), ("r",))
    sharded = solve_turn_river(game, iterations=300, mesh=mesh)

    g1 = exploitability_gap(game, single)
    g2 = exploitability_gap(game, sharded)
    assert g1 < 0.05 and g2 < 0.05, (g1, g2)
    ev1, _ = strategy_values(game, single)
    ev2, _ = strategy_values(game, sharded)
    assert abs(ev1 - ev2) <= g1 + g2 + 1e-3, (ev1, ev2)


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
