"""Single-table engine trace conformance.

The scripted multi-street scenarios revive the reference's commented
integration scripts (``test/montecarlo/core_test.clj:326-461``) as
deterministic synchronous traces: the channel pushes become step_action
calls (the sleeps/races disappear because the engine is pure). Where the
scripts' literal Bet expectations predate fold-removal semantics, the
assertions here follow the reference *code* (``bet.clj``/``board.clj``),
hand-verified step by step.
"""

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.cards import make_card
from montecarlo_tpu.engine import (
    TableConfig,
    begin_hand,
    clamp_action,
    game_end,
    head_info,
    init_state,
    public_board,
    redeal,
    settle_showdown,
    step_action,
    step_table,
)
from tests.util import fs, layers_spec

H, D, S, C = 0, 1, 2, 3


def mkstate(n, **kw):
    cfg = TableConfig(num_seats=n, **kw)
    return init_state(jax.random.key(0), cfg)


def act(state, action):
    """Push a raw client action through validation then the board step,
    as player-action does (``player.clj:34-45``)."""
    return step_action(state, clamp_action(state, jnp.asarray(action, jnp.int32)))


def head(state):
    seat, _, _ = head_info(state)
    return int(seat)


def to_act_set(state):
    return frozenset(np.nonzero(np.asarray(state.to_act))[0].tolist())


def in_hand_set(state):
    return frozenset(np.nonzero(np.asarray(state.in_hand))[0].tolist())


def test_play_blinds_two_players():
    # core_test.clj:29-40 (the only live reference test): blinds 5/10.
    st = mkstate(2)
    assert layers_spec(st.bets) == [(5, fs(0, 1), fs(0, 1), 2), (5, fs(1), fs(1), 1)]
    assert np.asarray(st.stacks).tolist() == [95, 90]
    assert head(st) == 0  # play-order dropped 2 -> cycles back to p1
    assert to_act_set(st) == fs(0, 1)
    assert int(st.time) == 0  # blinds don't tick the clock


def test_play_blinds_three_players():
    # core_test.clj:41-51
    st = mkstate(3)
    assert layers_spec(st.bets) == [(5, fs(0, 1), fs(0, 1), 2), (5, fs(1), fs(1), 1)]
    assert head(st) == 2
    assert to_act_set(st) == fs(0, 1, 2)


def test_scenario_no_one_left_for_turn():
    # core_test.clj:327-353: p3 call, p1 raise 10, p2 fold, p3 fold.
    st = mkstate(3)

    st = act(st, 0)  # p3 calls
    assert layers_spec(st.bets) == [(5, fs(0, 1, 2), fs(0, 1, 2), 3),
                                    (5, fs(1, 2), fs(1, 2), 2)]
    assert np.asarray(st.stacks).tolist() == [95, 90, 90]
    assert head(st) == 0 and int(st.time) == 1
    assert to_act_set(st) == fs(0, 1)

    st = act(st, 10)  # p1 raises by 10 (threads 10 + standing 10 = 20)
    assert layers_spec(st.bets) == [(5, fs(0, 1, 2), fs(0, 1, 2), 4),
                                    (5, fs(0, 1, 2), fs(0, 1, 2), 3),
                                    (10, fs(0), fs(0), 1)]
    assert np.asarray(st.stacks).tolist() == [80, 90, 90]
    assert head(st) == 1 and to_act_set(st) == fs(1, 2)

    st = act(st, -1)  # p2 folds: member removal + adjacent coalesce
    assert layers_spec(st.bets) == [(10, fs(0, 2), fs(0, 1, 2), 3),
                                    (10, fs(0), fs(0), 1)]
    assert in_hand_set(st) == fs(0, 2)
    assert head(st) == 2 and to_act_set(st) == fs(2)

    st = act(st, -1)  # p3 folds -> hand over
    assert bool(st.hand_over)
    assert in_hand_set(st) == fs(0)

    st = settle_showdown(st)
    # pots = [(10,{p1},{p1,p2,p3},3), (10,{p1},{p1},1)]: p1 collects 30 + 10.
    assert layers_spec(st.pots) == [(10, fs(0), fs(0, 1, 2), 3),
                                    (10, fs(0), fs(0), 1)]
    assert np.asarray(st.stacks).tolist() == [120, 90, 90]  # conserved: 40 in


def _showdown_deck():
    """Deck giving p1 trips aces, p3 ace-high junk, p2 (folds) filler.

    3-player deal order (gameplay.clj:63-75): seats get deck[j], deck[3+j];
    then burn+flop deck[7:10], burn+turn deck[11], burn+river deck[13].
    """
    ah, ad, as_, kh, qd, n9c, h4 = (make_card(H, 14), make_card(D, 14),
                                    make_card(S, 14), make_card(H, 13),
                                    make_card(D, 12), make_card(C, 9),
                                    make_card(H, 4))
    s2, c3, h5, h6 = make_card(S, 2), make_card(C, 3), make_card(H, 5), make_card(H, 6)
    used = [ah, h5, s2,          # first hole card: p1, p2, p3
            ad, h6, c3,          # second hole card
            None,                # burn (any unused card)
            as_, kh, qd,         # flop
            None, n9c,           # burn, turn
            None, h4]            # burn, river
    rest = iter(c for c in range(52)
                if c not in {x for x in used if x is not None})
    deck = [c if c is not None else next(rest) for c in used]
    deck += [c for c in range(52) if c not in set(deck)]
    assert sorted(deck) == list(range(52))
    return deck


def test_scenario_all_the_way_to_showdown():
    # core_test.clj:422-461: preflop p3 call, p1 call, p2 fold; flop p1
    # raise 10, p3 call; turn p1 check, p3 raise 17, p1 call; river p1
    # raise 3, p3 call. Expected pot amounts [10, 10, 17, 3].
    st = redeal(mkstate(3), jnp.array(_showdown_deck(), jnp.int32))

    st = act(st, 0)    # p3 calls
    st = act(st, 0)    # p1 completes the small blind (n-inflation quirk)
    assert layers_spec(st.bets) == [(5, fs(0, 1, 2), fs(0, 1, 2), 4),
                                    (5, fs(0, 1, 2), fs(0, 1, 2), 3)]
    st = act(st, -1)   # p2 folds -> street ends -> flop
    assert int(st.stage) == 1 and int(st.n_community) == 3
    assert layers_spec(st.pots) == [(10, fs(0, 2), fs(0, 1, 2), 3)]
    assert layers_spec(st.bets) == []
    assert head(st) == 0  # play-order rebuilt from :players

    st = act(st, 10)   # p1 raises
    st = act(st, 0)    # p3 calls -> turn
    assert int(st.stage) == 2 and int(st.n_community) == 4
    assert [s[0] for s in layers_spec(st.pots)] == [10, 10]

    st = act(st, 0)    # p1 checks
    assert layers_spec(st.bets) == []
    st = act(st, 17)   # p3 raises
    st = act(st, 0)    # p1 calls -> river
    assert int(st.stage) == 3 and int(st.n_community) == 5

    st = act(st, 3)    # p1 raises 3
    st = act(st, 0)    # p3 calls -> showdown
    assert bool(st.hand_over)

    st = settle_showdown(st)
    assert [s[0] for s in layers_spec(st.pots)] == [10, 10, 17, 3]
    # p1 (trips aces) beats p3 (ace-high): collects 10*3 + 10*2 + 17*2 + 3*2
    # = 90 of the 90 contributed chips. Stacks: p1 100-40+90, p2 90, p3 60.
    assert np.asarray(st.stacks).tolist() == [150, 90, 60]


def test_all_in_side_pot():
    # BASELINE config 2: all-in creates a side pot; the all-in seat is
    # removed from :players and excluded from showdown evaluation
    # (board.clj:80-89) — even holding the best hand it wins nothing.
    st = redeal(mkstate(3), jnp.array(_swap_p1_p3(_showdown_deck()), jnp.int32))
    st = st._replace(stacks=jnp.array([95, 90, 40], jnp.int32))  # short p3

    st = act(st, 30)   # p3 raise-all-in: delta 10 + 30 == stack 40
    assert in_hand_set(st) == fs(0, 1)
    assert int(st.stacks[2]) == 0
    assert layers_spec(st.bets) == [(5, fs(0, 1, 2), fs(0, 1, 2), 3),
                                    (5, fs(1, 2), fs(1, 2), 2),
                                    (30, fs(2), fs(2), 1)]
    assert to_act_set(st) == fs(0, 1)

    st = act(st, 0)    # p1 calls 35
    st = act(st, 0)    # p2 calls 30 -> flop
    assert int(st.stage) == 1
    assert layers_spec(st.pots) == [(5, fs(0, 1, 2), fs(0, 1, 2), 5),
                                    (5, fs(0, 1, 2), fs(0, 1, 2), 4),
                                    (30, fs(0, 1, 2), fs(0, 1, 2), 3)]
    # All-in seat is out of the rebuilt play-order:
    assert head(st) == 0

    for _ in range(6):  # p1/p2 check down flop, turn, river
        st = act(st, 0)
    assert bool(st.hand_over)

    st = settle_showdown(st)
    # p3 holds trips aces but is ineligible; p1 (ace-high with the kicker
    # king... of the two live hands p1's junk vs p2's junk) — compute who
    # won from values, but the invariant under test: p3 got nothing.
    assert int(st.stacks[2]) == 0
    # Payout = 5*5 + 5*4 + 30*3 = 135 (n-inflation mints chips, faithfully).
    assert int(np.asarray(st.stacks).sum()) == 95 + 90 + 0 - 65 + 135


def _swap_p1_p3(deck):
    """Give p3 the premium holding instead of p1."""
    d = list(deck)
    d[0], d[2] = d[2], d[0]
    d[3], d[5] = d[5], d[3]
    return d


def test_step_table_continuous_next_hand():
    st = mkstate(2)
    # Heads-up: p1 folds immediately; p2 collects, next hand auto-deals with
    # the button rotated (gameplay.clj:136-150).
    st2 = step_table(st, jnp.asarray(-1, jnp.int32))
    assert int(st2.hand_idx) == 1
    assert int(st2.button) == 1
    assert int(st2.stage) == 0 and int(st2.time) == 0
    assert not bool(st2.hand_over)
    # State is positional: new position 0 = old position 1 (seat 1), who now
    # posts the small blind; position 1 (seat 0) posts the big blind.
    assert layers_spec(st2.bets) == [(5, fs(0, 1), fs(0, 1), 2), (5, fs(1), fs(1), 1)]
    # p1 folded to the 5/10 blinds: p2 won 5*2+5*1=15 (contributed 10, p1 5:
    # conserved). Then new blinds: p2 (SB now, position 0) -5, p1 (BB,
    # position 1) -10.
    assert np.asarray(st2.stacks).tolist() == [105 - 5, 95 - 10]


def test_clamp_action_matches_player_validation():
    st = mkstate(3)  # head p3, stack 100, needed 10
    assert int(clamp_action(st, jnp.asarray(95, jnp.int32))) == 90  # cap
    assert int(clamp_action(st, jnp.asarray(200, jnp.int32))) == 90
    assert int(clamp_action(st, jnp.asarray(50, jnp.int32))) == 50
    assert int(clamp_action(st, jnp.asarray(0, jnp.int32))) == 0
    assert int(clamp_action(st, jnp.asarray(-3, jnp.int32))) == -3


def test_public_board_shape():
    st = mkstate(3)
    ids = ["G__1", "G__2", "G__3"]
    pb = public_board(st, ids)
    assert pb["time"] == 0
    assert pb["community-cards"] == []
    assert pb["remaining-players"] == ids
    assert pb["play-order"] == ["G__3", "G__1", "G__2"]
    assert pb["players"] == [{"id": i, "stack": s}
                             for i, s in zip(ids, [95, 90, 100])]
    assert pb["bets"][0] == {"bet": 5, "players": ["G__1", "G__2"],
                             "original-players": ["G__1", "G__2"], "n": 2}


def test_vmapped_batch_step_compiles_and_runs():
    cfg = TableConfig(num_seats=3)
    keys = jax.random.split(jax.random.key(7), 64)
    states = jax.vmap(lambda k: init_state(k, cfg))(keys)
    actions = jnp.zeros((64,), jnp.int32)
    stepped = jax.jit(jax.vmap(step_action))(states, actions)
    assert int(jnp.sum(stepped.time)) == 64
