"""Host-side public projection of a table state.

Mirrors ``read-board`` (``helpers.clj:33-43``) and the card/hand JSON shapes
the reference server emits (``README.md:52-57``): community cards, bet and
pot layers, remaining players, the visible play-order window, the logical
clock, and per-player public stacks. Hole cards stay private (served per
player by the ``hand`` query, newest card first — hands are conj'd lists,
``player.clj:53-55``).

Pure host code (numpy on a single unbatched state) — used by the TCP server
and by trace-conformance tests; never on the device hot path.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from montecarlo_tpu.cards import SUIT_NAMES, card_rank, card_suit
from montecarlo_tpu.engine.state import TableState


def card_json(card: int) -> Dict:
    return {"suit": SUIT_NAMES[int(card_suit(int(card)))],
            "rank": int(card_rank(int(card)))}


def _np(state: TableState) -> TableState:
    import jax

    # Skip the PRNG key leaf (typed keys reject numpy conversion).
    return jax.tree.map(np.asarray, state._replace(key=np.zeros(())))


def _seat_ids(mask, ids: Sequence[str], order: Sequence[int]) -> List[str]:
    return [ids[s] for s in order if mask[s]]


def hand_order(state: TableState) -> List[int]:
    """Seats in hand order (the reference's rotated players-list order)."""
    P = state.num_seats
    button = int(state.button)
    return [(button + j) % P for j in range(P)]


def _layers_json(layers, ids: Sequence[str], order: Sequence[int]) -> List[Dict]:
    out = []
    for i in range(int(layers.count)):
        out.append({
            "bet": int(layers.amt[i]),
            "players": _seat_ids(np.asarray(layers.mem[i]), ids, order),
            "original-players": _seat_ids(np.asarray(layers.orig[i]), ids, order),
            "n": int(layers.n[i]),
        })
    return out


def public_board(state: TableState, ids: Sequence[str]) -> Dict:
    """The client-visible board map (``helpers.clj:33-43``).

    ``ids[seat]`` names each seat. Player sets are emitted in hand order
    (the reference serializes Clojure sets, whose order is unspecified).
    """
    st = _np(state)
    order = hand_order(st)
    n_players = int(np.sum(st.in_hand))

    # play-order: first |players| elements of the filtered cycle from cursor
    # (helpers.clj:37-39).
    P = st.num_seats
    play_order: List[str] = []
    j = int(st.cursor)
    while len(play_order) < n_players and n_players > 0:
        seat = (int(st.button) + j % P) % P
        if st.order_mask[seat]:
            play_order.append(ids[seat])
        j += 1
        if j > int(st.cursor) + 2 * P:  # order_mask ⊇ in_hand: can't happen
            break

    return {
        "community-cards": [card_json(c) for c in
                            st.community[: int(st.n_community)]],
        "bets": _layers_json(st.bets, ids, order),
        "pots": _layers_json(st.pots, ids, order),
        "remaining-players": _seat_ids(st.to_act, ids, order),
        "play-order": play_order,
        "time": int(st.time),
        "players": [{"id": ids[s], "stack": int(st.stacks[s])}
                    for s in order if st.in_hand[s]],
    }


def player_hand_json(state: TableState, seat: int) -> List[Dict]:
    """The ``hand`` query payload: hole cards, newest first
    (``server.clj:92-101``; hands are conj'd lists so the second-dealt card
    leads)."""
    st = _np(state)
    return [card_json(st.hole[seat, 1]), card_json(st.hole[seat, 0])]
