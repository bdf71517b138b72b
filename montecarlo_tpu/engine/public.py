"""Host-side public projection of a table state.

Mirrors ``read-board`` (``helpers.clj:33-43``) and the card/hand JSON shapes
the reference server emits (``README.md:52-57``): community cards, bet and
pot layers, remaining players, the visible play-order window, the logical
clock, and per-player public stacks. Hole cards stay private (served per
player by the ``hand`` query, newest card first — hands are conj'd lists,
``player.clj:53-55``).

Device state is indexed by hand-order *position*; ``ids`` are indexed by
stable *seat*. ``seat = (button + position) % P`` bridges the two here, at
the host boundary.

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


def ids_by_position(state: TableState, ids: Sequence[str]) -> List[str]:
    """Player ids in hand-order (position) order."""
    P = state.num_seats
    button = int(state.button)
    return [ids[(button + j) % P] for j in range(P)]


def _pos_ids(mask, ids_pos: Sequence[str]) -> List[str]:
    return [ids_pos[j] for j in range(len(ids_pos)) if mask[j]]


def _bitmask_ids(mask: int, ids_pos: Sequence[str]) -> List[str]:
    return [ids_pos[j] for j in range(len(ids_pos)) if (int(mask) >> j) & 1]


def _layers_json(layers, ids_pos: Sequence[str]) -> List[Dict]:
    out = []
    for i in range(int(layers.count)):
        out.append({
            "bet": int(layers.amt[i]),
            "players": _bitmask_ids(layers.mem[i], ids_pos),
            "original-players": _bitmask_ids(layers.orig[i], ids_pos),
            "n": int(layers.n[i]),
        })
    return out


def public_board(state: TableState, ids: Sequence[str]) -> Dict:
    """The client-visible board map (``helpers.clj:33-43``).

    ``ids[seat]`` names each stable seat. Player sets are emitted in hand
    order (the reference serializes Clojure sets, whose order is
    unspecified).
    """
    from montecarlo_tpu.engine.street import bets_as_layers

    state = state._replace(bets=bets_as_layers(state.bets, state.folded))
    st = _np(state)
    P = st.num_seats
    ids_pos = ids_by_position(st, ids)
    n_players = int(np.sum(st.in_hand))

    # play-order: first |players| elements of the filtered cycle from cursor
    # (helpers.clj:37-39).
    play_order: List[str] = []
    j = int(st.cursor)
    while len(play_order) < n_players and n_players > 0:
        if st.order_mask[j % P]:
            play_order.append(ids_pos[j % P])
        j += 1
        if j > int(st.cursor) + 2 * P:  # order_mask ⊇ in_hand: can't happen
            break

    return {
        "community-cards": [card_json(c) for c in
                            st.community[: int(st.n_community)]],
        "bets": _layers_json(st.bets, ids_pos),
        "pots": _layers_json(st.pots, ids_pos),
        "remaining-players": _pos_ids(st.to_act, ids_pos),
        "play-order": play_order,
        "time": int(st.time),
        "players": [{"id": ids_pos[j], "stack": int(st.stacks[j])}
                    for j in range(P) if st.in_hand[j]],
    }


def player_hand_json(state: TableState, seat: int) -> List[Dict]:
    """The ``hand`` query payload for a stable seat: hole cards, newest
    first (``server.clj:92-101``; hands are conj'd lists so the second-dealt
    card leads)."""
    st = _np(state)
    pos = (seat - int(st.button)) % st.num_seats
    return [card_json(st.hole[pos, 1]), card_json(st.hole[pos, 0])]
