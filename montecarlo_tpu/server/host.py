"""Room/registry host logic bridging clients onto the device engine.

The reference's concurrency machinery (per-player/per-board go-loops, STM
databases, sliding-buffer action channels — ``database.clj``, ``board.clj``,
``player.clj``) collapses into plain synchronous host code around the pure
engine step: each room owns one ``TableState``; client ``play`` commands
land in a one-slot pending mailbox (the reference's ``sliding-buffer 1``
listen channel, newest overwrites — ``database.clj:42``); after every state
change the room drains whichever seat is now head of the play-order.

Protocol quirks preserved:

- Seat order is *reverse join order*: the reference conj's joiners onto a
  list (``server.clj:57``), so the last joiner posts the small blind.
- Board updates go only to players still in the hand (``update-players``
  maps over ``:players``, ``board.clj:109-112``) — folded and all-in seats
  stop hearing about the hand.
- Hand end sends no result message: clients see fresh hole cards and the
  next hand's board (``gameplay.clj:149-150``).
- Exact status codes/messages, including the "postive" typo
  (``server.clj:39``).
"""

from __future__ import annotations

import itertools
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from montecarlo_tpu.engine.public import card_json, player_hand_json, public_board
from montecarlo_tpu.engine.state import TableConfig, init_state, next_hand
from montecarlo_tpu.engine.step import (
    apply_action,
    clamp_action,
    game_end,
    head_info,
    settle_showdown,
    stage_end,
    stage_transition,
)

Send = Callable[[object], None]  # per-player outbound JSON-able sink

OK = {"status": 0, "msg": "OK"}


def error(status: int, msg: str) -> Dict:
    return {"status": status, "msg": msg}


def _pos_int(x) -> bool:
    return isinstance(x, int) and not isinstance(x, bool) and x > 0


class Room:
    """One table: players, engine state, pending-action mailboxes."""

    def __init__(self, name: str, n: int, blinds: Dict[str, int], seed: int = 0):
        self.name = name
        self.n = n
        self.blinds = dict(blinds)
        self.seed = seed
        self.joined: List[str] = []   # join order
        self.seats: List[str] = []    # seat order (reverse join order)
        self.state = None
        self.pending: Dict[str, Optional[int]] = {}

    @property
    def started(self) -> bool:
        return self.state is not None

    def seat_of(self, pid: str) -> Optional[int]:
        return self.seats.index(pid) if pid in self.seats else None

    # -- lifecycle ----------------------------------------------------------
    def add_player(self, pid: str, registry: "Registry"):
        self.joined.append(pid)
        if len(self.joined) == self.n and not self.started:
            self.start(registry)

    def start(self, registry: "Registry"):
        # Reference list-conj semantics: last joiner heads the players list.
        self.seats = list(reversed(self.joined[: self.n]))
        cfg = TableConfig(
            num_seats=self.n,
            small_blind=self.blinds.get("small", 5),
            big_blind=self.blinds.get("big", 10),
        )
        state = init_state(jax.random.key(self.seed), cfg)
        # Stacks are global per player across rooms (database.clj:31); pull
        # each player's current stack from the registry.
        stacks = jnp.array([registry.stacks[p] for p in self.seats], jnp.int32)
        posted = np.asarray(state.stacks) - cfg.starting_stack  # blind debits
        self.state = state._replace(stacks=stacks + jnp.asarray(posted))
        self.pending = {p: None for p in self.seats}
        self._sync_registry(registry)
        self._deal_messages(registry)
        self._broadcast(registry)

    # -- messaging ----------------------------------------------------------
    def _deal_messages(self, registry: "Registry"):
        """Hole cards, one player at a time (deal-hand, gameplay.clj:63-75)."""
        st = self.state
        for k in range(2):
            for seat, pid in enumerate(self.seats):
                card = int(np.asarray(st.hole)[seat, k])
                registry.send(pid, {"card": card_json(card), "room": self.name})

    def _broadcast(self, registry: "Registry"):
        """Board to every in-hand player (update-players, board.clj:109)."""
        board = public_board(self.state, self.seats)
        in_hand = np.asarray(self.state.in_hand)
        for seat, pid in enumerate(self.seats):
            if in_hand[seat]:
                registry.send(pid, board)

    def _sync_registry(self, registry: "Registry"):
        stacks = np.asarray(self.state.stacks)
        for seat, pid in enumerate(self.seats):
            registry.stacks[pid] = int(stacks[seat])

    # -- actions ------------------------------------------------------------
    def submit_action(self, pid: str, amt, registry: "Registry"):
        """The ``play`` command: drop into the one-slot mailbox (newest
        overwrites — sliding-buffer 1) and drain if it's this seat's turn."""
        if not self.started or pid not in self.pending:
            return  # reference: put to a nil channel, silently lost
        if not isinstance(amt, int) or isinstance(amt, bool):
            return
        self.pending[pid] = amt
        self.drain(registry)

    def head_pid(self) -> Optional[str]:
        seat, _, exists = head_info(self.state)
        if not bool(exists):
            return None
        return self.seats[int(seat)]

    def drain(self, registry: "Registry"):
        """Apply pending actions while the head seat has one queued
        (player-action gating, player.clj:34-45)."""
        while True:
            pid = self.head_pid()
            if pid is None or self.pending.get(pid) is None:
                return
            amt = self.pending[pid]
            self.pending[pid] = None
            self._board_action(int(amt), registry)

    def _pull_registry(self, registry: "Registry"):
        """Stacks are global refs shared across rooms (database.clj:8-12);
        re-read them so cross-room play sees live balances."""
        stacks = jnp.array([registry.stacks[p] for p in self.seats], jnp.int32)
        self.state = self.state._replace(stacks=stacks)

    def _board_action(self, amt: int, registry: "Registry"):
        """board-action (board.clj:122-129) with host-visible events."""
        self._pull_registry(registry)
        st = self.state
        action = clamp_action(st, jnp.asarray(amt, jnp.int32))
        st = apply_action(st, action)
        if bool(game_end(st)):
            st = next_hand(settle_showdown(st))
            self.state = st
            self._sync_registry(registry)
            self._deal_messages(registry)   # fresh hole cards, next hand
        elif bool(stage_end(st)):
            self.state = stage_transition(st)
            self._sync_registry(registry)
        else:
            self.state = st
            self._sync_registry(registry)
        self._broadcast(registry)


class Registry:
    """The global player/room databases (``database.clj:5-6``)."""

    def __init__(self):
        self.rooms: Dict[str, Room] = {}
        self.stacks: Dict[str, int] = {}          # global 100-chip stacks
        self.player_rooms: Dict[str, set] = {}
        self.sinks: Dict[str, Send] = {}
        self._gensym = itertools.count(1000)

    # -- connections ---------------------------------------------------------
    def add_player(self, sink: Send) -> str:
        pid = f"G__{next(self._gensym)}"
        self.stacks[pid] = 100                    # database.clj:31
        self.player_rooms[pid] = set()
        self.sinks[pid] = sink
        return pid

    def remove_player(self, pid: str):
        # The reference has no disconnect handling ("i don't know how to
        # quit you") — we at least drop the sink so sends become no-ops.
        self.sinks.pop(pid, None)

    def send(self, pid: str, msg):
        sink = self.sinks.get(pid)
        if sink is not None:
            sink(msg)

    # -- commands (server.clj:60-105) -----------------------------------------
    def new_room(self, pid: str, req: Dict):
        name = req.get("name")
        n = req.get("n")
        blinds = req.get("blinds") or {"small": 5, "big": 10}
        if name in self.rooms:
            return self.send(pid, error(-5, "room already exists."))
        if name is None:
            return self.send(pid, error(-5, "empty room name."))
        if not _pos_int(n):
            return self.send(
                pid, error(-5, "n (number of players) must be a postive integer."))
        if not all(_pos_int(v) for v in blinds.values()):
            return self.send(pid, error(-12, "Blinds must be positive integers"))
        self.rooms[name] = Room(name, n, blinds, seed=len(self.rooms))
        self.send(pid, OK)

    def join_room(self, pid: str, req: Dict):
        name = req.get("name")
        room = self.rooms.get(name)
        if room is None:
            return self.send(
                pid, error(-2, f'Room "{name}" does not exist yet.'))
        if name in self.player_rooms[pid]:
            return self.send(pid, error(-2, f'Already in room "{name}".'))
        self.player_rooms[pid].add(name)
        self.send(pid, OK)
        room.add_player(pid, self)

    def play(self, pid: str, req: Dict):
        room = self.rooms.get(req.get("name"))
        if room is not None and req.get("name") in self.player_rooms[pid]:
            room.submit_action(pid, req.get("amt"), self)

    def hand_query(self, pid: str, req: Dict):
        name = req.get("name")
        room = self.rooms.get(name)
        if name not in self.player_rooms.get(pid, set()) or room is None:
            return self.send(pid, error(-1, f"Player is not in room {name}"))
        if not room.started:
            return self.send(pid, {"hand": []})
        seat = room.seat_of(pid)
        if seat is None:
            return self.send(pid, {"hand": []})  # joined after the table filled
        self.send(pid, {"hand": player_hand_json(room.state, seat)})

    def whoami(self, pid: str):
        # The reference sends the bare gensym (server.clj:103-105), which
        # serializes as a JSON string — not the README's {"id": ...} shape.
        self.send(pid, pid)

    def dispatch(self, pid: str, req: Dict):
        cmd = req.get("type")
        if cmd == "new_room":
            self.new_room(pid, req)
        elif cmd == "join_room":
            self.join_room(pid, req)
        elif cmd == "play":
            self.play(pid, req)
        elif cmd == "hand":
            self.hand_query(pid, req)
        elif cmd == "whoami":
            self.whoami(pid)
        else:
            self.send(pid, error(-1, 'bad "type" argument'))
