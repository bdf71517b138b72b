"""Host/registry + TCP protocol conformance (``server.clj`` behavior)."""

import asyncio
import json

import pytest

from montecarlo_tpu.server.host import Registry
from montecarlo_tpu.server.tcp import start_server


class Client:
    def __init__(self, registry):
        self.msgs = []
        self.pid = registry.add_player(self.msgs.append)


def make3():
    reg = Registry()
    return reg, [Client(reg) for _ in range(3)]


def test_new_room_validations():
    reg, (a, b, c) = make3()
    reg.dispatch(a.pid, {"type": "new_room", "name": "r", "n": 0})
    assert a.msgs[-1] == {"status": -5,
                          "msg": "n (number of players) must be a postive integer."}
    reg.dispatch(a.pid, {"type": "new_room", "name": "r", "n": 2,
                         "blinds": {"small": 0, "big": 10}})
    assert a.msgs[-1] == {"status": -12, "msg": "Blinds must be positive integers"}
    reg.dispatch(a.pid, {"type": "new_room", "n": 2})
    assert a.msgs[-1] == {"status": -5, "msg": "empty room name."}
    reg.dispatch(a.pid, {"type": "new_room", "name": "r", "n": 2})
    assert a.msgs[-1] == {"status": 0, "msg": "OK"}
    reg.dispatch(a.pid, {"type": "new_room", "name": "r", "n": 3})
    assert a.msgs[-1] == {"status": -5, "msg": "room already exists."}
    reg.dispatch(a.pid, {"type": "nonsense"})
    assert a.msgs[-1] == {"status": -1, "msg": 'bad "type" argument'}


def test_join_room_errors():
    reg, (a, b, c) = make3()
    reg.dispatch(a.pid, {"type": "join_room", "name": "nope"})
    assert a.msgs[-1] == {"status": -2, "msg": 'Room "nope" does not exist yet.'}
    reg.dispatch(a.pid, {"type": "new_room", "name": "r", "n": 3})
    reg.dispatch(a.pid, {"type": "join_room", "name": "r"})
    assert a.msgs[-1] == {"status": 0, "msg": "OK"}
    reg.dispatch(a.pid, {"type": "join_room", "name": "r"})
    assert a.msgs[-1] == {"status": -2, "msg": 'Already in room "r".'}


def test_whoami_and_hand_queries():
    reg, (a, b, c) = make3()
    reg.dispatch(a.pid, {"type": "whoami"})
    assert a.msgs[-1] == a.pid  # bare gensym string, not {"id": ...}
    reg.dispatch(a.pid, {"type": "hand", "name": "r"})
    assert a.msgs[-1] == {"status": -1, "msg": "Player is not in room r"}


def test_game_start_flow_and_seat_order():
    reg, (a, b, c) = make3()
    reg.dispatch(a.pid, {"type": "new_room", "name": "hogwarts", "n": 3})
    for cl in (a, b, c):
        reg.dispatch(cl.pid, {"type": "join_room", "name": "hogwarts"})

    room = reg.rooms["hogwarts"]
    # Reverse join order (list-conj quirk): last joiner is seat 0 = small blind.
    assert room.seats == [c.pid, b.pid, a.pid]
    assert reg.stacks[c.pid] == 95 and reg.stacks[b.pid] == 90
    assert reg.stacks[a.pid] == 100

    for cl in (a, b, c):
        cards = [m for m in cl.msgs if isinstance(m, dict) and "card" in m]
        assert len(cards) == 2
        assert all(m["room"] == "hogwarts" for m in cards)
        boards = [m for m in cl.msgs if isinstance(m, dict) and "bets" in m]
        assert len(boards) == 1
        board = boards[0]
        assert board["time"] == 0
        assert board["play-order"][0] == a.pid  # first joiner acts first
        assert board["bets"][0]["bet"] == 5

    reg.dispatch(a.pid, {"type": "hand", "name": "hogwarts"})
    hand = a.msgs[-1]["hand"]
    assert len(hand) == 2 and all("suit" in c_ and "rank" in c_ for c_ in hand)


def test_play_mailbox_and_turn_order():
    reg, (a, b, c) = make3()
    reg.dispatch(a.pid, {"type": "new_room", "name": "r", "n": 3})
    for cl in (a, b, c):
        reg.dispatch(cl.pid, {"type": "join_room", "name": "r"})
    room = reg.rooms["r"]

    # Out of turn: seat1 (b) queues a call; nothing applies until head acts.
    t0 = room.engine.info()["time"]
    reg.dispatch(b.pid, {"type": "play", "name": "r", "amt": 0})
    assert room.engine.info()["time"] == t0

    # Head (a, first joiner = seat 2) calls; next head is c (small blind),
    # so b's queued action stays in the mailbox.
    reg.dispatch(a.pid, {"type": "play", "name": "r", "amt": 0})
    assert room.engine.info()["time"] == t0 + 1

    # c completes the small blind; b is now head and b's queued call drains
    # immediately (sliding-buffer semantics) -> street ends -> flop.
    reg.dispatch(c.pid, {"type": "play", "name": "r", "amt": 0})
    assert room.engine.info()["time"] == t0 + 3
    assert room.engine.info()["stage"] == 1

    # Folded players stop receiving board updates (update-players quirk).
    n_boards_b = len([m for m in b.msgs if isinstance(m, dict) and "bets" in m])
    reg.dispatch(c.pid, {"type": "play", "name": "r", "amt": -1})  # c folds
    reg.dispatch(a.pid, {"type": "play", "name": "r", "amt": 0})
    assert len([m for m in b.msgs if isinstance(m, dict) and "bets" in m]) \
        > n_boards_b
    boards_c = [m for m in c.msgs if isinstance(m, dict) and "bets" in m]
    last_c_time = boards_c[-1]["time"]
    assert last_c_time <= room.engine.info()["time"] - 1  # c no longer updated


def test_hand_end_rolls_into_next_hand():
    reg, clients = make3()
    a, b = clients[0], clients[1]
    reg.dispatch(a.pid, {"type": "new_room", "name": "hu", "n": 2})
    reg.dispatch(a.pid, {"type": "join_room", "name": "hu"})
    reg.dispatch(b.pid, {"type": "join_room", "name": "hu"})
    room = reg.rooms["hu"]
    # Seats reversed: b is seat 0 (SB), a seat 1 (BB); head is seat 0 = b.
    assert room.seats == [b.pid, a.pid]
    cards_before = len([m for m in a.msgs if isinstance(m, dict) and "card" in m])
    reg.dispatch(b.pid, {"type": "play", "name": "hu", "amt": -1})  # b folds
    # Next hand dealt silently: both players got 2 new cards; stacks settled.
    cards_after = len([m for m in a.msgs if isinstance(m, dict) and "card" in m])
    assert cards_after == cards_before + 2
    assert room.engine.info()["hand_idx"] == 1
    # Chips conserved: stacks + next hand's freshly-posted blinds == 200.
    assert reg.stacks[b.pid] + reg.stacks[a.pid] == 200 - 15
    # Button rotated: a (first joiner, seat 1) now posts the small blind.
    assert reg.stacks[a.pid] == 105 - 5 and reg.stacks[b.pid] == 95 - 10


def test_tcp_round_trip():
    async def scenario():
        server, reg = await start_server(host="127.0.0.1", port=0)
        port = server.sockets[0].getsockname()[1]

        async def client():
            return await asyncio.open_connection("127.0.0.1", port)

        async def send(w, obj):
            w.write((json.dumps(obj) + "\r\n").encode())
            await w.drain()

        async def recv(r):
            line = await asyncio.wait_for(r.readline(), timeout=5)
            return json.loads(line.decode().rstrip("\r\n"))

        r1, w1 = await client()
        r2, w2 = await client()

        await send(w1, {"type": "whoami"})
        p1 = await recv(r1)
        assert p1.startswith("G__")

        w1.write(b"this is not json\r\n")
        await w1.drain()
        assert (await recv(r1)) == {"status": -17, "msg": "You sent me bad json!"}

        await send(w1, {"type": "new_room", "name": "hu", "n": 2})
        assert (await recv(r1)) == {"status": 0, "msg": "OK"}
        await send(w1, {"type": "join_room", "name": "hu"})
        assert (await recv(r1)) == {"status": 0, "msg": "OK"}
        await send(w2, {"type": "join_room", "name": "hu"})
        assert (await recv(r2)) == {"status": 0, "msg": "OK"}

        # Game starts: each client gets 2 cards + 1 board.
        for r in (r1, r2):
            msgs = [await recv(r) for _ in range(3)]
            assert sum(1 for m in msgs if "card" in m) == 2
            assert sum(1 for m in msgs if "bets" in m) == 1

        # p2 joined last -> seat 0 -> heads-up head; p2 folds, hand rolls on.
        await send(w2, {"type": "play", "name": "hu", "amt": -1})
        msgs = [await recv(r1) for _ in range(3)]
        assert sum(1 for m in msgs if "card" in m) == 2

        for w in (w1, w2):
            w.close()
        server.close()
        await server.wait_closed()

    asyncio.run(scenario())


def test_jax_backend_room_smoke():
    # The JAX backend stays the always-available fallback; drive one hand.
    reg = Registry(backend="jax")
    a, b = Client(reg), Client(reg)
    reg.dispatch(a.pid, {"type": "new_room", "name": "hu", "n": 2})
    reg.dispatch(a.pid, {"type": "join_room", "name": "hu"})
    reg.dispatch(b.pid, {"type": "join_room", "name": "hu"})
    room = reg.rooms["hu"]
    assert type(room.engine).__name__ == "JaxBackend"
    reg.dispatch(b.pid, {"type": "play", "name": "hu", "amt": -1})
    assert room.engine.info()["hand_idx"] == 1
    assert reg.stacks[a.pid] + reg.stacks[b.pid] == 200 - 15


def test_action_timeout_failure_policy():
    # Failure detection (absent in the reference, which deadlocks on a
    # dropped client): rooms created with "timeout" auto-fold stalled heads.
    import time as _time

    reg = Registry()
    a, b = Client(reg), Client(reg)
    reg.dispatch(a.pid, {"type": "new_room", "name": "t", "n": 2, "timeout": 30})
    reg.dispatch(a.pid, {"type": "join_room", "name": "t"})
    reg.dispatch(b.pid, {"type": "join_room", "name": "t"})
    room = reg.rooms["t"]
    assert room.action_timeout == 30

    reg.tick(now=room._last_progress + 10)   # not yet
    assert room.engine.info()["time"] == 0
    reg.tick(now=room._last_progress + 31)   # b (head) is auto-folded
    assert room.engine.info()["hand_idx"] == 1  # hand ended, next dealt

    # Garbage timeout values are ignored.
    reg.dispatch(a.pid, {"type": "new_room", "name": "t2", "n": 2,
                         "timeout": "soon"})
    assert reg.rooms["t2"].action_timeout is None


def test_many_rooms_and_interleaved_clients():
    # Robustness: several concurrent rooms with shared players, interleaved
    # actions, full hands rolling over — chips conserved globally (native
    # backend, standard accounting doesn't apply: reference rules may mint
    # via n-inflation, so assert structural invariants instead).
    import random as _random

    rng = _random.Random(77)
    reg = Registry()
    clients = [Client(reg) for _ in range(9)]
    # Three 3-player rooms with overlapping membership patterns.
    for r, owner in zip("abc", clients[:3]):
        reg.dispatch(owner.pid, {"type": "new_room", "name": r, "n": 3})
    for i, cl in enumerate(clients):
        reg.dispatch(cl.pid, {"type": "join_room", "name": "abc"[i % 3]})
    for r in "abc":
        assert reg.rooms[r].started

    # 300 interleaved random actions from random clients to random rooms.
    for _ in range(300):
        cl = rng.choice(clients)
        room = rng.choice("abc")
        amt = rng.choice([-1, 0, 0, 0, 3, 10, 500])
        reg.dispatch(cl.pid, {"type": "play", "name": room, "amt": amt})

    for r in "abc":
        room = reg.rooms[r]
        assert room.engine.info()["hand_idx"] >= 0
        # Queries still answer coherently.
        seat0 = room.seats[0]
        reg.dispatch(seat0, {"type": "hand", "name": r})
        sink = [m for m in clients if m.pid == seat0][0].msgs
        assert "hand" in sink[-1] and len(sink[-1]["hand"]) == 2
    # Every stack is an int and the registry stayed consistent.
    assert all(isinstance(v, int) for v in reg.stacks.values())


def test_tcp_timeout_sweeper_auto_folds():
    async def scenario():
        server, reg = await start_server(host="127.0.0.1", port=0)
        port = server.sockets[0].getsockname()[1]

        async def client():
            return await asyncio.open_connection("127.0.0.1", port)

        async def send(w, obj):
            w.write((json.dumps(obj) + "\r\n").encode())
            await w.drain()

        r1, w1 = await client()
        r2, w2 = await client()
        await send(w1, {"type": "new_room", "name": "t", "n": 2,
                        "timeout": 1})
        await send(w1, {"type": "join_room", "name": "t"})
        await send(w2, {"type": "join_room", "name": "t"})
        # Nobody acts; within ~2s the sweeper must auto-fold the head and
        # the hand rolls into the next deal.
        for _ in range(20):
            await asyncio.sleep(0.2)
            if reg.rooms["t"].started and \
                    reg.rooms["t"].engine.info()["hand_idx"] >= 1:
                break
        assert reg.rooms["t"].engine.info()["hand_idx"] >= 1
        for w in (w1, w2):
            w.close()
        server.close()
        await server.wait_closed()

    asyncio.run(scenario())


def test_malformed_requests_do_not_crash():
    reg = Registry()
    a = Client(reg)
    reg.dispatch(a.pid, {"type": "new_room", "name": "x", "n": 2,
                         "blinds": 5})
    assert a.msgs[-1] == {"status": -12, "msg": "Blinds must be positive integers"}
    reg.dispatch(a.pid, {"type": "new_room", "name": ["weird"], "n": 2})
    assert a.msgs[-1] == {"status": -5, "msg": "empty room name."}
    reg.dispatch(a.pid, {"type": "join_room", "name": {"a": 1}})
    assert a.msgs[-1]["status"] in (-1, -2)
    reg.dispatch(a.pid, {"type": "play", "name": None, "amt": "ten"})
    reg.dispatch(a.pid, {"type": "hand", "name": 7})
    assert a.msgs[-1]["status"] == -1
    # Registry still serves subsequent valid traffic.
    reg.dispatch(a.pid, {"type": "whoami"})
    assert a.msgs[-1] == a.pid


@pytest.mark.parametrize("backend", ["jax", "native"])
def test_cross_room_global_stacks_identical_wire(backend):
    """Global per-player stacks (database.clj:8-12) across two rooms: a
    stack change in room A must be visible to room B's live hand — on BOTH
    backends, with identical wire-level outcomes.

    The script is fold-only, so every status code, bet layer, and stack in
    the broadcast boards is card-independent; the transcripts (minus the
    private card messages and gensym ids) must match exactly between the
    jax and native engines. Regression for the NativeBackend.set_stacks
    no-op divergence.
    """
    from montecarlo_tpu import native

    if backend == "native" and not native.available():
        pytest.skip("native library not built")

    def run(kind):
        reg = Registry(backend=kind)
        p, q = Client(reg), Client(reg)
        script = [
            (p, {"type": "new_room", "name": "a", "n": 2}),
            (p, {"type": "join_room", "name": "a"}),
            (q, {"type": "join_room", "name": "a"}),
            (p, {"type": "new_room", "name": "b", "n": 2}),
            (p, {"type": "join_room", "name": "b"}),
            (q, {"type": "join_room", "name": "b"}),
            # Room a: head folds -> blinds move, registry stacks change.
            (q, {"type": "play", "name": "a", "amt": -1}),
            (p, {"type": "play", "name": "a", "amt": -1}),
            # Room b: next action must see the updated global stacks.
            (q, {"type": "play", "name": "b", "amt": 0}),
            (p, {"type": "play", "name": "b", "amt": 0}),
        ]
        for cl, msg in script:
            reg.dispatch(cl.pid, msg)
        rename = {p.pid: "P", q.pid: "Q"}

        def scrub(m):
            if not isinstance(m, dict) or "card" in m:
                return None  # decks differ across backends; drop privates
            if "community-cards" in m:  # likewise the dealt board
                m = {k: v for k, v in m.items() if k != "community-cards"}
            s = json.dumps(m, sort_keys=True)
            for pid, tag in rename.items():
                s = s.replace(pid, tag)
            return s

        wire = [scrub(m) for cl in (p, q) for m in cl.msgs]
        stacks = {rename[k]: v for k, v in reg.stacks.items()}
        room_b = reg.rooms["b"]
        board_b = room_b.engine.board_json([
            room_b.seats[i] if False else pid for i, pid in
            enumerate(room_b.seats)])
        live_stacks_b = sorted(pl["stack"] for pl in board_b["players"])
        return [w for w in wire if w is not None], stacks, live_stacks_b

    wire_j, stacks_j, live_j = run("jax")
    wire_n, stacks_n, live_n = run(backend)
    assert stacks_j == stacks_n
    assert wire_j == wire_n
    # Room b's LIVE engine shows the globally-synced stacks (not the
    # 100-chip snapshot it was created with).
    assert live_j == live_n


def test_new_room_rules_validation():
    reg, (a, b, c) = make3()
    reg.dispatch(a.pid, {"type": "new_room", "name": "r", "n": 2,
                         "rules": "calvinball"})
    assert a.msgs[-1] == {
        "status": -5,
        "msg": 'rules must be "reference", "standard" or "tournament"'}
    reg.dispatch(a.pid, {"type": "new_room", "name": "r", "n": 2,
                         "rules": "standard"})
    assert a.msgs[-1] == {"status": 0, "msg": "OK"}


def test_standard_rules_room_conserves_chips():
    # Standard/tournament rooms always run on the device engine (the C++
    # table implements reference semantics only).
    reg = Registry()
    a, b = Client(reg), Client(reg)
    reg.dispatch(a.pid, {"type": "new_room", "name": "s", "n": 2,
                         "rules": "standard"})
    reg.dispatch(a.pid, {"type": "join_room", "name": "s"})
    reg.dispatch(b.pid, {"type": "join_room", "name": "s"})
    room = reg.rooms["s"]
    assert type(room.engine).__name__ == "JaxBackend"
    assert room.engine.rules == "standard"
    for _ in range(4):  # four folds = four settled hands
        head = room.head_pid()
        assert head is not None
        reg.dispatch(head, {"type": "play", "name": "s", "amt": -1})
    assert room.engine.info()["hand_idx"] == 4
    # Real accounting: global stacks + the fresh hand's posted blinds
    # account for exactly the 200 table chips (standard rules conserve;
    # reference rules could have minted via n-inflation here).
    assert reg.stacks[a.pid] + reg.stacks[b.pid] == 200 - 15


def test_tournament_room_freezes_when_won():
    reg = Registry()
    a, b = Client(reg), Client(reg)
    reg.dispatch(a.pid, {"type": "new_room", "name": "t", "n": 2,
                         "rules": "tournament",
                         "blinds": {"small": 25, "big": 50}})
    reg.dispatch(a.pid, {"type": "join_room", "name": "t"})
    reg.dispatch(b.pid, {"type": "join_room", "name": "t"})
    room = reg.rooms["t"]
    # Jam every decision until somebody holds all 200 chips.
    for _ in range(200):
        head = room.head_pid()
        if head is None:
            break
        reg.dispatch(head, {"type": "play", "name": "t", "amt": 500})
    stacks = sorted(reg.stacks[p] for p in (a.pid, b.pid))
    assert stacks == [0, 200], stacks
    # Frozen: no head to act, further plays are silent no-ops.
    assert room.head_pid() is None
    t0 = room.engine.info()["time"]
    reg.dispatch(a.pid, {"type": "play", "name": "t", "amt": 0})
    reg.dispatch(b.pid, {"type": "play", "name": "t", "amt": 0})
    assert room.engine.info()["time"] == t0
    assert bool(room.engine.state.hand_over)


def test_bots_validation():
    reg, (a, b, c) = make3()
    reg.dispatch(a.pid, {"type": "new_room", "name": "r", "n": 2,
                         "bots": 2})
    assert a.msgs[-1] == {"status": -5,
                          "msg": "bots must be an integer in [0, n)"}
    reg.dispatch(a.pid, {"type": "new_room", "name": "r", "n": 2,
                         "bots": 1, "bot_policy": "nope"})
    assert a.msgs[-1]["status"] == -5
    assert "unknown bot_policy" in a.msgs[-1]["msg"]
    assert "r" not in reg.rooms


def test_heads_up_vs_uniform_bot():
    """A 2-seat room with one house bot plays whole hands against a
    single client: the bot acts whenever it is head (including preflop
    right after the deal), so after every dispatch the action is back on
    the human (or the hand rolled)."""
    reg = Registry()
    a = Client(reg)
    reg.dispatch(a.pid, {"type": "new_room", "name": "r", "n": 2,
                         "bots": 1, "bot_policy": "uniform"})
    assert a.msgs[-1] == {"status": 0, "msg": "OK"}
    reg.dispatch(a.pid, {"type": "join_room", "name": "r"})
    room = reg.rooms["r"]
    assert room.started and len(room.bots) == 1
    for _ in range(60):
        assert room.head_pid() == a.pid  # never blocked on the bot
        reg.dispatch(a.pid, {"type": "play", "name": "r", "amt": 0})
    assert room.engine.info()["hand_idx"] >= 3  # whole hands completed
    # The human heard every deal: 2 hole cards per hand index reached.
    cards = [m for m in a.msgs if isinstance(m, dict) and "card" in m]
    assert len(cards) == 2 * (room.engine.info()["hand_idx"] + 1)


def test_six_max_vs_trained_bots():
    """Five house bots on the default 6-max artifact vs one client; the
    room runs the device engine and play always returns to the human."""
    reg = Registry()
    a = Client(reg)
    reg.dispatch(a.pid, {"type": "new_room", "name": "r", "n": 6,
                         "bots": 5})
    assert a.msgs[-1] == {"status": 0, "msg": "OK"}
    reg.dispatch(a.pid, {"type": "join_room", "name": "r"})
    room = reg.rooms["r"]
    assert room.started
    from montecarlo_tpu.server.backends import JaxBackend

    assert isinstance(room.engine, JaxBackend)  # bot rooms force jax
    t0 = room.engine.info()["time"]
    for _ in range(12):
        assert room.head_pid() == a.pid
        reg.dispatch(a.pid, {"type": "play", "name": "r", "amt": 0})
    assert room.engine.info()["time"] > t0 + 12  # bots acted in between
