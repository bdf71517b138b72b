"""Test-only oracle: a literal Python transcription of the reference's game
semantics (bet.clj / board.clj / gameplay.clj), using plain lists and sets.

This is NOT the product engine — it exists so property tests can drive the
fixed-shape array engine and this direct transcription through identical
random games and demand identical state trajectories. Where the reference
crashes (empty-winner pots, zero-in-hand showdowns), the oracle mirrors the
engine's documented divergence (pay nobody).

Player identity here is the *hand-order index* 0..n-1 (the array engine's
seat mapping is applied by the test harness).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, Optional, Set

from montecarlo_tpu.ops.ref_evaluator import ref_eval_best


@dataclass
class OBet:
    amount: int
    players: Set[int]
    orig: Set[int]
    n: int


def update_bets(bets: List[OBet], amt: int, p: int) -> List[OBet]:
    # bet.clj:45-59
    out: List[OBet] = []
    rest = list(bets)
    bet = amt
    while rest:
        standing = rest[0]
        if bet < standing.amount:
            out.append(OBet(bet, standing.players | {p}, standing.orig | {p},
                            standing.n + 1))
            out.append(OBet(standing.amount - bet, set(standing.players),
                            set(standing.orig), standing.n))
            return out + rest[1:]
        if bet == standing.amount:
            out.append(OBet(standing.amount, standing.players | {p},
                            standing.orig | {p}, standing.n + 1))
            return out + rest[1:]
        out.append(OBet(standing.amount, standing.players | {p},
                        standing.orig | {p}, standing.n + 1))
        bet -= standing.amount
        rest = rest[1:]
    out.append(OBet(bet, {p}, {p}, 1))
    return out


def merge_bets(bets: List[OBet]) -> List[OBet]:
    # bet.clj:10-27 — adjacent coalesce; the later layer's n wins.
    out: List[OBet] = []
    for b in bets:
        if out and out[-1].players == b.players and out[-1].orig == b.orig:
            out[-1] = OBet(out[-1].amount + b.amount, set(b.players),
                           set(b.orig), b.n)
        else:
            out.append(OBet(b.amount, set(b.players), set(b.orig), b.n))
    return out


@dataclass
class OracleGame:
    n: int
    small: int
    big: int
    deck: List[int]                 # injected permutation of 0..51
    stacks: List[int] = None        # by hand-order index
    community: List[int] = field(default_factory=list)
    n_revealed: int = 0
    bets: List[OBet] = field(default_factory=list)
    pots: List[OBet] = field(default_factory=list)
    in_hand: Set[int] = None        # reference :players
    remaining: Set[int] = None      # reference :remaining-players
    order: List[int] = None         # current play-order base list
    cursor: int = 0
    stage: int = 0
    time: int = 0
    over: bool = False
    hole: List[List[int]] = None

    def __post_init__(self):
        n = self.n
        if self.stacks is None:
            self.stacks = [100] * n
        self.in_hand = set(range(n))
        self.remaining = set(range(n))
        self.order = list(range(n))
        # deal-hand: position j gets deck[j], deck[n + j]
        self.hole = [[self.deck[j], self.deck[n + j]] for j in range(n)]
        base = 2 * n
        self.community = [self.deck[base + 1], self.deck[base + 2],
                          self.deck[base + 3], self.deck[base + 5],
                          self.deck[base + 7]]
        # play-blinds
        self.stacks[0] -= self.small
        self.bets = update_bets(self.bets, self.small, 0)
        self.stacks[1] -= self.big
        self.bets = update_bets(self.bets, self.big, 1)
        self.cursor = 2 % n

    # --- play-order (lazy filtered cycle) as list+pointer -----------------
    def head(self) -> Optional[int]:
        if not self.order:
            return None
        return self.order[self.cursor % len(self.order)]

    def _order_rest(self):
        self.cursor = (self.cursor % len(self.order)) + 1

    def _order_remove(self, p: int):
        j = self.cursor % len(self.order)
        assert self.order[j] == p  # only the head ever folds
        self.order.pop(j)
        self.cursor = j  # the element after the removed one is now at j

    # --- helpers -----------------------------------------------------------
    def total_bet(self) -> int:
        return sum(b.amount for b in self.bets)

    def needed(self, p: int) -> int:
        return sum(b.amount for b in self.bets if p not in b.players)

    def clamp(self, action: int) -> int:
        # player.clj:28-32 validation
        if action <= 0:
            return action
        p = self.head()
        return max(0, min(action, self.stacks[p] - self.needed(p)))

    # --- actions (board.clj:31-97) ------------------------------------------
    def act(self, action: int):
        assert not self.over
        p = self.head()
        self.time += 1
        if action < 0:  # fold
            self.bets = merge_bets([
                OBet(b.amount, b.players - {p}, set(b.orig), b.n)
                for b in self.bets])
            self.remaining.discard(p)
            self._order_remove(p)
            self.in_hand.discard(p)
        elif action == 0:  # call / check
            amt = self.total_bet()
            if amt > 0:
                delta = self.needed(p)
                if delta == self.stacks[p]:
                    self.in_hand.discard(p)  # all-in on exact equality
                self.stacks[p] -= delta
                self.bets = update_bets(self.bets, amt, p)
            else:
                self.bets = merge_bets(self.bets)
            self._order_rest()
            self.remaining.discard(p)
        else:  # raise by r
            r = action
            delta = self.needed(p)
            if delta + r == self.stacks[p]:
                self.in_hand.discard(p)
                self.stacks[p] = 0
            else:
                self.stacks[p] -= delta + r
            self.bets = update_bets(self.bets, r + self.total_bet(), p)
            self._order_rest()
            self.remaining = set(self.in_hand) - {p}

        if self.game_end():
            self.over = True
        elif self.stage_end():
            self.stage_transition()

    def stage_end(self) -> bool:
        return not self.remaining

    def game_end(self) -> bool:
        return len(self.in_hand) <= 1 or (self.stage_end() and self.stage == 3)

    def stage_transition(self):
        # gameplay.clj:94-102
        self.n_revealed += 3 if self.stage == 0 else 1
        self.remaining = set(self.in_hand)
        self.pots = self.pots + self.bets
        self.bets = []
        self.order = [p for p in range(self.n) if p in self.in_hand]
        self.cursor = 0
        self.stage += 1

    def settle(self):
        # gameplay.clj:104-133 (divergence: empty-winner pots pay nobody)
        self.pots = self.pots + self.bets
        self.bets = []
        values = {p: ref_eval_best(self.hole[p] + self.community)
                  for p in range(self.n)}
        for pot in self.pots:
            elig = [p for p in pot.players if p in self.in_hand]
            if not elig:
                continue
            best = max(values[p] for p in elig)
            winners = [p for p in elig if values[p] == best]
            share = (pot.amount * pot.n) // len(winners)
            for p in winners:
                self.stacks[p] += share

    # --- snapshot for trajectory comparison ---------------------------------
    def snapshot(self):
        return {
            "bets": [(b.amount, frozenset(b.players), frozenset(b.orig), b.n)
                     for b in self.bets],
            "pots": [(b.amount, frozenset(b.players), frozenset(b.orig), b.n)
                     for b in self.pots],
            "stacks": list(self.stacks),
            "in_hand": frozenset(self.in_hand),
            "remaining": frozenset(self.remaining),
            "stage": self.stage,
            "time": self.time,
            "n_revealed": self.n_revealed,
            "head": None if self.over else self.head(),
            "over": self.over,
        }
