"""Shared test helpers."""

from typing import List, Tuple


def layers_spec(layers, num_seats=None) -> List[Tuple]:
    """Layers -> [(amt, members, orig, n), ...] python view."""
    P = num_seats or layers.mem.shape[1]
    out = []
    for i in range(int(layers.count)):
        out.append((
            int(layers.amt[i]),
            frozenset(j for j in range(P) if bool(layers.mem[i, j])),
            frozenset(j for j in range(P) if bool(layers.orig[i, j])),
            int(layers.n[i]),
        ))
    return out


def fs(*xs):
    return frozenset(xs)
