"""Shared test helpers."""

from typing import List, Tuple


def layers_spec(layers, num_seats=23) -> List[Tuple]:
    """Layers -> [(amt, members, orig, n), ...] python view (bitmask sets)."""
    out = []
    for i in range(int(layers.count)):
        out.append((
            int(layers.amt[i]),
            frozenset(j for j in range(num_seats)
                      if (int(layers.mem[i]) >> j) & 1),
            frozenset(j for j in range(num_seats)
                      if (int(layers.orig[i]) >> j) & 1),
            int(layers.n[i]),
        ))
    return out


def fs(*xs):
    return frozenset(xs)
