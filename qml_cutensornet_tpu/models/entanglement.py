"""Entanglement-map generation (reference: main.py:21-45)."""

from __future__ import annotations


def entanglement_graph(nq: int, nn: int) -> list[tuple[int, int]]:
    """Linear-with-distance entanglement map.

    For each distance ``d`` in ``1..nn``, emits the pairs ``(i, i+d)`` in two
    sub-layers: first a greedy non-overlapping layer (skipping ``i`` already
    used as a right endpoint), then the remainder.

    Matches main.py:21-45 exactly. The reference iterates a Python ``set`` of
    small ints for the second sub-layer (main.py:41), which in CPython yields
    ascending order for these values; we make that explicit with ``sorted``.
    """
    emap: list[tuple[int, int]] = []
    for d in range(1, nn + 1):
        busy: set[int] = set()
        for i in range(nq):
            if i not in busy and i + d < nq:
                emap.append((i, i + d))
                busy.add(i + d)
        for i in sorted(busy):
            if i + d < nq:
                emap.append((i, i + d))
    return emap
