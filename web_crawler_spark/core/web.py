"""The synthetic web: pure functions shared by fixture generator, oracle,
and the Spark engine (FIXTURES.md §1.2). Because the link graph is a pure
seeded function of the image index, the oracle and the engine derive the
identical graph with no stored adjacency table.
"""

from __future__ import annotations

import numpy as np


def out_degree(i: int) -> int:
    return (i * 7919 + 13) % 6


def out_links(i: int, n: int) -> list[int]:
    """Targets of image i in a corpus of n images (sorted, no self-loop)."""
    d = out_degree(i)
    t = sorted({(i * 17 + k * 101 + 7) % n for k in range(1, d + 1)} - {i})
    return t


def image_index(image_id: str) -> int:
    return int(image_id.rsplit("-", 1)[1])


def robots_allowed(path: str, disallow: list[str], allow: list[str] = ()) -> bool:
    """Longest-match Allow/Disallow selection (RFC 9309 §2.2.2, the
    behavior Google documents): the most specific matching rule decides;
    an Allow wins a length tie; no matching rule means allowed."""
    best_dis = max((len(p) for p in disallow if p and path.startswith(p)), default=-1)
    best_allow = max((len(p) for p in allow if p and path.startswith(p)), default=-1)
    return best_dis == -1 or best_allow >= best_dis
