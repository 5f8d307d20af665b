"""Consumer-to-partition assignment — the reference's rebalancing law.

The reference deterministically round-robins (token, rangeIndex) pairs
over the sorted consumer ids of a group
(internal/consuming/consumer_state.go:308-350): every broker computes
the same assignment with no coordination, consumers joining/leaving
trigger a debounced recompute, and a consumer polls only its assigned
ranges. Spark's scheduler owns task placement, so inside the engine
this matters only for the serving facade: which partitions a given
consumer id may poll.
"""

from __future__ import annotations


def assign_partitions(
    consumer_ids: list[str], num_partitions: int
) -> dict[str, list[int]]:
    """Deterministic round-robin of partitions over sorted consumers.

    Properties (mirroring consumer_state_test.go behavior):
    - every partition is owned by exactly one consumer;
    - |assignment| differs by at most 1 across consumers;
    - independent of input order (ids are sorted first);
    - more consumers than partitions → extras get nothing.
    """
    if not consumer_ids:
        return {}
    ordered = sorted(set(consumer_ids))
    out: dict[str, list[int]] = {c: [] for c in ordered}
    for p in range(num_partitions):
        out[ordered[p % len(ordered)]].append(p)
    return out
