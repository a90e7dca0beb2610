"""Driver-side iteration telemetry for the plan audit (round-5 advice
item 5b).

Operators that loop on the driver (connected components, hierarchy
frontier expansion, k-means, the MMR tournament) record how many
cluster rounds their last invocation used. ``tools/plan_audit.py``
resets the snapshot before building each registered query and flags
anything above ITERATION_BOUND afterwards — so a loop whose round count
silently starts tracking data size (instead of a configured constant or
an O(log n) contraction) fails the audit instead of melting a cluster.
"""

from __future__ import annotations

#: ceiling for any single operator's driver-round count per query build.
#: Generous vs every legitimate loop in the engine (hierarchy depth <=
#: 32, CC escalates to O(log n) star rounds after 5, k-means/MMR are
#: small constants) while far below data-tracking runaway.
ITERATION_BOUND = 64

import threading


class _ThreadLocalCounts(threading.local):
    """Per-thread counter dict: concurrent query builds (a threaded
    bench, a parallel audit) each see their own reset()/record()
    sequence instead of interleaving into one shared dict (round-6
    advice: module-global telemetry cross-contaminates the counts the
    audit gates on). The audit's reset -> build -> snapshot protocol is
    single-threaded per query, which is exactly the unit of isolation."""

    def __init__(self) -> None:
        self.last: dict[str, int] = {}


_TLS = _ThreadLocalCounts()


def record(op: str, rounds: int) -> None:
    """Record the driver-round count of ``op``'s latest invocation.
    Multiple invocations within one query keep the max (the audit cares
    about the worst loop, not the last)."""
    _TLS.last[op] = max(int(rounds), _TLS.last.get(op, 0))


def snapshot() -> dict[str, int]:
    return dict(_TLS.last)


def reset() -> None:
    _TLS.last.clear()
