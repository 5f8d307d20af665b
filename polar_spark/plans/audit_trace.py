"""Pre-materialization plan trace for the scale audit.

A ``localCheckpoint`` severs lineage: the final plan shows an opaque
``Scan ExistingRDD`` where the checkpointed input's exchanges used to
be, so a plan audit that counts ``Exchange`` nodes UNDERCOUNTS the
query's true shuffle cost (VERDICT r6 "what's wrong" #1 — CATALOG.md
reported ``dedup_simhash`` at 1 shuffle while its signature build paid
3 more behind the checkpoint).

The fix is cooperative: every library site that checkpoints calls
:func:`note_materialization` with the DataFrame *as it is about to be
materialized*. Outside an audit this is a no-op (one ``is None`` check —
nothing is retained, no py4j traffic). Under ``tools/plan_audit.py`` the
audit wraps each query build in :func:`start_trace`/:func:`stop_trace`
and audits the pre-checkpoint plans too, reporting hidden exchanges per
query ("1 (+3 ckpt)") instead of trusting the post-checkpoint plan.

``persist()`` needs no trace: an InMemoryRelation prints its child plan,
so its exchanges stay visible to the audit (which is one reason
``simhash_pairs`` switched to persist in r7).
"""

from __future__ import annotations

_TRACE: list[tuple[str, object]] | None = None


def start_trace() -> None:
    """Begin collecting pre-materialization DataFrames (audit only)."""
    global _TRACE
    _TRACE = []


def stop_trace() -> list[tuple[str, object]]:
    """End collection; returns [(label, DataFrame), ...] in build order."""
    global _TRACE
    out, _TRACE = _TRACE or [], None
    return out


def note_materialization(df, label: str):
    """Record ``df``'s plan as about-to-be-materialized. Call this
    IMMEDIATELY before ``.localCheckpoint(...)`` on the same DataFrame.
    Returns ``df`` unchanged so it can be used inline::

        out = note_materialization(built, "op.stage").localCheckpoint()
    """
    if _TRACE is not None:
        _TRACE.append((label, df))
    return df
