"""Deliberate mid-stream kill, detected by driver-side flag.

The restart tests kill a stream on purpose after N micro-batches by
raising from inside foreachBatch. Detecting that kill by substring-
matching ``str(exc)`` is fragile: Py4J / StreamingQueryException may
wrap or truncate the root-cause message, turning an intentional stop
into a spurious test failure. foreachBatch functions execute ON THE
DRIVER, so the kill site can simply set a flag in shared driver state
before raising — ``await_or_stop`` then trusts the flag, not the
exception text (the exception class doesn't survive the JVM
round-trip either; the flag is the only channel that does).
"""

from __future__ import annotations


class DeliberateStop(RuntimeError):
    """Raised inside foreachBatch to kill a stream for a restart test."""


def request_stop(flag: dict) -> None:
    """Mark the kill as intentional, then raise. Call from foreachBatch."""
    flag["stop_requested"] = True
    raise DeliberateStop("deliberate mid-stream kill (restart test)")


def await_or_stop(query, flag: dict) -> None:
    """awaitTermination that swallows ONLY a flagged deliberate kill.

    Any exception without the driver-side flag set is a real stream
    failure and re-raises untouched.
    """
    try:
        query.awaitTermination()
    except Exception:
        if not flag.get("stop_requested"):
            raise
        query.stop()
