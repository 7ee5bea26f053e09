"""Shared helpers for the streaming operators."""

from __future__ import annotations


def duration_ms(duration: str) -> int:
    """Milliseconds of a pandas-parseable duration string ("30
    minutes", "1 hour"). One definition for every streaming module —
    gap logic and window logic must agree on parsing."""
    import pandas as pd

    return int(pd.Timedelta(duration).total_seconds() * 1000)
