"""Cron / interval / once next-fire computation (SURVEY.md T10, CR2).

The reference delegates cron math to APScheduler/croniter
(automation_scheduler.py:233-334, read-not-copied). Neither library is
available here, so next-fire is a small pure-Python 5-field cron evaluator
(standard minute/hour/dom/month/dow semantics, including the POSIX
"dom OR dow when both are restricted" rule), wrapped as a pandas UDF so a
100k-row automations table computes next_execution in vectorized batches
instead of a driver loop.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

_FIELDS = (  # (min, max) per cron field
    (0, 59),  # minute
    (0, 23),  # hour
    (1, 31),  # day of month
    (1, 12),  # month
    (0, 6),  # day of week (0=Sunday)
)


_NAMES = {  # month / weekday names (Vixie cron, case-insensitive)
    "jan": "1", "feb": "2", "mar": "3", "apr": "4", "may": "5", "jun": "6",
    "jul": "7", "aug": "8", "sep": "9", "oct": "10", "nov": "11", "dec": "12",
    "sun": "0", "mon": "1", "tue": "2", "wed": "3", "thu": "4", "fri": "5",
    "sat": "6",
}


def _parse_field(spec: str, lo: int, hi: int, wrap_hi: int | None = None) -> set[int]:
    """Parse one cron field: '*', lists, ranges, steps ('*/5', '1-10/2'),
    names ('MON', 'JAN'). Vixie semantics for a bare value with a step:
    '5/15' means 5-max/15, not just 5. ``wrap_hi`` maps that value to ``lo``
    (dow 7 = Sunday = 0)."""
    out: set[int] = set()
    for part in spec.lower().split(","):
        for name, num in _NAMES.items():
            part = part.replace(name, num)
        step = 1
        has_step = "/" in part
        if has_step:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"cron step must be positive: {spec!r}")
        if part in ("*", ""):
            rng = range(lo, hi + 1)
        elif "-" in part:
            a, b = part.split("-", 1)
            rng = range(int(a), int(b) + 1)
        elif has_step:
            rng = range(int(part), hi + 1)  # Vixie: 'n/step' = 'n-max/step'
        else:
            rng = range(int(part), int(part) + 1)
        vals = (v for v in rng if (v - rng.start) % step == 0)
        for v in vals:
            if wrap_hi is not None and v == wrap_hi:
                v = lo
            if lo <= v <= hi:
                out.add(v)
    if not out:
        raise ValueError(f"empty cron field {spec!r}")
    return out


def parse_cron(expr: str) -> tuple[set[int], ...]:
    """Parse a 5-field cron expression (6-field accepted; seconds dropped,
    matching the reference's normalization of 6-field crons)."""
    fields = expr.split()
    if len(fields) == 6:
        fields = fields[1:]  # drop seconds
    if len(fields) != 5:
        raise ValueError(f"cron must have 5 (or 6) fields: {expr!r}")
    return tuple(
        # dow accepts 7 as an alias for Sunday (=0), like Vixie/croniter.
        _parse_field(f, lo, hi, wrap_hi=7 if (lo, hi) == (0, 6) else None)
        for f, (lo, hi) in zip(fields, _FIELDS)
    )


def cron_next(expr: str, after: datetime) -> datetime:
    """Next fire time strictly after ``after`` (UTC). Scans minute-by-minute
    with month/day skipping — bounded by 4 years (leap-day crons)."""
    minutes, hours, doms, months, dows = parse_cron(expr)
    # POSIX rule: if both dom and dow are restricted, match either.
    dom_star = doms == set(range(1, 32))
    dow_star = dows == set(range(0, 7))
    t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    limit = after + timedelta(days=4 * 366)
    while t <= limit:
        if t.month not in months:
            # jump to the 1st of the next month
            t = (t.replace(day=1) + timedelta(days=32)).replace(
                day=1, hour=0, minute=0
            )
            continue
        dom_ok = t.day in doms
        dow_ok = (t.isoweekday() % 7) in dows  # isoweekday: Mon=1..Sun=7 → Sun=0
        day_ok = (
            (dom_ok or dow_ok)
            if (not dom_star and not dow_star)
            else (dom_ok and dow_ok)
        )
        if not day_ok:
            t = (t + timedelta(days=1)).replace(hour=0, minute=0)
            continue
        if t.hour not in hours:
            t = (t + timedelta(hours=1)).replace(minute=0)
            continue
        if t.minute not in minutes:
            t += timedelta(minutes=1)
            continue
        return t
    raise ValueError(f"no fire time within 4 years for {expr!r}")


_INTERVAL_UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def next_execution(
    schedule_type: str, schedule_value: str, after: datetime
) -> datetime | None:
    """CR2: next_execution for one automation row. ``interval`` uses the
    reference's '^(\\d+)([smhd])$' grammar (automation_scheduler.py:273-318);
    ``once`` fires at its ISO datetime if still in the future. Invalid
    schedule values yield None (the scheduler must never die on one bad
    row), never an exception."""
    try:
        if schedule_type == "cron":
            return cron_next(schedule_value, after)
        if schedule_type == "interval":
            qty, unit = schedule_value[:-1], schedule_value[-1]
            if not qty.isdigit() or unit not in _INTERVAL_UNITS:
                return None
            return after + timedelta(seconds=int(qty) * _INTERVAL_UNITS[unit])
        if schedule_type == "once":
            ts = datetime.fromisoformat(schedule_value)
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=timezone.utc)
            return ts if ts > after else None
    except (ValueError, TypeError, IndexError):
        return None
    return None


def next_execution_udf(after: datetime):
    """Vectorized next-fire computation for the automations table.

    Returns a pandas UDF (Arrow-batched — one Python roundtrip per ~10k rows,
    not per row) computing next_execution from (schedule_type,
    schedule_value) columns. ``after`` is pinned by the caller so the result
    is deterministic/testable (the reference's datetime.now() is injected).
    """
    if after.tzinfo is None:
        after = after.replace(tzinfo=timezone.utc)

    @F.pandas_udf(TimestampType())
    def _next(stype: pd.Series, svalue: pd.Series) -> pd.Series:
        out = []
        for t, v in zip(stype, svalue):
            try:
                nxt = next_execution(t, v, after)
            except (ValueError, TypeError):
                nxt = None
            out.append(None if nxt is None else nxt.replace(tzinfo=None))
        return pd.Series(out, dtype="datetime64[us]")

    return _next
