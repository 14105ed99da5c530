"""Minimal 5-field cron matcher (no external deps).

Supports: ``*``, numbers, ranges ``a-b``, steps ``*/n`` & ``a-b/n``, and
comma lists — enough for the reference's declarative ``trigger: '1 * * * *'``
fields (`tests/configuration/test_config_editor.py:103`).
"""

from __future__ import annotations

from datetime import datetime, timedelta

_FIELD_RANGES = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]  # min hr dom mon dow


def _parse_field(field: str, lo: int, hi: int) -> set[int]:
    vals: set[int] = set()
    for part in field.split(","):
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part in ("*", ""):
            rng = range(lo, hi + 1)
        elif "-" in part:
            a, b = part.split("-", 1)
            rng = range(int(a), int(b) + 1)
        else:
            rng = range(int(part), int(part) + 1)
        vals.update(v for v in rng if (v - rng.start) % step == 0 and lo <= v <= hi)
    return vals


def parse_cron(expr: str) -> list[set[int]]:
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"invalid cron expression: {expr!r}")
    return [_parse_field(f, lo, hi) for f, (lo, hi) in zip(fields, _FIELD_RANGES)]


def cron_matches(expr: str, dt: datetime) -> bool:
    mi, hr, dom, mon, dow = parse_cron(expr)
    # cron day-of-week: 0=Sunday; python weekday(): 0=Monday
    return (
        dt.minute in mi
        and dt.hour in hr
        and dt.day in dom
        and dt.month in mon
        and ((dt.weekday() + 1) % 7) in dow
    )


def next_fire(expr: str, after: datetime, horizon_days: int = 366) -> datetime | None:
    """Next matching minute strictly after ``after`` (minute-scan; cron
    granularity is minutes so this is exact, and fast enough for a
    scheduler tick)."""
    t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
    end = after + timedelta(days=horizon_days)
    while t <= end:
        if cron_matches(expr, t):
            return t
        t += timedelta(minutes=1)
    return None
