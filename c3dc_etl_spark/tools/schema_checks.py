"""Schema-creator permissible-value checks (X6).

Reference schema/schema_creator.py: non-ASCII PV detection (:467-489),
duplicate PVs (:548-559), and '[---- section ----]' header rows filtered
out of PV lists (:106-107).
"""

from __future__ import annotations

from collections.abc import Iterable

SECTION_PREFIX = "[----"
SECTION_SUFFIX = "----]"


def non_ascii_pvs(pvs: Iterable[str]) -> list[tuple[str, list[str]]]:
    """PVs containing non-ASCII characters, with the offending chars —
    these break downstream matching and must be normalized."""
    out = []
    for pv in pvs:
        bad = sorted({c for c in pv if ord(c) > 127})
        if bad:
            out.append((pv, bad))
    return out


def duplicate_pvs(pvs: Iterable[str]) -> list[str]:
    """Case-insensitively duplicated PVs (first casing reported)."""
    seen: dict[str, str] = {}
    dupes: list[str] = []
    for pv in pvs:
        key = pv.casefold()
        if key in seen:
            if seen[key] not in dupes:
                dupes.append(seen[key])
        else:
            seen[key] = pv
    return dupes


def strip_section_headers(pvs: Iterable[str]) -> list[str]:
    """Drop '[---- ... ----]' section-header rows from a PV list."""
    return [
        pv
        for pv in pvs
        if not (pv.strip().startswith(SECTION_PREFIX) and pv.strip().endswith(SECTION_SUFFIX))
    ]
