"""Transformation-config fetch & merge (S11).

Reference: load_transformations (etl/ccdi/c3dc_etl.py:218-273) — fetch a
remote mapping JSON, filter to active transformations, merge remote
entries into the local study config by name (remote wins per-key).
Driver-side plan-time work: the merged config is the input to the
mapping compiler.
"""

from __future__ import annotations

import json
from urllib.parse import urlparse
from urllib.request import urlopen


def fetch_json(path_or_url: str, *, timeout: float = 30.0) -> object:
    """Load a JSON document from a local path, file://, or http(s)://
    URL (the reference's remote transformation/schema fetches)."""
    scheme = urlparse(path_or_url).scheme
    if scheme in ("http", "https", "file"):
        with urlopen(path_or_url, timeout=timeout) as resp:  # noqa: S310
            return json.loads(resp.read().decode("utf-8"))
    with open(path_or_url, encoding="utf-8") as f:
        return json.load(f)


def load_transformations(
    local: list[dict],
    remote: list[dict] | None = None,
    *,
    only_active: bool = True,
) -> list[dict]:
    """Merge remote transformation configs into local ones by ``name``
    (remote keys override local per transformation), then drop inactive
    entries. Mirrors etl/ccdi/c3dc_etl.py:243-267."""
    merged: dict[str, dict] = {t["name"]: dict(t) for t in local}
    for rt in remote or ():
        name = rt.get("name")
        if name in merged:
            merged[name].update(rt)
        else:
            merged[name] = dict(rt)
    out = list(merged.values())
    if only_active:
        out = [t for t in out if t.get("active", True)]
    return out
