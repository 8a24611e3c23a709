"""S4 — robots rules as a small broadcastable table.

The crawl normally derives rules from the deterministic generator
(functions/pagegen.robots_rules); this module gives the live-web shape:
a parquet table (host, prefix, allow) loaded once and broadcast via
ray.put, consumed by a RobotsTableFilter inside map_batches — the
small-side-lookup pattern (no shuffle). parse_robots_txt converts real
robots.txt bodies into the same rule rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..functions.robots import allowed, parse_robots_txt

ROBOTS_SCHEMA = pa.schema(
    [("host", pa.string()), ("prefix", pa.string()), ("allow", pa.bool_())]
)


def rules_from_bodies(bodies: dict[str, str]) -> pa.Table:
    """{host: robots.txt text} -> rules table."""
    hosts, prefixes, allows = [], [], []
    for host, text in bodies.items():
        for prefix, allow in parse_robots_txt(text):
            hosts.append(host)
            prefixes.append(prefix)
            allows.append(allow)
    return pa.Table.from_pydict(
        {"host": hosts, "prefix": prefixes, "allow": allows}, schema=ROBOTS_SCHEMA
    )


def write_rules(table: pa.Table, path: str) -> None:
    pq.write_table(table, path)


def load_rules(path: str) -> dict[str, list[tuple[str, bool]]]:
    """Rules table -> per-host rule dict (the broadcast payload)."""
    t = pads.dataset(path, format="parquet").to_table()
    out: dict[str, list[tuple[str, bool]]] = {}
    for host, prefix, allow in zip(
        t["host"].to_pylist(), t["prefix"].to_pylist(), t["allow"].to_pylist()
    ):
        out.setdefault(host, []).append((prefix, allow))
    return out


class RobotsTableFilter:
    """map_batches filter against a broadcast rules dict (J3 shape):
    ``ray.put(load_rules(path))`` once on the driver, pass the ref."""

    def __init__(self, rules_ref):
        self.rules_ref = rules_ref
        self._rules = None

    def __call__(self, t: pa.Table) -> pa.Table:
        import ray

        from ..functions.urlnorm import path_of

        if self._rules is None:
            self._rules = ray.get(self.rules_ref)
        mask = [
            allowed(path_of(u), self._rules.get(h, []))
            for u, h in zip(t["url"].to_pylist(), t["host"].to_pylist())
        ]
        return t.filter(pa.array(mask))
