"""robots.txt prefix matching (M5) — BASELINE.json:6 "enforcing robots.txt".

Rules are (prefix, allow) pairs per host; decision = rule with the
longest matching prefix, allow winning length ties (Google semantics).
No rules / no matching rule => allowed.
"""

from __future__ import annotations


def allowed(path: str, rules: list[tuple[str, bool]]) -> bool:
    best_len, best_allow = -1, True
    for prefix, allow in rules:
        if path.startswith(prefix):
            plen = len(prefix)
            if plen > best_len or (plen == best_len and allow):
                best_len, best_allow = plen, allow
    return best_allow


def parse_robots_txt(text: str) -> list[tuple[str, bool]]:
    """Parse a (simplified) robots.txt body for User-agent: * into
    (prefix, allow) rules — the live-web path of the S4 reader."""
    rules: list[tuple[str, bool]] = []
    active = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            active = val == "*"
        elif active and key in ("allow", "disallow") and val:
            rules.append((val, key == "allow"))
    return rules
