"""robots.txt parsing + matching (RFC 9309) — crawl-compliance filtering.

A real crawl pipeline must honor the Robots Exclusion Protocol before any
fetch; the reference engine (graph-only) never had this, but every crawler
feeding the link graph does. Implemented as the REAL generic algorithm:

- ``parse_robots(text)``: group-structured parse (consecutive User-agent
  lines open a group; Allow/Disallow rules attach to the open group;
  ``#`` comments and unknown fields skipped; field names case-insensitive).
- ``robots_allowed(groups, agent, path)``: RFC 9309 evaluation — the
  group for the crawler's product token (case-insensitive exact token,
  else the ``*`` group, else no rules), then LONGEST-match wins across the
  group's Allow+Disallow patterns with ``*`` wildcards and the ``$``
  end-anchor; equal-length tie -> Allow; no match / empty pattern -> Allow.

The filtering stage holds per-host parsed rule groups ONCE per actor
(broadcast via ``ray.put`` — the robots corpus for even a 10^7-host crawl
is a small side table) and evaluates urls per batch.

``synth_robots(h)`` generates the deterministic per-host fixture corpus the
oracle mirrors in closed form; the ENGINE path runs the generic parser and
matcher on the actual text.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa


def parse_robots(text: str) -> dict[str, list[tuple[bool, str]]]:
    """robots.txt -> {agent_token_lower: [(is_allow, pattern), ...]}.

    Group semantics per RFC 9309: a run of consecutive User-agent lines
    names the agents of ONE group; subsequent rule lines attach to all of
    them; a later User-agent line after rules starts a new group. Rules for
    an agent named by multiple groups concatenate."""
    groups: dict[str, list[tuple[bool, str]]] = {}
    open_agents: list[str] = []
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                open_agents = []
                in_agent_run = True
            tok = value.lower()
            open_agents.append(tok)
            groups.setdefault(tok, [])
        elif field in ("allow", "disallow"):
            in_agent_run = False
            for a in open_agents:
                groups[a].append((field == "allow", value))
        else:  # crawl-delay, sitemap, ... close the agent run, keep group
            in_agent_run = False
    return groups


def _pattern_re(pattern: str) -> re.Pattern:
    """Pattern -> anchored regex: ``*`` = any chars, trailing ``$`` = end
    anchor, everything else literal; match is from the path START."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return re.compile("^" + rx + ("$" if anchored else ""))


class CompiledRobots:
    """Per-host compiled rule set (compile once, match many paths)."""

    def __init__(self, groups: dict[str, list[tuple[bool, str]]]):
        self.compiled = {
            agent: [
                (is_allow, len(p), _pattern_re(p))
                for is_allow, p in rules
                if p  # an empty pattern matches nothing (RFC 9309)
            ]
            for agent, rules in groups.items()
        }

    def allowed(self, agent: str, path: str) -> bool:
        rules = self.compiled.get(agent.lower())
        if rules is None:
            rules = self.compiled.get("*")
        if not rules:
            return True  # no applicable group -> allowed
        best_len, best_allow = -1, True
        for is_allow, plen, rx in rules:
            if rx.match(path) and (
                plen > best_len or (plen == best_len and is_allow)
            ):
                best_len, best_allow = plen, is_allow
        return best_allow


def robots_allowed(groups, agent: str, path: str) -> bool:
    return CompiledRobots(groups).allowed(agent, path)


def synth_robots(h: int) -> str:
    """Deterministic per-host robots.txt fixture (the oracle mirrors the
    closed form; the engine parses THIS text with the generic parser):

    - every host: the ``*`` group disallows /d/ but allows doc paths
      ending in the host's own last digit (wildcard + $-anchor rules,
      longest-match beats the /d/ prefix disallow);
    - hosts with h % 3 == 0 additionally carry a ``raylinkbot`` group
      disallowing doc ids that start with '1' (group selection beats *).
    """
    lines = []
    if h % 3 == 0:
        lines += [
            "# per-bot override",
            "User-agent: RaylinkBot",
            "Disallow: /d/1",
            "",
        ]
    lines += [
        "User-agent: *",
        "Disallow: /d/",
        f"Allow: /d/*{h % 10}$",
        "Crawl-delay: 2",
    ]
    return "\n".join(lines) + "\n"


def robots_filter(pages_ds, agent: str = "raylinkbot",
                  robots_by_host: dict[int, str] | None = None):
    """pages (url[, ...]) -> (vid, host, allowed): per-host robots rules
    parsed + compiled once, broadcast via ``ray.put``, matched per batch.
    ``robots_by_host`` defaults to the synthetic fixture corpus."""
    import ray

    if robots_by_host is None:  # an explicit {} means "none fetched yet"
        robots_by_host = {
            h: synth_robots(h) for h in range(97)  # synth.url_of host modulus
        }
    compiled = {h: CompiledRobots(parse_robots(t))
                for h, t in robots_by_host.items()}
    ref = ray.put(compiled)

    def judge(batch: pa.Table) -> pa.Table:
        comp = ray.get(ref)
        urls = batch.column("url").to_pylist()
        vids, hosts, allowed = [], [], []
        for u in urls:
            # https://site{h}.example/d/{i}
            hostpart, _, path = u.partition(".example")
            h = int(hostpart.rsplit("site", 1)[1])
            i = int(path.rsplit("/", 1)[1])
            vids.append(i)
            hosts.append(h)
            c = comp.get(h)
            # a host with no robots.txt is allow-all (RFC 9309)
            allowed.append(c.allowed(agent, path) if c is not None else True)
        return pa.table(
            {
                "vid": pa.array(np.asarray(vids, dtype=np.int64)),
                "host": pa.array(np.asarray(hosts, dtype=np.int64)),
                "allowed": pa.array(allowed, type=pa.bool_()),
            }
        )

    return pages_ds.map_batches(judge, batch_format="pyarrow")
