"""Robots Exclusion Protocol (RFC 9309) — the crawl-admission layer
of a web-corpus pipeline: per-host ``robots.txt`` bodies → rule
tables → vectorized allow/deny over a URL stream. The reference
engine has no equivalent (it consumes already-fetched corpora); the
public spec is RFC 9309 + the original 1994 REP.

Scale shape: robots bodies are the SMALL side (one per host —
millions of rows, not trillions), so rules are parsed once into a
compact Arrow/numpy structure, broadcast with ``ray.put``, and every
URL batch matches against it inside ``map_batches`` via the
per-worker-process cache (task-pool pattern, see vector/pq.py
``_cached_stage``) — no shuffle of the URL stream.

Semantics implemented (documented scope):
  * groups: consecutive ``User-agent:`` lines start a group; rules
    before any user-agent line are ignored (RFC 9309 §2.2.1);
  * group selection: case-insensitive EXACT product-token match,
    else the ``*`` group, else allow-all (RFC allows longest-prefix
    token matching; exact-token is the common-crawler behavior and is
    what this matcher does — documented divergence);
  * rule match: case-sensitive path-prefix; ``*`` matches any char
    run, ``$`` anchors the pattern end (Google/RFC 9309 §2.2.3);
  * precedence: most-specific match wins = longest PATTERN, allow
    wins length ties (RFC 9309 §2.2.2); no match → allowed;
  * empty ``Disallow:`` contributes no rule (1994 REP allow-all).

Matching is fully vectorized: plain-prefix rules via elementwise
``np.char.startswith`` after host-group expansion (one repeat +
reduceat per batch); wildcard rules (rare in real corpora) each run
one RE2 ``match_substring_regex`` over the URLs of that batch.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "parse_robots_batch",
    "RobotsMatcher",
    "build_matcher",
    "robots_filter_stage",
]

# directive line:  name ":" value   (comments stripped, ws trimmed)
_LINE_RE = (r"(?i)^[ \t]*(?P<name>user-agent|allow|disallow"
            r"|crawl-delay)"
            r"[ \t]*:[ \t]*(?P<value>[^#\r\n]*?)[ \t]*(?:#[^\r\n]*)?$")


def _directive_rows(batch: pa.Table, host_col: str, body_col: str):
    """Shared group-assembly scan: (host idx, agent, name, value) per
    non-user-agent directive, fanned out to every agent of its group
    (group id = cumsum of user-agent-run starts; directives before
    any group or with empty values are dropped; a group cannot span
    robots bodies). Returns (host StringArray, r_par, agents, names,
    values) numpy arrays — or None when nothing parsed."""
    host = pc.cast(batch.column(host_col), pa.string())
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    body = pc.cast(batch.column(body_col), pa.string())
    lines = pc.split_pattern_regex(body, pattern=r"\r?\n")
    flat = pc.list_flatten(lines)
    par = np.asarray(pc.list_parent_indices(lines))
    st = pc.extract_regex(flat, pattern=_LINE_RE)
    ok = np.asarray(pc.is_valid(st))
    if not ok.any():
        return None
    par = par[ok]
    name = np.asarray(pc.utf8_lower(pc.struct_field(st, "name"))
                      .filter(pa.array(ok)), dtype=object)
    value = np.asarray(pc.struct_field(st, "value")
                       .filter(pa.array(ok)), dtype=object)
    is_ua = name == "user-agent"
    # new group where a user-agent line follows a non-user-agent line
    # (or the stream/doc start)
    prev_ua = np.concatenate(([False], is_ua[:-1]))
    prev_par = np.concatenate(([-1], par[:-1]))
    ua_start = is_ua & (~prev_ua | (par != prev_par))
    gid = np.cumsum(ua_start) - 1          # -1 before any group
    in_group = gid >= 0
    # agents per group
    a_g = gid[is_ua & in_group]
    a_tok = value[is_ua & in_group]
    a_par = par[is_ua & in_group]
    # directives per group (drop empty values: REP allow-all)
    is_rule = ~is_ua & in_group & (value != "")
    r_g = gid[is_rule]
    r_name = name[is_rule]
    r_val = value[is_rule]
    r_par = par[is_rule]
    if len(r_g) == 0 or len(a_g) == 0:
        return None
    # fan directives out to every agent of their group: both sides
    # sorted by gid already (stream order); counts via searchsorted
    a_lo = np.searchsorted(a_g, r_g, side="left")
    a_hi = np.searchsorted(a_g, r_g, side="right")
    k = a_hi - a_lo                        # agents per rule's group
    idx = np.repeat(a_lo, k) + (
        np.arange(int(k.sum())) - np.repeat(np.cumsum(k) - k, k))
    ri = np.repeat(np.arange(len(r_g)), k)
    same = a_par[idx] == r_par[ri]
    idx, ri = idx[same], ri[same]
    agents = np.char.lower(a_tok[idx].astype(str)).astype(object)
    return host, r_par[ri], agents, r_name[ri], r_val[ri]


def parse_robots_batch(batch: pa.Table, host_col: str = "host",
                       body_col: str = "body") -> pa.Table:
    """(host, body) robots.txt batch → path-rule rows
    (host, agent, allow:bool, path); crawl-delay directives are
    surfaced by parse_crawl_delays instead."""
    got = _directive_rows(batch, host_col, body_col)
    if got is not None:
        host, r_par, agents, names, values = got
        m = (names == "allow") | (names == "disallow")
        if m.any():
            return pa.table({
                "host": pc.take(host, pa.array(r_par[m])),
                "agent": pa.array(agents[m].astype(str),
                                  pa.string()),
                "allow": pa.array(names[m] == "allow"),
                "path": pa.array(values[m].astype(str), pa.string()),
            })
    return pa.table({"host": pa.array([], pa.string()),
                     "agent": pa.array([], pa.string()),
                     "allow": pa.array([], pa.bool_()),
                     "path": pa.array([], pa.string())})


def parse_crawl_delays(batch: pa.Table, host_col: str = "host",
                       body_col: str = "body") -> pa.Table:
    """(host, body) batch → (host, agent, delay:double) rows from
    Crawl-delay directives (de-facto extension — not in RFC 9309 but
    honored by major crawlers). Unparseable numbers are dropped."""
    got = _directive_rows(batch, host_col, body_col)
    if got is not None:
        host, r_par, agents, names, values = got
        m = names == "crawl-delay"
        if m.any():
            raw = pa.array(values[m].astype(str), pa.string())
            # Arrow cast raises on any unparseable string — gate with
            # a numeric-shape regex first
            num = np.asarray(pc.match_substring_regex(
                raw, pattern=r"^\d+(\.\d+)?$"))
            if num.any():
                keepm = pa.array(num)
                v = pc.cast(raw.filter(keepm), pa.float64())
                return pa.table({
                    "host": pc.take(host, pa.array(r_par[m][num])),
                    "agent": pa.array(agents[m][num].astype(str),
                                      pa.string()),
                    "delay": v,
                })
    return pa.table({"host": pa.array([], pa.string()),
                     "agent": pa.array([], pa.string()),
                     "delay": pa.array([], pa.float64())})


def agent_delays(delays: pa.Table, agent: str) -> pa.Table:
    """Crawl-delay table → one (host, delay) row per host for
    `agent`: hosts with an exact-token group use ONLY its delay,
    others fall back to '*'; several delays in the applicable group
    keep the maximum (conservative)."""
    a = np.asarray(delays.column("agent"), dtype=object)
    hosts = np.asarray(delays.column("host"), dtype=object)
    d = np.asarray(delays.column("delay"), dtype=np.float64)
    tok = agent.lower()
    exact_hosts = set(hosts[a == tok].tolist())
    keep = (a == tok) | ((a == "*") &
                         ~np.isin(hosts, list(exact_hosts)))
    h, dl = hosts[keep], d[keep]
    order = np.argsort(h.astype(str), kind="stable")
    hs, ds_ = h[order], dl[order]
    first = np.r_[True, hs[1:] != hs[:-1]] if len(hs) else \
        np.zeros(0, dtype=bool)
    idx = np.flatnonzero(first)
    out_d = np.maximum.reduceat(ds_, idx) if len(idx) else ds_
    return pa.table({"host": pa.array(hs[idx].astype(str),
                                      pa.string()),
                     "delay": pa.array(out_d)})


def _wild_to_re2(pat: str) -> str:
    """REP pattern → anchored RE2: '*' → '.*', trailing '$' → '$'."""
    end = pat.endswith("$")
    core = pat[:-1] if end else pat
    rx = "".join(".*" if c == "*" else re.escape(c) for c in core)
    return "^" + rx + ("$" if end else "")


class RobotsMatcher:
    """Compiled rule set for ONE agent: per-host sorted plain-prefix
    rules (numpy arrays, searchsorted host ranges) + the (rare)
    wildcard rules each carrying a translated RE2. Picklable; built
    once per worker via the module cache."""

    def __init__(self, hosts, paths, allows):
        hosts = np.asarray(hosts, dtype=object)
        paths = np.asarray(paths, dtype=object)
        allows = np.asarray(allows, dtype=bool)
        wild = np.array([("*" in p or p.endswith("$")) for p in paths],
                        dtype=bool)
        order = np.argsort(hosts[~wild], kind="stable")
        self.p_host = hosts[~wild][order].astype(str)
        self.p_path = paths[~wild][order].astype(str)
        self.p_allow = allows[~wild][order]
        self.p_spec = np.char.str_len(self.p_path).astype(np.int64)
        self.w_host = hosts[wild].astype(str)
        self.w_re = [_wild_to_re2(p) for p in paths[wild]]
        self.w_allow = allows[wild]
        self.w_spec = np.array([len(p) for p in paths[wild]],
                               dtype=np.int64)

    def allowed(self, host: pa.Array, path: pa.Array) -> np.ndarray:
        """Vectorized RFC 9309 §2.2.2 precedence: per URL keep the
        matching rule with max (2*pattern_len + allow); no match →
        allowed."""
        h = np.asarray(pc.cast(host, pa.string()), dtype=str)
        p = np.asarray(pc.cast(path, pa.string()), dtype=str)
        n = len(h)
        best = np.full(n, -1, dtype=np.int64)   # score of best match
        if len(self.p_host):
            lo = np.searchsorted(self.p_host, h, side="left")
            hi = np.searchsorted(self.p_host, h, side="right")
            k = hi - lo
            tot = int(k.sum())
            if tot:
                ri = np.repeat(lo, k) + (
                    np.arange(tot) - np.repeat(np.cumsum(k) - k, k))
                ui = np.repeat(np.arange(n), k)
                m = np.char.startswith(p[ui], self.p_path[ri])
                score = np.where(
                    m, 2 * self.p_spec[ri] + self.p_allow[ri], -1)
                np.maximum.at(best, ui, score)
        if len(self.w_host):
            pa_path = pa.array(p, pa.string())
            for i, rx in enumerate(self.w_re):
                hm = h == self.w_host[i]
                if not hm.any():
                    continue
                m = np.asarray(pc.match_substring_regex(
                    pa_path, pattern=rx)) & hm
                score = np.where(
                    m, 2 * self.w_spec[i] + bool(self.w_allow[i]), -1)
                best = np.maximum(best, score)
        # best < 0 → no rule → allowed; else allow iff low bit set
        return (best < 0) | ((best & 1) == 1)


def build_matcher(rules: pa.Table, agent: str) -> RobotsMatcher:
    """Rule table (parse_robots_batch output, any host set) → matcher
    for `agent`: hosts with an exact-token group use ONLY it; others
    fall back to their '*' group (RFC 9309 §2.2.1: one group
    applies)."""
    a = np.asarray(rules.column("agent"), dtype=object)
    hosts = np.asarray(rules.column("host"), dtype=object)
    tok = agent.lower()
    exact_hosts = set(hosts[a == tok].tolist())
    keep = (a == tok) | ((a == "*") &
                         ~np.isin(hosts, list(exact_hosts)))
    return RobotsMatcher(hosts[keep],
                         np.asarray(rules.column("path"),
                                    dtype=object)[keep],
                         np.asarray(rules.column("allow"))[keep])


_ROBOTS_CACHE: dict = {}


def robots_filter_stage(rules_ref, agent: str, host_col="host",
                        path_col="path", out_col="allowed"):
    """map_batches task-pool stage: broadcast rules (ray.put'd parse
    output) → per-worker matcher build (module cache) → appends a
    bool `out_col`. Workers persist across tasks, so the ray.get +
    matcher build happens once per worker process."""
    def fn(batch: pa.Table) -> pa.Table:
        import ray
        key = (rules_ref.hex() if hasattr(rules_ref, "hex")
               else id(rules_ref), agent)
        m = _ROBOTS_CACHE.get(key)
        if m is None:
            rules = ray.get(rules_ref) if not isinstance(
                rules_ref, pa.Table) else rules_ref
            m = build_matcher(rules, agent)
            _ROBOTS_CACHE.clear()
            _ROBOTS_CACHE[key] = m
        ok = m.allowed(batch.column(host_col), batch.column(path_col))
        return batch.append_column(out_col, pa.array(ok))
    return fn
