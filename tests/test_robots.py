"""Robots Exclusion Protocol — text/robots.py (RFC 9309)."""
import numpy as np
import pyarrow as pa

from geoflow.text.robots import (RobotsMatcher, build_matcher,
                                 parse_robots_batch,
                                 robots_filter_stage)


def _rules(bodies: dict) -> pa.Table:
    t = pa.table({"host": list(bodies), "body": list(bodies.values())})
    return parse_robots_batch(t)


def _allowed(rules, agent, pairs):
    m = build_matcher(rules, agent)
    h = pa.array([p[0] for p in pairs])
    p = pa.array([p[1] for p in pairs])
    return m.allowed(h, p).tolist()


class TestParse:
    def test_groups_comments_case(self):
        r = _rules({"a.com": (
            "# header comment\n"
            "User-Agent: FooBot\n"
            "Disallow: /f # inline comment\n"
            "\n"
            "user-agent: *\n"
            "ALLOW: /ok\n"
            "disallow: /no\n")})
        rows = sorted(zip(r.column("agent").to_pylist(),
                          r.column("allow").to_pylist(),
                          r.column("path").to_pylist()))
        assert rows == [("*", False, "/no"), ("*", True, "/ok"),
                        ("foobot", False, "/f")]

    def test_multi_agent_group_shares_rules(self):
        r = _rules({"a.com": (
            "User-agent: A\nUser-agent: B\nDisallow: /x\n")})
        assert sorted(r.column("agent").to_pylist()) == ["a", "b"]
        assert r.column("path").to_pylist() == ["/x", "/x"]

    def test_orphan_rules_and_empty_disallow_dropped(self):
        r = _rules({"a.com": (
            "Disallow: /orphan\n"         # before any group: ignored
            "User-agent: *\n"
            "Disallow:\n"                 # empty: allow-all, no rule
            "Disallow: /real\n")})
        assert r.column("path").to_pylist() == ["/real"]

    def test_groups_do_not_span_documents(self):
        # doc 1 ends with a UA group; doc 2 starts with bare rules —
        # those rules must NOT attach to doc 1's group
        r = _rules({"a.com": "User-agent: *\nDisallow: /a\n",
                    "b.com": "Disallow: /leak\nUser-agent: *\n"
                             "Disallow: /b\n"})
        got = sorted(zip(r.column("host").to_pylist(),
                         r.column("path").to_pylist()))
        assert got == [("a.com", "/a"), ("b.com", "/b")]

    def test_crlf_and_no_rules(self):
        r = _rules({"a.com": "User-agent: *\r\nDisallow: /w\r\n",
                    "b.com": "# only comments\n"})
        assert r.column("host").to_pylist() == ["a.com"]
        assert r.column("path").to_pylist() == ["/w"]


class TestMatch:
    BODY = ("User-agent: *\n"
            "Disallow: /p\n"
            "Allow: /p/ok\n"
            "Disallow: /p/ok/no\n")

    def test_longest_match_wins_allow_ties(self):
        r = _rules({"a.com": self.BODY})
        got = _allowed(r, "anybot", [
            ("a.com", "/p/x"),        # disallow /p
            ("a.com", "/p/ok/yes"),   # allow /p/ok beats /p
            ("a.com", "/p/ok/no/x"),  # deepest disallow wins
            ("a.com", "/free"),       # no rule → allowed
            ("other.com", "/p/x"),    # host without robots → allowed
        ])
        assert got == [False, True, False, True, True]

    def test_allow_wins_equal_length(self):
        r = _rules({"a.com": "User-agent: *\nDisallow: /same\n"
                             "Allow: /same\n"})
        assert _allowed(r, "x", [("a.com", "/same/p")]) == [True]

    def test_exact_agent_group_is_exclusive(self):
        r = _rules({"a.com": ("User-agent: *\nDisallow: /all\n\n"
                              "User-agent: FooBot\nDisallow: /foo\n")})
        # foobot: only its group — /all is NOT disallowed for it
        assert _allowed(r, "FooBot", [("a.com", "/all/x"),
                                      ("a.com", "/foo/x")]) == \
            [True, False]
        # other agents: '*' group
        assert _allowed(r, "Bar", [("a.com", "/all/x"),
                                   ("a.com", "/foo/x")]) == \
            [False, True]

    def test_wildcard_and_anchor(self):
        r = _rules({"a.com": ("User-agent: *\n"
                              "Disallow: /*.pdf$\n"
                              "Disallow: /tmp*x\n")})
        got = _allowed(r, "x", [
            ("a.com", "/doc/a.pdf"),      # $-anchored match
            ("a.com", "/doc/a.pdfx"),     # not at end → allowed
            ("a.com", "/tmp/zzz/x"),      # * spans path chars
            ("a.com", "/tmp/zzz/y"),      # no trailing x → allowed
        ])
        assert got == [False, True, False, True]

    def test_wildcard_specificity_is_pattern_length(self):
        # allow '/a/b' (len 4→9) vs disallow '/a/*c$' (len 6→12)
        r = _rules({"a.com": ("User-agent: *\nAllow: /a/b\n"
                              "Disallow: /a/*c$\n")})
        assert _allowed(r, "x", [("a.com", "/a/bc"),
                                 ("a.com", "/a/bd")]) == [False, True]

    def test_empty_rule_set_allows_everything(self):
        m = RobotsMatcher([], [], [])
        assert m.allowed(pa.array(["h"]), pa.array(["/p"])).tolist() \
            == [True]


class TestStage:
    def test_stage_over_dataset(self, ray_session):
        import ray
        import ray.data as rd
        rules = _rules({"a.com": "User-agent: *\nDisallow: /no\n"})
        stage = robots_filter_stage(ray.put(rules), "bot")
        ds = rd.from_arrow(pa.table({
            "host": ["a.com", "a.com", "b.com"],
            "path": ["/no/1", "/yes", "/no/1"]}))
        out = ds.map_batches(stage, batch_format="pyarrow").take_all()
        got = {(r["host"], r["path"]): r["allowed"] for r in out}
        assert got == {("a.com", "/no/1"): False,
                       ("a.com", "/yes"): True,
                       ("b.com", "/no/1"): True}


class TestScriptProfile:
    """script_profile_batch (text/analysis.py) — co-located here to
    keep the crawl-layer additions in one suite."""

    def test_counts_dominant_and_ties(self):
        import duckdb
        from geoflow.text.analysis import SCRIPTS, script_profile_batch
        t = pa.table({"doc_id": [0, 1, 2, 3],
                      "text": ["привет ab", "", "汉字 λλλ xx",
                               "ab дд"]})  # 2 latin vs 2 cyrillic: tie
        out = script_profile_batch(t)
        assert out.column("script").to_pylist() == \
            ["Cyrillic", "Latin", "Greek", "Latin"]  # tie → first
        assert out.column("n_letters").to_pylist() == [8, 0, 7, 4]
        # parity with DuckDB RE2 for every script class
        for name in SCRIPTS:
            got = out.column("n_" + name.lower()).to_pylist()
            exp = [r[0] for r in duckdb.sql(
                "SELECT len(regexp_extract_all(text, '\\p{%s}')) "
                "FROM t" % name).fetchall()]
            assert got == exp, name

    def test_frac_and_empty(self):
        from geoflow.text.analysis import script_profile_batch
        out = script_profile_batch(
            pa.table({"doc_id": [0], "text": ["汉汉汉λ"]}))
        assert out.column("script_frac").to_pylist() == [0.75]


class TestCrawlDelay:
    def test_parse_select_and_fallback(self):
        from geoflow.text.robots import agent_delays, parse_crawl_delays
        t = pa.table({"host": ["a.com", "b.com"], "body": [
            "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n\n"
            "User-agent: FastBot\nCrawl-delay: 0.5\n",
            "User-agent: *\nCrawl-delay: nope\nCrawl-delay: 3\n"
            "Crawl-delay: 7\n"]})
        d = parse_crawl_delays(t)
        # unparseable dropped; duplicates kept for the selector
        assert d.num_rows == 4
        fast = {r["host"]: r["delay"]
                for r in agent_delays(d, "FastBot").to_pylist()}
        assert fast == {"a.com": 0.5, "b.com": 7.0}  # max of dups
        other = {r["host"]: r["delay"]
                 for r in agent_delays(d, "Other").to_pylist()}
        assert other == {"a.com": 2.0, "b.com": 7.0}

    def test_no_delays(self):
        from geoflow.text.robots import parse_crawl_delays
        t = pa.table({"host": ["a.com"],
                      "body": ["User-agent: *\nDisallow: /x\n"]})
        out = parse_crawl_delays(t)
        assert out.num_rows == 0
        assert out.schema.names == ["host", "agent", "delay"]
