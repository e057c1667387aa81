"""Property fuzz for the crawl-layer parsers: the vectorized
matchers/parsers must agree with tiny trusted brute-force references
written directly from the specs (RFC 9309 / sitemaps.org / RSS+Atom)
on randomized inputs."""
import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from geoflow.text.robots import build_matcher, parse_robots_batch
from geoflow.text.sitemap import parse_sitemap_batch

# ---------------------------------------------------------------- robots

_seg = st.sampled_from(["/a", "/b", "/ab", "/a/b", "/q", "/tmp"])
_rule = st.tuples(st.booleans(),           # allow?
                  st.sampled_from(["/a", "/ab", "/a/b", "/q",
                                   "/a*b", "/ab$", "/*b$", "/t*p"]))
_path = st.sampled_from(["/a", "/ab", "/abb", "/a/b", "/a/bb", "/q",
                         "/qq", "/tmp", "/tp", "/x", "/aXb"])


def _brute_allowed(rules, path):
    """Direct RFC 9309 §2.2.2/§2.2.3: most specific match = longest
    pattern; allow wins length ties; no match → allowed."""
    best = None
    for allow, pat in rules:
        anchored = pat.endswith("$")
        core = pat[:-1] if anchored else pat
        rx = "".join(".*" if c == "*" else re.escape(c) for c in core)
        rx = "^" + rx + ("$" if anchored else "")
        if re.match(rx, path):
            key = (len(pat), allow)
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


@settings(max_examples=120, deadline=None)
@given(st.lists(_rule, min_size=0, max_size=6), st.lists(_path,
                                                         min_size=1,
                                                         max_size=8))
def test_matcher_matches_spec_bruteforce(rules, paths):
    body = "User-agent: *\n" + "\n".join(
        ("Allow: " if a else "Disallow: ") + p for a, p in rules)
    parsed = parse_robots_batch(pa.table({"host": ["h"],
                                          "body": [body]}))
    m = build_matcher(parsed, "anybot")
    got = m.allowed(pa.array(["h"] * len(paths)), pa.array(paths))
    exp = [_brute_allowed(rules, p) for p in paths]
    assert got.tolist() == exp


# --------------------------------------------------------------- sitemap

_loc_txt = st.text(
    alphabet=st.sampled_from("abc019/._-&<>'\""), min_size=1,
    max_size=12)


def _esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;")
            .replace("'", "&apos;"))


@settings(max_examples=80, deadline=None)
@given(st.lists(st.tuples(_loc_txt, st.booleans(),
                          st.integers(0, 9)),
                min_size=0, max_size=6))
def test_sitemap_roundtrip_random_entries(entries):
    parts = ["<urlset>"]
    for loc, has_pri, pri in entries:
        e = f"<url><loc>{_esc('https://x/' + loc)}</loc>"
        if has_pri:
            e += f"<priority>0.{pri}</priority>"
        parts.append(e + "</url>")
    parts.append("</urlset>")
    out = parse_sitemap_batch(pa.table({
        "doc_id": [0], "xml": ["".join(parts)]}))
    rows = out.to_pylist()
    assert len(rows) == len(entries)
    for row, (loc, has_pri, pri) in zip(rows, entries):
        assert row["loc"] == "https://x/" + loc
        if has_pri:
            assert row["priority"] == float(f"0.{pri}")
        else:
            assert row["priority"] is None


# ----------------------------------------------------------------- feeds

@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_loc_txt, st.booleans()), min_size=0,
                max_size=5),
       st.booleans())
def test_feed_roundtrip_random_entries(entries, atom):
    from geoflow.text.feeds import parse_feed_batch
    parts = ["<feed>" if atom else "<rss><channel>"]
    for loc, has_title in entries:
        url = _esc("https://x/" + loc)
        if atom:
            e = f'<entry><link href="{url}"/>'
        else:
            e = f"<item><link>{url}</link>"
        if has_title:
            e += f"<title>{_esc('T ' + loc)}</title>"
        parts.append(e + ("</entry>" if atom else "</item>"))
    parts.append("</feed>" if atom else "</channel></rss>")
    out = parse_feed_batch(pa.table({
        "doc_id": [0], "xml": ["".join(parts)]})).to_pylist()
    assert len(out) == len(entries)
    for row, (loc, has_title) in zip(out, entries):
        assert row["link"] == "https://x/" + loc
        assert row["kind"] == ("atom" if atom else "rss")
        if has_title:
            assert row["title"] == "T " + loc
        else:
            assert row["title"] is None
