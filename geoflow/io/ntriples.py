"""N-Triples source / sink — the reference's native ingest format.

The reference engine loads RDF models from Turtle/N-Triples files
(TripleStoreConnection.java:57-63 `RDFDataMgr.read(model, file)`) and
every pipeline starts from those triples; this module lets a reference
user point the Ray engine directly at an ``.nt`` dump instead of
pre-converting to parquet (SURVEY §2.1 engine-I/O row).

Scope: the W3C N-Triples grammar (one triple per line, ``<s> <p> o .``,
``#`` comments, blank lines) — the line-based subset is exactly what
makes the format embarrassingly parallel: ``ray.data.read_text`` shards
by file/byte-range and every line parses independently. Full Turtle
(prefixes, ``;``/``,`` continuations, multi-line literals) is NOT
parsed — convert with any off-the-shelf tool first; the error message
names the offending line.

Parse shape: one RE2 ``extract_regex`` classifies the whole line;
object sub-forms (IRI / blank node / literal with ``@lang`` or
``^^<datatype>``) classify with vectorized prefix tests. Literal
escape decoding has a vectorized fast path — rows with no backslash
(the overwhelming majority of real dumps) are zero-copy — and a
per-row fallback only for rows that actually contain ``\\`` escapes
(the engine's standard fast-path/slow-tail pattern,
cf. analysis.py short-doc fallback).

``triples_to_geoms`` completes the reference's load path: rows typed
``geo:wktLiteral`` become a WKB geometry column via the registered
``st_geomfromtext`` kernel, i.e. ``read_ntriples → triples_to_geoms``
reproduces "load model, extract geometry literals"
(GeometryWrapper parsing path, GeomFromText.java:18).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["parse_ntriples_batch", "read_ntriples", "triples_to_geoms",
           "write_ntriples", "WKT_LITERAL"]

WKT_LITERAL = "http://www.opengis.net/ont/geosparql#wktLiteral"

# one-pass line classifier: subject (IRI | bnode), predicate IRI,
# raw object tail (classified below), terminating dot
_LINE_RE = (r"^\s*(?:<(?P<s_iri>[^<>\s]*)>|(?P<s_bn>_:\S+))"
            r"\s+<(?P<p>[^<>\s]*)>"
            r"\s+(?P<o>.*\S)\s*\.\s*$")

# literal object: lexical form + optional @lang / ^^<datatype>
_LIT_RE = (r'^"(?P<lex>(?:[^"\\]|\\.)*)"'
           r"(?:\^\^<(?P<dt>[^<>\s]*)>|@(?P<lang>[A-Za-z0-9-]+))?$")

_ESCAPES = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
            '"': '"', "'": "'", "\\": "\\"}


def _unescape_one(s: str) -> str:
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        e = s[i + 1]
        if e in _ESCAPES:
            out.append(_ESCAPES[e])
            i += 2
        elif e == "u":
            out.append(chr(int(s[i + 2:i + 6], 16)))
            i += 6
        elif e == "U":
            out.append(chr(int(s[i + 2:i + 10], 16)))
            i += 10
        else:
            raise ValueError(f"bad N-Triples escape \\{e}")
    return "".join(out)


def parse_ntriples_batch(lines) -> pa.Table:
    """StringArray of raw lines → (s, p, o, o_kind, o_datatype, o_lang)
    table. Comment/blank lines are dropped; a non-matching non-comment
    line raises with its content (corrupt dump / full-Turtle input)."""
    s = pc.cast(lines, pa.string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(s)
    is_blank = pc.equal(pc.utf8_length(trimmed), 0)
    is_comment = pc.starts_with(trimmed, "#")
    body = trimmed.filter(pc.and_not(pc.invert(is_blank), is_comment))
    ex = pc.extract_regex(body, _LINE_RE)
    bad = pc.is_null(ex)
    if pc.any(bad).as_py():
        i = int(np.nonzero(bad.to_numpy(zero_copy_only=False))[0][0])
        raise ValueError(
            "not an N-Triples line (full Turtle is out of scope): "
            + body[i].as_py()[:200])
    s_iri = pc.struct_field(ex, "s_iri")
    s_bn = pc.struct_field(ex, "s_bn")
    # unmatched alternation groups extract as '' (not null): exactly one
    # of the two is non-empty (N-Triples requires absolute IRIs, so a
    # legitimate '<>' subject cannot occur)
    subj = pc.if_else(pc.equal(s_iri, ""), s_bn, s_iri)
    pred = pc.struct_field(ex, "p")
    obj = pc.struct_field(ex, "o")

    o_is_iri = pc.starts_with(obj, "<")
    o_is_bn = pc.starts_with(obj, "_:")
    lit = pc.extract_regex(obj, _LIT_RE)
    lit_bad = pc.and_(pc.is_null(lit),
                      pc.and_not(pc.invert(o_is_iri), o_is_bn))
    if pc.any(lit_bad).as_py():
        i = int(np.nonzero(lit_bad.to_numpy(zero_copy_only=False))[0][0])
        raise ValueError("bad N-Triples object term: "
                         + obj[i].as_py()[:200])
    lex = pc.struct_field(lit, "lex")
    # vectorized fast path: rows without a backslash need no decoding
    has_esc = pc.fill_null(
        pc.greater(pc.count_substring(lex, "\\"), 0), False)
    if pc.any(has_esc).as_py():
        idx = np.nonzero(has_esc.to_numpy(zero_copy_only=False))[0]
        lex_py = lex.to_pylist()
        for i in idx:
            lex_py[i] = _unescape_one(lex_py[i])
        lex = pa.array(lex_py, type=pa.string())

    o_val = pc.if_else(o_is_iri, pc.utf8_trim(obj, "<>"),
                       pc.if_else(o_is_bn, obj, pc.fill_null(lex, "")))
    o_kind = pc.if_else(o_is_iri, pa.scalar("iri"),
                        pc.if_else(o_is_bn, pa.scalar("bnode"),
                                   pa.scalar("literal")))
    return pa.table({
        "s": subj, "p": pred, "o": o_val, "o_kind": o_kind,
        "o_datatype": pc.fill_null(pc.struct_field(lit, "dt"), ""),
        "o_lang": pc.fill_null(pc.struct_field(lit, "lang"), ""),
    })


def read_ntriples(paths, **read_text_kwargs):
    """``ray.data.read_text`` over ``.nt`` file(s) → triple Dataset.
    File/byte-range sharding comes from read_text; parsing is a pure
    map_batches pass, so a 100-TB dump streams with backpressure."""
    import ray

    ds = ray.data.read_text(paths, **read_text_kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        return parse_ntriples_batch(batch.column("text"))

    return ds.map_batches(parse, batch_format="pyarrow")


def triples_to_geoms(triples_ds, wkt_datatype: str = WKT_LITERAL):
    """Rows whose object is a WKT geometry literal → (s, p, wkt,
    geom_wkb). The reference's model-load geometry path
    (GeometryWrapper WKT parse) as a Ray filter+parse stage."""

    def extract(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("o_datatype"), wkt_datatype)
        sel = batch.filter(mask)
        from ..ops import get_op
        wkb = get_op("st_geomfromtext").fn(sel.column("o"))
        return pa.table({"s": sel.column("s"), "p": sel.column("p"),
                         "wkt": sel.column("o"), "geom_wkb": wkb})

    return triples_ds.map_batches(extract, batch_format="pyarrow")


def _escape_literals(col) -> pa.Array:
    """Inverse of the parse-time unescape (backslash, quote, newline,
    CR, tab — the N-Triples canonical set); vectorized replace chain,
    order matters (backslash first)."""
    s = pc.cast(col, pa.string())
    for raw, esc in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")):
        s = pc.replace_substring(s, pattern=raw, replacement=esc)
    return s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s


def format_ntriples_batch(batch: pa.Table) -> pa.Array:
    """(s, p, o, o_kind, o_datatype, o_lang) rows → N-Triples line per
    row (inverse of parse_ntriples_batch; bit-stable round trip)."""
    j = pc.binary_join_element_wise
    s = pc.cast(batch.column("s"), pa.string())
    s_term = pc.if_else(pc.starts_with(s, "_:"), s,
                        j(pa.scalar("<"), s, pa.scalar(">"), ""))
    p_term = j(pa.scalar("<"), pc.cast(batch.column("p"), pa.string()),
               pa.scalar(">"), "")
    kind = batch.column("o_kind")
    o = pc.cast(batch.column("o"), pa.string())
    dt = pc.cast(batch.column("o_datatype"), pa.string())
    lang = pc.cast(batch.column("o_lang"), pa.string())
    lit = j(pa.scalar('"'), _escape_literals(o), pa.scalar('"'), "")
    lit = pc.if_else(
        pc.greater(pc.utf8_length(dt), 0),
        j(lit, pa.scalar("^^<"), dt, pa.scalar(">"), ""),
        pc.if_else(pc.greater(pc.utf8_length(lang), 0),
                   j(lit, pa.scalar("@"), lang, ""), lit))
    o_term = pc.if_else(pc.equal(kind, "iri"),
                        j(pa.scalar("<"), o, pa.scalar(">"), ""),
                        pc.if_else(pc.equal(kind, "bnode"), o, lit))
    return j(s_term, pa.scalar(" "), p_term, pa.scalar(" "), o_term,
             pa.scalar(" ."), "")


def write_ntriples(ds, path):
    """Write a triple Dataset as ``path/part-<hash>.nt`` — one file per
    block, written inside the map tasks (distributed), atomically
    (tmp+rename) and idempotently (content-hash filenames), matching
    the engine's resumable-output layout (io/geojson_sink.py)."""

    def write_block(batch: pa.Table) -> pa.Table:
        import hashlib
        import os
        lines = format_ntriples_batch(batch)
        data = "\n".join(lines.to_pylist()) + "\n" if batch.num_rows \
            else ""
        h = hashlib.blake2b(data.encode(), digest_size=8).hexdigest()
        os.makedirs(path, exist_ok=True)
        final = os.path.join(path, f"part-{h}.nt")
        if data and not os.path.exists(final):
            tmp = final + ".tmp"
            with open(tmp, "w") as f:
                f.write(data)
            os.replace(tmp, final)
        return pa.table({"file": pa.array([final]),
                         "rows": pa.array([batch.num_rows],
                                          type=pa.int64())})

    return ds.map_batches(write_block,
                          batch_format="pyarrow").take_all()
