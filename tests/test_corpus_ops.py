"""Decontamination / sequence-packing / deterministic-sampling tests."""

import numpy as np
import pyarrow as pa
import pytest

from geoflow.ops.sampling import (hash_sample, sample_slot,
                                  sample_slot_sql, split_column,
                                  stratified_sample)
from geoflow.text import (contaminated_keys, decontaminate,
                          pack_sequences, token_ngram_hashes)


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_token_ngram_hashes_semantics():
    texts = pa.array([
        "alpha beta gamma delta",   # grams: ab g, b g d  (n=3: 2 windows)
        "alpha beta gamma",         # 1 window
        "alpha beta",               # < n tokens -> no grams
        "",                         # no grams
        "Alpha  BETA gamma!!",      # normalizes to same window as row 1
    ])
    g, doc = token_ngram_hashes(texts, n=3)
    assert list(doc) == [0, 0, 1, 4]
    # same token trigram -> same hash, regardless of case/punct/doc
    assert g[0] == g[2] == g[3]
    assert g[1] != g[0]


def test_token_ngram_no_cross_doc_windows():
    g1, _ = token_ngram_hashes(pa.array(["a b c", "d e f"]), n=3)
    g2, _ = token_ngram_hashes(pa.array(["a b c d e f"]), n=3)
    # concatenated doc has windows spanning the seam; split docs don't
    assert len(g1) == 2 and len(g2) == 4
    assert set(g1) < set(g2)


def _contamination_fixture():
    bench = pa.table({
        "doc_id": [1000, 1001],
        "text": ["the secret eval question about turtles",
                 "completely unrelated benchmark prompt text"],
    })
    corpus = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "clean document about distributed query engines",
            "i once read the secret eval question about something",  # 5-gram overlap
            "benchmark prompt text appears here",                     # 3-gram only
            "another clean doc mentioning turtles once",
        ],
    })
    return corpus, bench


def test_decontaminate_broadcast(ray_session):
    import ray
    corpus, bench = _contamination_fixture()
    out = decontaminate(ray.data.from_arrow(corpus),
                        ray.data.from_arrow(bench), n=5).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 3, 4]
    # tighter n=3 also catches doc 3
    out3 = decontaminate(ray.data.from_arrow(corpus),
                         ray.data.from_arrow(bench), n=3).take_all()
    assert sorted(r["doc_id"] for r in out3) == [1, 4]


def test_decontaminate_invert_and_keys(ray_session):
    import ray
    corpus, bench = _contamination_fixture()
    bad = decontaminate(ray.data.from_arrow(corpus),
                        ray.data.from_arrow(bench), n=5,
                        invert=True).take_all()
    assert [r["doc_id"] for r in bad] == [2]
    keys = contaminated_keys(ray.data.from_arrow(corpus),
                             ray.data.from_arrow(bench), n=5).take_all()
    assert [r["doc_id"] for r in keys] == [2]


def test_decontaminate_join_mode_equivalence(ray_session):
    import ray
    corpus, bench = _contamination_fixture()
    for n in (3, 5):
        kb = sorted(r["doc_id"] for r in contaminated_keys(
            ray.data.from_arrow(corpus), ray.data.from_arrow(bench),
            n=n).take_all())
        kj = sorted(r["doc_id"] for r in contaminated_keys(
            ray.data.from_arrow(corpus), ray.data.from_arrow(bench),
            n=n, mode="join").take_all())
        assert kb == kj
        sb = sorted(r["doc_id"] for r in decontaminate(
            ray.data.from_arrow(corpus), ray.data.from_arrow(bench),
            n=n).take_all())
        sj = sorted(r["doc_id"] for r in decontaminate(
            ray.data.from_arrow(corpus), ray.data.from_arrow(bench),
            n=n, mode="join").take_all())
        assert sb == sj


def test_decontaminate_empty_benchmark(ray_session):
    import ray
    corpus, _ = _contamination_fixture()
    bench = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "text": pa.array([], type=pa.string())})
    out = decontaminate(ray.data.from_arrow(corpus),
                        ray.data.from_arrow(bench), n=3).take_all()
    assert len(out) == corpus.num_rows


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def _pack_reference(keys, ntoks, seq_len, bucket_docs):
    """Brute-force per-bucket packing oracle."""
    rows = sorted(zip(keys, ntoks))
    out = {}
    offsets = {}
    for k, nt in rows:
        b = k // bucket_docs
        start = offsets.get(b, 0)
        end = start + nt
        sf = start // seq_len
        sl = sf if nt == 0 else (end - 1) // seq_len
        out[k] = (b * (1 << 32) + sf, b * (1 << 32) + sl)
        offsets[b] = end
    return out


def test_pack_sequences_matches_reference(ray_session):
    import ray
    rng = np.random.default_rng(7)
    keys = rng.permutation(200).astype(np.int64)
    ntoks = rng.integers(0, 600, size=200).astype(np.int64)
    t = pa.table({"doc_id": keys, "n_tokens": ntoks})
    ref = _pack_reference(keys, ntoks, seq_len=256, bucket_docs=32)
    out = pack_sequences(ray.data.from_arrow(t), seq_len=256,
                         bucket_docs=32, num_salt=4).take_all()
    assert len(out) == 200
    for r in out:
        assert (r["seq_first"], r["seq_last"]) == ref[r["doc_id"]], \
            r["doc_id"]


def test_pack_sequences_block_order_invariant(ray_session):
    import ray
    keys = np.arange(100, dtype=np.int64)
    ntoks = (keys * 37) % 300
    t = pa.table({"doc_id": keys, "n_tokens": ntoks})
    a = {r["doc_id"]: (r["seq_first"], r["seq_last"])
         for r in pack_sequences(ray.data.from_arrow(t),
                                 bucket_docs=16).take_all()}
    # reversed input order, different block structure
    t2 = t.take(pa.array(keys[::-1]))
    ds2 = ray.data.from_arrow(t2).repartition(7)
    b = {r["doc_id"]: (r["seq_first"], r["seq_last"])
         for r in pack_sequences(ds2, bucket_docs=16).take_all()}
    assert a == b


# ---------------------------------------------------------------------------
# line-level dedup
# ---------------------------------------------------------------------------

def test_line_dedup_semantics(ray_session):
    import ray
    from geoflow.text import line_dedup
    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "unique first line\nSubscribe to our newsletter\nbody one",
            "body two\n  Subscribe to our newsletter  \nanother line",
            "Subscribe to our newsletter",            # only common line
            "totally original\n\n   \nwith empty lines",
        ],
    })
    out = {r["doc_id"]: r["text_clean"]
           for r in line_dedup(ray.data.from_arrow(t)).take_all()}
    # trimmed-form identity: doc 2's padded variant counts as the same
    assert out[1] == "unique first line\nbody one"
    assert out[2] == "body two\nanother line"
    assert 3 not in out            # every line dropped -> doc removed
    # empty/whitespace lines are never counted and never dropped
    assert out[4] == "totally original\n\n   \nwith empty lines"


def test_line_dedup_min_docs_and_within_doc_repeat(ray_session):
    import ray
    from geoflow.text import line_dedup
    t = pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            "same line\nsame line\nown text",  # repeat WITHIN one doc
            "threshold line\nfiller a",
            "threshold line\nfiller b",
        ],
    })
    out = {r["doc_id"]: r["text_clean"]
           for r in line_dedup(ray.data.from_arrow(t),
                               min_docs=2).take_all()}
    # within-doc repetition is 1 distinct doc -> kept (both copies)
    assert out[1] == "same line\nsame line\nown text"
    assert out[2] == "filler a" and out[3] == "filler b"
    out3 = {r["doc_id"]: r["text_clean"]
            for r in line_dedup(ray.data.from_arrow(t),
                                min_docs=3).take_all()}
    # below the raised threshold: everything is kept verbatim
    assert out3[2] == "threshold line\nfiller a"
    assert out3[3] == "threshold line\nfiller b"


# ---------------------------------------------------------------------------
# document frequency / stopword discovery
# ---------------------------------------------------------------------------

def test_document_frequency(ray_session):
    import ray
    from geoflow.text import document_frequency, top_df_tokens
    t = pa.table({"text": [
        "the cat sat", "the dog ran", "THE the the bird",  # 'the' df=3
        "cat and dog", "", "unique"]})
    ds = ray.data.from_arrow(t)
    df = {r["token"]: r["df"]
          for r in document_frequency(ds).take_all()}
    assert df["the"] == 3      # within-doc repeats count once
    assert df["cat"] == 2 and df["dog"] == 2 and df["unique"] == 1
    top = top_df_tokens(ds, k=2).take_all()
    assert top[0]["token"] == "the" and top[0]["df"] == 3
    # deterministic tiebreak at df=2: 'and'? no - and df=1; cat < dog
    assert top[1]["token"] == "cat"


# ---------------------------------------------------------------------------
# incremental dedup against a persisted content-hash index
# ---------------------------------------------------------------------------

def test_incremental_dedup_lifecycle(ray_session, tmp_path):
    import ray
    from geoflow.text import (append_content_index, build_content_index,
                              dedup_against_index)
    idx = str(tmp_path / "idx")
    snap1 = pa.table({"doc_id": [1, 2, 3],
                      "text": ["alpha", "beta", "alpha"]})
    n = build_content_index(ray.data.from_arrow(snap1), idx)
    assert n == 2  # distinct contents only
    snap2 = pa.table({"doc_id": [10, 11, 12, 13],
                      "text": ["alpha", "gamma", "beta", "delta"]})
    for mode in ("broadcast", "join"):
        out = dedup_against_index(ray.data.from_arrow(snap2), idx,
                                  mode=mode).take_all()
        assert sorted(r["doc_id"] for r in out) == [11, 13], mode
    # append snapshot-2 survivors; index now covers gamma+delta too
    added = append_content_index(
        ray.data.from_arrow(snap2), idx)
    assert added == 2
    snap3 = pa.table({"doc_id": [20, 21],
                      "text": ["gamma", "epsilon"]})
    out = dedup_against_index(ray.data.from_arrow(snap3), idx).take_all()
    assert [r["doc_id"] for r in out] == [21]
    # idempotent re-append: nothing new
    assert append_content_index(ray.data.from_arrow(snap2), idx) == 0


# ---------------------------------------------------------------------------
# document chunking
# ---------------------------------------------------------------------------

def test_chunk_batch_windows():
    from geoflow.text.chunking import chunk_batch
    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": ["one two three four five six seven",
                           "tiny", ""]})
    out = chunk_batch(t, chunk_tokens=4, overlap=1).to_pylist()
    d1 = [r for r in out if r["doc_id"] == 1]
    assert [(r["tok_start"], r["tok_end"]) for r in d1] == \
        [(0, 4), (3, 7)]
    assert d1[0]["chunk_text"] == "one two three four"
    assert d1[1]["chunk_text"] == "four five six seven"
    d2 = [r for r in out if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "tiny"
    d3 = [r for r in out if r["doc_id"] == 3]
    assert len(d3) == 1 and d3[0]["chunk_text"] == "" \
        and d3[0]["n_chunk_tokens"] == 0


def test_chunk_documents_coverage_invariants(ray_session):
    import ray
    from geoflow.text import chunk_documents
    rng = np.random.default_rng(5)
    texts = [" ".join(f"w{i}t{j}" for j in range(rng.integers(0, 90)))
             for i in range(40)]
    t = pa.table({"doc_id": np.arange(40, dtype=np.int64),
                  "text": pa.array(texts)})
    out = chunk_documents(ray.data.from_arrow(t), chunk_tokens=16,
                          overlap=4).take_all()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(40))  # every doc represented
    for d, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        n = len(texts[d].split())
        # windows tile the doc: consecutive starts differ by the stride,
        # last window ends at the token count
        assert rows[0]["tok_start"] == 0
        assert rows[-1]["tok_end"] == n or (n == 0 and
                                            rows[-1]["tok_end"] == 0)
        for a, b in zip(rows, rows[1:]):
            assert b["tok_start"] - a["tok_start"] == 12
            assert b["tok_start"] < a["tok_end"]  # overlap holds
        # reassembly: stripping the overlap reproduces the doc
        toks = []
        for i, r in enumerate(rows):
            parts = r["chunk_text"].split()
            toks.extend(parts if i == 0 else parts[
                rows[i - 1]["tok_end"] - r["tok_start"]:])
        assert " ".join(toks) == texts[d]


# ---------------------------------------------------------------------------
# URL canonicalization / URL dedup
# ---------------------------------------------------------------------------

def test_canonicalize_urls_cases():
    from geoflow.text.urls import canonicalize_urls
    cases = [
        ("HTTPS://Example.COM/Path?a=1&utm_source=x&b=2#frag",
         "https://example.com/Path?a=1&b=2"),
        ("http://Host.org:80/p", "http://host.org/p"),
        ("https://h.io:443?utm_medium=y", "https://h.io"),
        ("http://a.b/?fbclid=zzz", "http://a.b/"),
        ("http://a.b/x?utm_a=1&utm_b=2", "http://a.b/x"),
        ("http://a.b/x?utm_a=1&c=3", "http://a.b/x?c=3"),
        ("not a url at all", "not a url at all"),
        ("http://a.b:8080/p?gclid=1&q=2", "http://a.b:8080/p?q=2"),
        ("ftp://U.P/Q", "ftp://u.p/Q"),  # path case preserved
    ]
    got = canonicalize_urls(pa.array([c[0] for c in cases])).to_pylist()
    assert got == [c[1] for c in cases]


def test_canonicalize_urls_duckdb_parity():
    duckdb = pytest.importorskip("duckdb")
    from geoflow.text.urls import (CANON_STEPS, SCHEME_AUTHORITY,
                                   canonicalize_urls)
    urls = ["HTTP://A.B:80/x?utm_q=1&z=2#f", "https://C.d:443/",
            "plain text ?utm_x=1", "http://e.f/?a=b&gclid=g&c=d"]
    expr = (f"lower(coalesce(regexp_extract(url, '{SCHEME_AUTHORITY}'),"
            f" '')) || regexp_replace(url, '{SCHEME_AUTHORITY}', '')")
    for pat, rep in CANON_STEPS:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}', 'g')"
    sql = duckdb.execute(
        "SELECT " + expr + " FROM (SELECT unnest(?) AS url)",
        [urls]).fetchall()
    assert [r[0] for r in sql] == \
        canonicalize_urls(pa.array(urls)).to_pylist()


def test_url_dedup(ray_session):
    import ray
    from geoflow.text import url_dedup
    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "url": ["HTTP://Site.com/p?utm_source=a",
                "http://site.com/p",
                "http://site.com/p#section",
                "http://other.com/q"],
    })
    out = url_dedup(ray.data.from_arrow(t)).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 4]


# ---------------------------------------------------------------------------
# schema-less empty-block regression (tiny inputs -> empty aggregator
# partitions -> the 0-column block that used to poison Dataset.join)
# ---------------------------------------------------------------------------

def test_exact_dup_losers_tiny_corpus(ray_session):
    import ray
    from geoflow.text.dedup import exact_dup_loser_keys
    t = pa.table({"doc_id": [1, 2, 3], "text": ["a", "a", "b"]})
    losers = exact_dup_loser_keys(ray.data.from_arrow(t)).take_all()
    assert [r["loser"] for r in losers] == [2]
    # empty corpus short-circuits
    e = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    assert exact_dup_loser_keys(ray.data.from_arrow(e)).take_all() == []


def test_cosine_near_dup_joined_verify_tiny(ray_session):
    import ray
    from geoflow.vector.ann import cosine_near_dup_pairs
    rng = np.random.default_rng(3)
    base = rng.normal(size=(6, 8)).astype(np.float32)
    base[5] = base[0] + 1e-4          # one planted near-dup pair
    t = pa.table({"vec_id": np.arange(6, dtype=np.int64),
                  "embedding": [list(map(float, v)) for v in base]})
    # max_broadcast_pairs=0 forces the hash-join verify path with a
    # single candidate pair (one join partition stays empty)
    out = cosine_near_dup_pairs(ray.data.from_arrow(t), threshold=0.99,
                                max_broadcast_pairs=0).take_all()
    assert {(r["key_a"], r["key_b"]) for r in out} == {(0, 5)}


def test_estimate_pair_jaccard_joined_tiny(ray_session):
    import ray
    from geoflow.text.dedup import MinHasher, estimate_pair_jaccard
    mh = MinHasher(num_hashes=32, shingle_k=2)
    texts = pa.array(["the quick brown fox jumps over the lazy dog",
                      "the quick brown fox jumps over the lazy cat"])
    sigs = mh.signatures(texts).astype(np.uint64)
    sig_ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([10, 11], type=pa.int64()),
        "minhash": pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.ravel()), 32)}))
    pairs = ray.data.from_arrow(pa.table({
        "key_a": pa.array([10], type=pa.int64()),
        "key_b": pa.array([11], type=pa.int64())}))
    out = estimate_pair_jaccard(pairs, sig_ds, num_hashes=32,
                                max_broadcast_pairs=0).take_all()
    assert len(out) == 1 and 0.0 < out[0]["sig_jaccard"] <= 1.0


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def test_sample_slot_range_and_determinism():
    keys = np.arange(-500, 5000, dtype=np.int64)
    for method in ("splitmix", "lcg32"):
        s = sample_slot(keys, method=method)
        assert s.min() >= 0 and s.max() < 1024
        assert np.array_equal(s, sample_slot(keys, method=method))
        # roughly uniform: each half holds 40-60%
        frac = (s < 512).mean()
        assert 0.4 < frac < 0.6, (method, frac)
    # salt changes membership
    a = sample_slot(keys, salt=0, method="lcg32")
    b = sample_slot(keys, salt=9, method="lcg32")
    assert (a != b).mean() > 0.5


def test_sample_slot_sql_parity():
    duckdb = pytest.importorskip("duckdb")
    keys = np.arange(-300, 3000, 7, dtype=np.int64)
    ours = sample_slot(keys, salt=5, method="lcg32")
    got = duckdb.sql(
        "SELECT " + sample_slot_sql("k", salt=5) +
        " AS s FROM (SELECT unnest(?) AS k)",
        params=[[int(x) for x in keys]]).fetchnumpy()["s"]
    assert np.array_equal(ours, got.astype(np.int64))


def test_hash_sample_and_split(ray_session):
    import ray
    t = pa.table({"doc_id": np.arange(4000, dtype=np.int64),
                  "lang": (["en"] * 3000 + ["is"] * 1000)})
    ds = ray.data.from_arrow(t)
    kept = hash_sample(ds, "doc_id", frac_1024=128).take_all()
    assert 0.08 < len(kept) / 4000 < 0.17
    # stratified: keep all Icelandic, ~1/8 English
    st = stratified_sample(ds, "doc_id", "lang",
                           {"is": 1024, "en": 128}).take_all()
    langs = [r["lang"] for r in st]
    assert langs.count("is") == 1000
    assert 200 < langs.count("en") < 550
    # split: disjoint, exhaustive, deterministic
    sp = split_column(ds, "doc_id", val_frac_1024=102,
                      test_frac_1024=102).take_all()
    by = {}
    for r in sp:
        by.setdefault(r["split"], set()).add(r["doc_id"])
    assert sum(len(v) for v in by.values()) == 4000
    assert len(by["train"] | by["val"] | by["test"]) == 4000
    assert 0.05 < len(by["val"]) / 4000 < 0.15
    # sample is a subset of itself under re-execution (determinism)
    kept2 = hash_sample(ds, "doc_id", frac_1024=128).take_all()
    assert {r["doc_id"] for r in kept} == {r["doc_id"] for r in kept2}


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

def test_pii_scrub_batch():
    from geoflow.text import pii_scrub_batch
    t = pa.table({"text": [
        "mail john.doe+x@Example.co.uk now",
        "hosts 192.168.1.10 8.8.8.8",
        "call +1 (555) 123-4567 ok",
        "year 2024 version 1.2.3 untouched",
    ]})
    out = pii_scrub_batch(t).to_pylist()
    assert out[0]["text_scrubbed"] == "mail <EMAIL> now"
    assert out[0]["n_email"] == 1
    assert out[1]["text_scrubbed"] == "hosts <IP> <IP>"
    assert out[1]["n_ip"] == 2
    assert out[2]["text_scrubbed"] == "call <PHONE> ok"
    assert out[2]["n_phone"] == 1
    assert out[3]["text_scrubbed"] == out[3]["text"]  # no false hits


def test_pii_scrub_duckdb_parity():
    duckdb = pytest.importorskip("duckdb")
    from geoflow.text.pii import PII_STEPS, pii_scrub_batch
    texts = ["a@b.io and 10.0.0.1 and +49 30 901820 42",
             "nothing here", "x@y.z 1.2.3.4 +1 555 000 1234"]
    t = pa.table({"text": pa.array(texts)})
    ours = pii_scrub_batch(t).to_pylist()
    expr = "text"
    for _, p, r in PII_STEPS:
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    got = duckdb.connect().execute(
        "SELECT " + expr + " FROM (SELECT unnest(?) AS text)",
        [texts]).fetchall()
    assert [r["text_scrubbed"] for r in ours] == [g[0] for g in got]


# ---------------------------------------------------------------------------
# n-gram LM filter (text/lm.py)
# ---------------------------------------------------------------------------

def test_lm_train_prune_and_score(ray_session):
    import ray
    from geoflow.text.lm import lm_score, train_bigram_lm
    train = pa.table({"text": [
        "the cat sat on the mat", "the dog sat on the rug",
        "a cat and a dog"]})
    ref = train_bigram_lm(ray.data.from_arrow(train),
                          top_unigrams=8, top_bigrams=8)
    uh, uc, bh, bc, total = ray.get(ref)
    assert total == 17 and len(uh) == 8 and len(bh) == 8
    test = pa.table({"doc_id": [1, 2, 3],
                     "text": ["the cat sat", "zebra quantum flux", ""]})
    out = {r["doc_id"]: r
           for r in lm_score(ray.data.from_arrow(test), ref).take_all()}
    # in-domain text scores far above OOV garbage; empty doc is zero
    assert out[1]["n_unigram_oov"] == 0
    assert out[2]["n_unigram_oov"] == 3
    assert out[1]["logprob_q"] > out[2]["logprob_q"]
    assert out[3]["n_tokens"] == 0 and out[3]["logprob_q"] == 0
    # pruning tiebreak: "the cat"(1) loses its top-8 bigram slot to
    # alphabetically-earlier count-1 grams; "cat sat"(1) keeps one
    assert out[1]["n_bigram_hits"] == 1


def test_lm_score_deterministic_across_runs(ray_session):
    import ray
    from geoflow.text.lm import lm_score, train_bigram_lm
    rng = np.random.default_rng(11)
    texts = [" ".join(rng.choice(list("abcdefgh"), size=20))
             for _ in range(50)]
    t = pa.table({"doc_id": np.arange(50, dtype=np.int64),
                  "text": pa.array(texts)})
    outs = []
    for _ in range(2):
        ref = train_bigram_lm(ray.data.from_arrow(t).repartition(5),
                              top_unigrams=4, top_bigrams=12)
        outs.append(sorted(
            (r["doc_id"], r["logprob_q"], r["n_bigram_hits"])
            for r in lm_score(ray.data.from_arrow(t), ref).take_all()))
    assert outs[0] == outs[1]


# ---------------------------------------------------------------------------
# HTML -> text
# ---------------------------------------------------------------------------

def test_html_to_text_cases():
    from geoflow.text import html_to_text
    cases = [
        ("<html><head><script>var x=1;</script><style>p{}</style>"
         "</head><body><h1>Title</h1><p>Hello <b>world</b> &amp; "
         "friends</p><!-- hidden --><div>Second &lt;line&gt;</div>"
         "</body></html>",
         "Title\nHello world & friends\nSecond <line>"),
        ("plain text stays", "plain text stays"),
        ("<ul><li>a</li><li>b</li></ul>", "a\nb"),
        ("broken <script>never closed...", "broken never closed..."),
        ("spaces   and\t\ttabs &nbsp; here", "spaces and tabs here"),
    ]
    got = html_to_text(pa.array([c[0] for c in cases])).to_pylist()
    assert got == [c[1] for c in cases]


def test_html_to_text_duckdb_parity():
    duckdb = pytest.importorskip("duckdb")
    from geoflow.text.htmltext import HTML_STEPS, html_to_text
    html = ["<p>x&amp;y</p><script>a</script>",
            "<div>A</div><div>B</div>", "no tags &quot;q&quot;"]
    expr = "h"
    for pat, rep in HTML_STEPS:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''").replace("\n", "' || chr(10) || '")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    sql = [r[0] for r in duckdb.connect().execute(
        "SELECT " + expr + " FROM (SELECT unnest(?) AS h)",
        [html]).fetchall()]
    assert sql == html_to_text(pa.array(html)).to_pylist()


# ---------------------------------------------------------------------------
# token-budget mixing
# ---------------------------------------------------------------------------

def test_token_budget_sample(ray_session):
    import ray
    from geoflow.ops.sampling import order_key32, token_budget_sample
    rng = np.random.default_rng(9)
    n = 300
    t = pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": pa.array([f"s{i % 3}" for i in range(n)]),
        "n_tokens": rng.integers(10, 100, size=n).astype(np.int64),
    })
    out = token_budget_sample(ray.data.from_arrow(t), "source",
                              "n_tokens", "doc_id", budget=400,
                              salt=2).take_all()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == {"s0", "s1", "s2"}
    # brute-force per-source oracle
    keys = t.column("doc_id").to_numpy()
    srcs = t.column("source").to_pylist()
    toks = t.column("n_tokens").to_numpy()
    ok = order_key32(keys, salt=2)
    for s, rows in by_src.items():
        idx = [i for i in range(n) if srcs[i] == s]
        idx.sort(key=lambda i: (ok[i], keys[i]))
        cum, expect = 0, set()
        for i in idx:
            if cum < 400:
                expect.add(int(keys[i]))
            cum += int(toks[i])
        got = {r["doc_id"] for r in rows}
        assert got == expect, s
        total = sum(r["n_tokens"] for r in rows)
        # budget respected up to one-doc overshoot
        assert total >= 400 and total < 400 + 100

    # block-order invariance
    t2 = t.take(pa.array(np.arange(n)[::-1]))
    out2 = token_budget_sample(
        ray.data.from_arrow(t2).repartition(5), "source", "n_tokens",
        "doc_id", budget=400, salt=2).take_all()
    assert {r["doc_id"] for r in out2} == {r["doc_id"] for r in out}


# ---------------------------------------------------------------------------
# exact substring dedup (ExactSubstr fixed-window formulation)
# ---------------------------------------------------------------------------

def _brute_substr_dedup(texts, k):
    """Reference: token position removed iff covered by a k-gram (as a
    token TUPLE) occurring >= 2 times across the whole corpus."""
    import re
    from collections import Counter
    toks = [re.findall(r"[\w]+", t.lower(), re.UNICODE) for t in texts]
    cnt = Counter()
    for tk in toks:
        for i in range(len(tk) - k + 1):
            cnt[tuple(tk[i:i + k])] += 1
    out = []
    for tk in toks:
        rem = [False] * len(tk)
        for i in range(len(tk) - k + 1):
            if cnt[tuple(tk[i:i + k])] >= 2:
                for j in range(i, i + k):
                    rem[j] = True
        out.append((len(tk), sum(rem),
                    " ".join(t for t, r in zip(tk, rem) if not r)))
    return out


def test_substr_dedup_semantics(ray_session):
    import ray
    from geoflow.text import substr_dedup
    t = pa.table({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "one two three four END of the first document here",
            "prefix words one two three four SUFFIX tail tokens",
            "short doc",                       # < k tokens: untouched
            "",                                # tokenless
            "one two three four END of the first document here",  # exact dup of 1
        ],
    })
    out = {r["doc_id"]: r for r in substr_dedup(
        ray.data.from_arrow(t), k=4).take_all()}
    # the shared 4-gram "one two three four" is removed EVERYWHERE,
    # including the first occurrence (ExactSubstr: all copies go)
    assert "one two three four" not in out[2]["text_dedup"]
    assert out[2]["text_dedup"] == "prefix words suffix tail tokens"
    # docs 1 and 5 are exact duplicates: every window duplicated
    assert out[1]["text_dedup"] == "" and out[5]["text_dedup"] == ""
    assert out[1]["n_removed"] == out[1]["n_tokens"] == 10
    # short / empty docs survive untouched
    assert out[3]["text_dedup"] == "short doc"
    assert out[3]["n_removed"] == 0 and out[3]["n_tokens"] == 2
    assert out[4]["text_dedup"] == "" and out[4]["n_tokens"] == 0


def test_substr_dedup_within_doc_repeat(ray_session):
    import ray
    from geoflow.text import substr_dedup
    t = pa.table({
        "doc_id": [1],
        "text": ["a b c d middle filler words a b c d trailing bits"],
    })
    out = substr_dedup(ray.data.from_arrow(t), k=4).take_all()[0]
    # within-doc repetition counts: both copies of "a b c d" removed
    assert out["text_dedup"] == "middle filler words trailing bits"
    assert out["n_removed"] == 8


def test_substr_dedup_matches_brute_and_block_invariant(ray_session):
    import ray
    from geoflow.text import substr_dedup
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for d in range(30):
        n = int(rng.randint(3, 25))
        texts.append(" ".join(vocab[i] for i in rng.randint(0, 40, n)))
    # plant a shared phrase mid-document in several docs
    phrase = "alpha beta gamma delta epsilon"
    for d in (3, 11, 19):
        texts[d] = texts[d] + " " + phrase + " " + texts[(d * 7) % 30]
    t = pa.table({"doc_id": list(range(30)), "text": texts})
    exp = _brute_substr_dedup(texts, k=5)
    for nblocks in (1, 4):
        ds = ray.data.from_arrow(t)
        if nblocks > 1:
            ds = ds.repartition(nblocks)
        got = {r["doc_id"]: r for r in substr_dedup(ds, k=5).take_all()}
        for d in range(30):
            nt, nr, txt = exp[d]
            assert got[d]["n_tokens"] == nt, d
            assert got[d]["n_removed"] == nr, d
            assert got[d]["text_dedup"] == txt, d


# ---------------------------------------------------------------------------
# unicode normalization
# ---------------------------------------------------------------------------

def test_normalize_text_batch():
    from geoflow.text import normalize_text_batch
    t = pa.table({"text": pa.array(
        ["plain ascii text",
         "wort é ende",        # decomposed -> composes
         "grün",
         "ligature ﬁn",         # NFC keeps ligature
         None])})
    out = normalize_text_batch(t)["text_norm"].to_pylist()
    assert out[0] == "plain ascii text"
    assert out[1] == "wort é ende" and len(out[1]) == 11
    assert out[2] == "grün"
    assert out[3] == "ligature ﬁn"      # canonical form keeps U+FB01
    assert out[4] is None
    # NFKC folds the compatibility ligature
    nk = normalize_text_batch(t, form="NFKC")["text_norm"].to_pylist()
    assert nk[3] == "ligature fin"


def test_normalize_text_batch_ascii_fast_path_zero_copy():
    from geoflow.text import normalize_text_batch
    col = pa.array(["only", "ascii", "rows"])
    out = normalize_text_batch(pa.table({"text": col}))
    # all-ASCII batches pass the column through untouched
    assert out["text_norm"].chunk(0) is col or \
        out["text_norm"].to_pylist() == col.to_pylist()


# ---------------------------------------------------------------------------
# keyword search
# ---------------------------------------------------------------------------

def test_keyword_search_and_or_semantics(ray_session):
    import ray
    from geoflow.text import keyword_search
    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "alpha beta gamma alpha",      # alpha x2, beta
            "alpha only here",
            "beta beta beta",
            "nothing relevant at all",
        ],
    })
    ds = ray.data.from_arrow(t)
    both = {r["doc_id"]: r["tf"] for r in keyword_search(
        ds, ["alpha", "beta"]).take_all()}
    assert both == {1: 3}                  # AND: only doc 1; tf = 2+1
    any_ = {r["doc_id"]: r["tf"] for r in keyword_search(
        ds, ["alpha", "beta"], mode="any").take_all()}
    assert any_ == {1: 3, 2: 1, 3: 3}
    # case-insensitive on both sides
    up = {r["doc_id"]: r["tf"] for r in keyword_search(
        ds, ["ALPHA", "Beta"]).take_all()}
    assert up == both


def test_keyword_search_topk_deterministic(ray_session):
    import ray
    from geoflow.text import keyword_search
    rows = [{"doc_id": i, "text": "hit " * (i % 5 + 1)} for i in range(23)]
    ds = ray.data.from_items(rows)
    out = keyword_search(ds, ["hit"], k=6).take_all()
    tfs = [r["tf"] for r in out]
    ids = [r["doc_id"] for r in out]
    assert tfs == [5, 5, 5, 5, 4, 4]       # tf desc, ties by doc_id asc
    assert ids == [4, 9, 14, 19, 3, 8]


def test_bm25_matches_brute_reference(ray_session):
    import math

    import ray
    from geoflow.text.search import bm25_score
    texts = ["query join table query", "join join spark", "table scan",
             "", "query spark query spark query", "misc words only"]
    t = pa.table({"doc_id": list(range(6)), "text": texts})
    terms = ["query", "join", "spark"]
    out = {r["doc_id"]: (r["dl"], r["bm25"]) for r in bm25_score(
        ray.data.from_arrow(t), terms).take_all()}
    # brute reference (same formula, same order)
    toks = [tx.split() for tx in texts]
    n = len(texts)
    avgdl = sum(len(tk) for tk in toks) / n
    df = {q: sum(1 for tk in toks if q in tk) for q in terms}
    for i, tk in enumerate(toks):
        s = 0.0
        for q in terms:
            tf = tk.count(q)
            if tf:
                idf = math.log((n - df[q] + 0.5) / (df[q] + 0.5))
                s = s + idf * tf * (1.2 + 1.0) / (
                    tf + 1.2 * ((1.0 - 0.75) + 0.75 * len(tk) / avgdl))
        assert out[i] == (len(tk), s)      # bit-exact, not approx
    # zero-match and empty docs present with score exactly 0.0
    assert out[3] == (0, 0.0) and out[5][1] == 0.0


def test_bm25_topk_and_absent_term(ray_session):
    import ray
    from geoflow.text.search import bm25_score
    rows = [{"doc_id": i, "text": "hit " * (i % 4 + 1) + "pad"}
            for i in range(17)]
    ds = ray.data.from_items(rows)
    out = bm25_score(ds, ["hit", "zzz_absent"], k=5).take_all()
    assert len(out) == 5
    scores = [r["bm25"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # absent term: df=0 branch must not NaN/throw anywhere
    assert all(np.isfinite(s) for s in scores)


def test_c4_clean_rules(ray_session):
    import ray
    from geoflow.text import c4_clean
    pages = {
        0: ("Good first sentence with enough words.\n"
            "short line.\n"                       # <5 words
            "no terminal punctuation here at all\n"
            "Another proper sentence that is kept!\n"
            "Is this a kept question with words?"),
        1: ("Good first sentence with enough words.\n"
            "Another proper sentence that is kept!\n"
            "Lorem Ipsum dolor sit amet words here.\n"
            "Third proper sentence keeps the page alive."),
        2: ("Good first sentence with enough words.\n"
            "Another proper sentence that is kept!\n"
            "var x = { broken: true };\n"
            "Third proper sentence keeps the page alive."),
        3: ("Enable JavaScript to see this content now.\n"
            "Good first sentence with enough words.\n"
            "Another proper sentence that is kept!\n"
            "Third proper sentence keeps the page alive."),
        4: ("Only one kept sentence lives right here.\n"
            "and nothing else\n"
            "more filler"),
        5: ("He shouted bukkake in the meeting room.\n"
            "Good first sentence with enough words.\n"
            "Another proper sentence that is kept!\n"
            "Third proper sentence keeps the page alive."),
    }
    t = pa.table({"doc_id": pa.array(sorted(pages), type=pa.int64()),
                  "text": [pages[k] for k in sorted(pages)]})
    out = {r["doc_id"]: r["text_clean"]
           for r in c4_clean(ray.data.from_arrow(t)).take_all()}
    # page 0 survives: 3 kept lines (header, exclamation, question)
    assert out[0] == ("Good first sentence with enough words.\n"
                      "Another proper sentence that is kept!\n"
                      "Is this a kept question with words?")
    # 1: lorem ipsum page drop; 2: curly brace; 4: <3 kept lines;
    # 5: badword page drop
    # 3: javascript LINE dropped but page keeps 3 other sentences
    assert out[3] == ("Good first sentence with enough words.\n"
                      "Another proper sentence that is kept!\n"
                      "Third proper sentence keeps the page alive.")
    assert set(out) == {0, 3}


def test_dsir_weights_and_selection(ray_session):
    import ray
    from geoflow.text import dsir_resample, dsir_weights
    # 3 target-ish docs, 3 raw-only docs; brute-force expected weights
    corpus = pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "text": ["good clean prose", "good clean words", "good prose text",
                 "spam junk noise", "junk noise filler", "spam filler junk"],
    })
    target = pa.table({
        "doc_id": pa.array([100, 101], type=pa.int64()),
        "text": ["good clean prose", "good clean text"],
    })
    ds = ray.data.from_arrow(corpus)
    tds = ray.data.from_arrow(target)
    out = {r["doc_id"]: r["weight"]
           for r in dsir_weights(ds, tds).take_all()}

    # brute force in plain python
    import collections
    import math
    rt = [t.split() for t in corpus.column("text").to_pylist()]
    tt = [t.split() for t in target.column("text").to_pylist()]
    cr = collections.Counter(w for d in rt for w in d)
    ct = collections.Counter(w for d in tt for w in d)
    V = len(set(cr) | set(ct))
    T = sum(ct.values())
    R = sum(cr.values())
    for i, d in enumerate(rt):
        w = sum(math.log((ct[x] + 1) / (T + V))
                - math.log((cr[x] + 1) / (R + V)) for x in d)
        assert abs(out[i] - w) < 1e-9, (i, out[i], w)
    # target-like docs all outrank raw-only docs
    assert min(out[0], out[1], out[2]) > max(out[3], out[4], out[5])

    # threshold + top-k + gumbel selection shapes
    kept = {r["doc_id"] for r in dsir_resample(
        ds, tds, threshold=0.0).take_all()}
    assert kept == {0, 1, 2}
    top2 = [r["doc_id"] for r in dsir_resample(ds, tds, k=2).take_all()]
    assert set(top2) <= {0, 1, 2} and len(top2) == 2
    g1 = [r["doc_id"] for r in dsir_resample(
        ds, tds, k=3, gumbel=True, seed=7).take_all()]
    g2 = [r["doc_id"] for r in dsir_resample(
        ds, tds, k=3, gumbel=True, seed=7).take_all()]
    assert g1 == g2                        # deterministic under a seed


def test_dsir_bucket_mode_and_bigrams(ray_session):
    import ray
    from geoflow.text import dsir_weights
    corpus = pa.table({
        "doc_id": pa.array(range(4), type=pa.int64()),
        "text": ["alpha beta gamma", "alpha beta beta",
                 "delta epsilon zeta", "zeta delta eta"],
    })
    target = pa.table({"doc_id": pa.array([9], type=pa.int64()),
                       "text": ["alpha beta gamma alpha beta"]})
    ds = ray.data.from_arrow(corpus)
    tds = ray.data.from_arrow(target)
    # m-bucket mode: fixed feature space, still separates the planted
    # target-like docs from the rest
    out = {r["doc_id"]: r["weight"]
           for r in dsir_weights(ds, tds, m=512).take_all()}
    assert min(out[0], out[1]) > max(out[2], out[3])
    outb = {r["doc_id"]: r["weight"]
            for r in dsir_weights(ds, tds, bigrams=True).take_all()}
    assert min(outb[0], outb[1]) > max(outb[2], outb[3])


def test_paragraph_dedup_sep(ray_session):
    import ray
    from geoflow.text import line_dedup
    shared = "Subscribe to our newsletter.\nIt is great."
    docs = pa.table({
        "doc_id": pa.array(range(3), type=pa.int64()),
        "text": [f"unique one\nkeeps lines\n\n{shared}",
                 f"{shared}\n\nanother body\nwith lines",
                 "solo paragraph\nno repeats at all"],
    })
    ds = ray.data.from_arrow(docs)
    out = {r["doc_id"]: r["text_clean"]
           for r in line_dedup(ds, sep="\n\n").take_all()}
    # the shared PARAGRAPH (itself containing a newline) drops whole;
    # single newlines inside surviving paragraphs are untouched
    assert out == {0: "unique one\nkeeps lines",
                   1: "another body\nwith lines",
                   2: "solo paragraph\nno repeats at all"}


class TestUrlTemplates:
    """url_template / url_template_counts (text/urls.py)."""

    def test_mask_rules_and_duckdb_parity(self):
        import duckdb

        from geoflow.text.urls import url_template
        paths = ["/item/123", "/h/deadbeefdeadbeef00/x",
                 "/cat/5/item-77?page=3", "/plain", "/y2024/m12/d01",
                 "/0123456789abcdef"]
        t = pa.table({"p": paths})
        got = url_template(t.column("p")).to_pylist()
        exp = [r[0] for r in duckdb.sql(
            "SELECT regexp_replace(regexp_replace(p,"
            " '[0-9a-f]{16,}', 'H', 'g'), '\\d+', 'N', 'g') FROM t"
        ).fetchall()]
        assert got == exp
        assert got[0] == "/item/N" and got[1] == "/h/H/x"
        assert got[5] == "/H"

    def test_counts_per_host(self, ray_session):
        import ray.data as rd

        from geoflow.text.urls import url_template_counts
        rows = [{"host": "a", "path": f"/p/{i}"} for i in range(5)] \
            + [{"host": "a", "path": "/about"},
               {"host": "b", "path": "/p/9"}]
        out = url_template_counts(
            rd.from_arrow(pa.Table.from_pylist(rows))).take_all()
        got = {(r["host"], r["template"]): r["n"] for r in out}
        assert got == {("a", "/p/N"): 5, ("a", "/about"): 1,
                       ("b", "/p/N"): 1}
