"""grouped_ntile (ops/grouped.py) vs SQL NTILE, and the CCNet-style
perplexity bucketing composite (text/lm.py ccnet_buckets). The
driver-facing value gate is the `ccnet_buckets` oracle query (green at
sf0.001/0.01/0.1); these tests pin the NTILE equivalence on fuzzed
group sizes and the bucket semantics."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data

from geoflow.ops.grouped import grouped_ntile


def _fuzz_case(rng, n_rows, n_keys, k):
    key = rng.integers(0, n_keys, n_rows).astype(np.int64)
    val = rng.integers(0, 7, n_rows).astype(np.int64)   # force ties
    tie = np.arange(n_rows, dtype=np.int64)
    rng.shuffle(tie)
    return pa.table({"key": key, "val": val, "tie": tie})


def test_grouped_ntile_matches_sql_ntile():
    rng = np.random.default_rng(11)
    for n_rows, n_keys, k in [(1, 1, 3), (7, 2, 3), (50, 5, 4),
                              (200, 7, 3), (333, 11, 5), (40, 40, 2)]:
        t = _fuzz_case(rng, n_rows, n_keys, k)
        ds = ray.data.from_arrow(t)
        got = grouped_ntile(ds, "key", "val", "tie", k,
                            out_col="bucket").to_pandas()
        got = got.sort_values(["key", "tie"]).reset_index(drop=True)
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(
            f"""SELECT key, tie,
                       NTILE({k}) OVER (PARTITION BY key
                                        ORDER BY val, tie) - 1 AS bucket
                FROM t ORDER BY key, tie""").fetch_df()
        con.close()
        assert list(got["bucket"]) == list(want["bucket"]), (n_rows, k)


def test_ntile_bucket_sizes_big_first():
    # n=7, k=3 -> sizes 3,2,2
    t = pa.table({"key": np.zeros(7, dtype=np.int64),
                  "val": np.arange(7, dtype=np.int64),
                  "tie": np.arange(7, dtype=np.int64)})
    got = grouped_ntile(ray.data.from_arrow(t), "key", "val", "tie",
                        3, out_col="b").to_pandas().sort_values("val")
    assert list(got["b"]) == [0, 0, 0, 1, 1, 2, 2]


def test_ccnet_buckets_semantics():
    from geoflow.text.lm import ccnet_buckets, train_bigram_lm
    fluent = "the cat sat on the mat and the dog sat on the rug " * 4
    docs = []
    for i in range(12):
        lang = "en" if i % 2 == 0 else "de"
        if i < 8:
            text = fluent
        else:
            text = f"zzq{i} qqz{i * 3} xj{i * 7} vv{i} kk{i * 11} " * 6
        docs.append((i, lang, text))
    t = pa.table({"doc_id": pa.array([d[0] for d in docs], pa.int64()),
                  "lang": pa.array([d[1] for d in docs], pa.string()),
                  "text": pa.array([d[2] for d in docs], pa.string())})
    ds = ray.data.from_arrow(t)
    ref = train_bigram_lm(ds, top_unigrams=16, top_bigrams=64)
    out = ccnet_buckets(ds, ref).to_pandas().set_index("doc_id")
    # disfluent docs (8..11) must land in their language's tail bucket
    for i in (8, 9, 10, 11):
        assert out.loc[i, "ppl_bucket"] == 2, out
        assert out.loc[i, "ppl_keep"] == 0
    # the most fluent docs land in head and are kept
    assert (out.loc[[0, 1], "ppl_bucket"] <= 1).all()
    assert (out.loc[[0, 1], "ppl_keep"] == 1).all()
    # buckets are balanced within each language (6 docs -> 2/2/2)
    for lang in ("en", "de"):
        sizes = out[out["lang"] == lang]["ppl_bucket"].value_counts()
        assert sorted(sizes) == [2, 2, 2]
