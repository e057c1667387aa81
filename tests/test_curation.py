"""End-to-end curation composite (geoflow/pipelines/curation.py) on
planted fixtures: every stage's effect is individually attributable —
quality/language filters, exact dedup winners, the near-dup
"drop iff smaller partner" rule (cluster minimum always survives,
no surviving adjacent pair), blocklist anti-join, per-source cap."""

import numpy as np
import pyarrow as pa
import pytest


def _tok_text(i, n=100, swap_last=False):
    toks = [f"t{i}a{j}" for j in range(n)]
    if swap_last:
        toks[-1] = f"zz{i}"
    return " ".join(toks)


def _corpus():
    """30 docs, unique-token texts; planted structure:
    - ids 0..29 originals
    - id 100/101: exact copies of id 0 (dedup keeps 0)
    - id 200: near copy of id 1 (one token changed -> J~0.90)
    - id 201: near copy of id 200's text with ANOTHER token changed
      (chain 1-200-201: at least min(1) survives; 200 drops via
      (1,200); 201 drops via (200,201) pairwise rule)
    """
    ids, texts = [], []
    for i in range(30):
        ids.append(i)
        texts.append(_tok_text(i))
    ids += [100, 101]
    texts += [_tok_text(0), _tok_text(0)]
    ids.append(200)
    texts.append(_tok_text(1, swap_last=True))
    toks = _tok_text(1, swap_last=True).split()
    toks[0] = f"qq{1}"
    ids.append(201)
    texts.append(" ".join(toks))
    return pa.table({"doc_id": pa.array(np.array(ids, np.int64)),
                     "text": pa.array(texts, type=pa.string()),
                     "source": pa.array(
                         [f"s{i % 3}" for i in ids], type=pa.string())})


class TestCurate:
    def test_dedup_and_neardup(self, ray_session):
        import ray
        from geoflow.pipelines.curation import curate
        ds = ray.data.from_arrow(_corpus()).repartition(4)
        out = curate(ds, languages=None, min_quality=0.0, near_dup=True)
        got = sorted(r["doc_id"] for r in out.take_all())
        # exact copies 100/101 die in dedup (winner of {0,100,101}=0);
        # near chain: 200 drops (partner 1), 201 drops (partner 200)
        assert got == list(range(30))

    def test_quality_and_language_filter(self, ray_session):
        import ray
        from geoflow.pipelines.curation import curate
        from geoflow.text.analysis import langid_batch, quality_batch
        t = pa.table({
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array([
                "the cat sat on the mat and it is happy with that " * 8,
                "der hund ist nicht mit der katze und das ist gut " * 8,
                "!!! ??? ... ;;; ::: @@@ ###",
            ]),
            "source": pa.array(["a", "a", "a"])})
        # verify fixture assumptions against the kernels themselves
        lp = langid_batch(t).column("lang_pred").to_pylist()
        assert lp[:2] == ["en", "de"]
        qs = quality_batch(t).column("quality_score").to_pylist()
        assert qs[2] < 0.5 < min(qs[:2])
        ds = ray.data.from_arrow(t)
        out = curate(ds, languages=("en",), min_quality=0.5,
                     near_dup=False)
        rows = out.take_all()
        assert [r["doc_id"] for r in rows] == [0]
        assert "quality_score" in rows[0]

    def test_blocklist_and_source_cap(self, ray_session):
        import ray
        from geoflow.pipelines.curation import curate
        t = _corpus()
        ds = ray.data.from_arrow(t).repartition(4)
        block = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([3, 4, 5], type=pa.int64())}))
        out = curate(ds, languages=None, min_quality=0.0, near_dup=True,
                     blocklist_ds=block, source_col="source",
                     per_source_cap=4)
        rows = out.take_all()
        ids = {r["doc_id"] for r in rows}
        assert ids.isdisjoint({3, 4, 5})
        # per-source cap: max 4 docs per source
        from collections import Counter
        c = Counter(r["source"] for r in rows)
        assert max(c.values()) <= 4
        # 27 survivors, 9 per source, capped to exactly 4
        for s, n in c.items():
            assert n == 4

    def test_empty_input(self, ray_session):
        import ray
        from geoflow.pipelines.curation import curate
        t = _corpus().slice(0, 0)
        ds = ray.data.from_arrow(t)
        out = curate(ds, languages=None, min_quality=0.0, near_dup=True)
        assert out.take_all() == []


class TestCurateJoinMode:
    def test_join_mode_matches_broadcast(self, ray_session):
        """filter_mode='join' (partitioned hash joins, nothing
        driver-materialized) must produce exactly the broadcast-path
        output on the planted corpus, including blocklist + cap."""
        import ray
        from geoflow.pipelines.curation import curate
        t = _corpus()
        block = ray.data.from_arrow(
            pa.table({"doc_id": pa.array([3, 4, 5], type=pa.int64())}))

        def run(mode):
            ds = ray.data.from_arrow(t).repartition(4)
            out = curate(ds, languages=None, min_quality=0.0,
                         near_dup=True, blocklist_ds=block,
                         source_col="source", per_source_cap=4,
                         filter_mode=mode)
            return sorted((r["doc_id"], r["source"])
                          for r in out.take_all())

        assert run("join") == run("broadcast")

    def test_join_mode_neardup_only(self, ray_session):
        import ray
        from geoflow.pipelines.curation import curate
        ds = ray.data.from_arrow(_corpus()).repartition(4)
        out = curate(ds, languages=None, min_quality=0.0, near_dup=True,
                     filter_mode="join")
        assert sorted(r["doc_id"] for r in out.take_all()) == \
            list(range(30))

    def test_join_mode_dedup_only(self, ray_session):
        import ray
        from geoflow.pipelines.curation import curate
        ds = ray.data.from_arrow(_corpus()).repartition(4)
        out = curate(ds, languages=None, min_quality=0.0,
                     near_dup=False, filter_mode="join")
        got = sorted(r["doc_id"] for r in out.take_all())
        # only exact dups collapse: 100/101 die (winner 0); near
        # copies 200/201 survive (texts differ)
        assert got == list(range(30)) + [200, 201]

    def test_line_strip_and_decontam_stages(self, ray_session):
        import pyarrow as pa
        import ray
        from geoflow.pipelines.curation import curate
        docs = pa.table({
            "doc_id": [0, 1, 2, 3],
            "text": [
                "subscribe now\nreal body zero",
                "subscribe now\nreal body one",
                "subscribe now\nthe secret benchmark sentence is here",
                "subscribe now",          # boilerplate-only -> dropped
            ],
        })
        bench = pa.table({
            "doc_id": [99],
            "text": ["the secret benchmark sentence is here indeed"],
        })
        for mode in ("broadcast", "join"):
            out = curate(ray.data.from_arrow(docs), languages=None,
                         min_quality=0.0, near_dup=False,
                         filter_mode=mode, line_dedup_min_docs=2,
                         decontam_ds=ray.data.from_arrow(bench),
                         decontam_ngram=5)
            rows = {r["doc_id"]: r["text"] for r in out.take_all()}
            # doc 2 contaminated (5-gram overlap), doc 3 emptied by the
            # line strip; survivors have the boilerplate line removed
            assert sorted(rows) == [0, 1], mode
            assert rows[0] == "real body zero"
            assert rows[1] == "real body one"


def test_curate_c4_stage(ray_session):
    import ray

    from geoflow.pipelines.curation import curate
    docs = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": ["Good first sentence with enough words.\n"
                 "nav junk\n"
                 "Another proper sentence that is kept!\n"
                 "Third proper sentence keeps the page alive.",
                 "Contains a curly { bracket so the page dies.\n"
                 "Another proper sentence that is kept!\n"
                 "Third proper sentence keeps the page alive."],
    })
    out = curate(ray.data.from_arrow(docs), languages=None,
                 min_quality=0.0, near_dup=False,
                 c4_rules=True).take_all()
    assert [r["doc_id"] for r in out] == [1]
    assert out[0]["text"] == (
        "Good first sentence with enough words.\n"
        "Another proper sentence that is kept!\n"
        "Third proper sentence keeps the page alive.")
