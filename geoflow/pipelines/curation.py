"""End-to-end web-corpus curation pipeline.

Chains the engine's training-data primitives into the standard
corpus-cleaning sequence a 100-TB pretraining pipeline runs (the
reference has no corpus pipeline — this is the engine's own composite,
like the flagship spatial pipeline):

  1. language filter — vectorized n-gram/stopword language ID
     (text/analysis.langid_batch), keep the requested language(s);
  2. quality filter — RE2-kernel quality score, keep >= threshold;
  3. exact dedup — broadcast-winner shape, payload never shuffles
     (text/dedup.exact_dedup); run as a separate stage only when the
     near-dup stage is off — LSH subsumes it (identical texts collide
     in every band with certainty and the same min key survives);
  4. near-dup removal — MinHash-LSH candidate pairs (16-byte shuffle
     rows); a doc is dropped iff it has a SMALLER near-dup partner
     ("keep the locally-minimal member"), the no-connected-components
     rule used in production dedup when only pairwise candidates are
     available: at least the minimum of every duplicate cluster always
     survives, and no surviving pair of direct near-dups remains;
  5. blocklist — Bloom-prefiltered exact ANTI-join against a key
     blocklist (join/semijoin.bloom_semi_join, anti=True);
  6. per-source cap — grouped_topk keeps the k best-quality docs per
     source (ops/grouped.grouped_topk), the domain-cap step that stops
     any single host from dominating the corpus.

Scale shape (100 TB): every stage is lazy map_batches / tiny-key
shuffles over the one Dataset — the text payload never enters a
shuffle (LSH ships 16-byte (key, band-bucket) rows; dedup winner /
loser key sets are broadcast via ray.put at 8 B per key with a
per-worker-process fetch cache). The filtered lineage is deliberately
left lazy and re-executed by the dedup/near-dup passes: a second
column-pruned parquet read is far cheaper at scale than materializing
the text payload to the object store (same trade exact_dedup itself
documents). The loser-key broadcast is bounded by 8 B x dropped docs;
beyond object-store capacity swap stage 4's filter for the
key-partitioned hash join exactly as text/dedup.py:69-74 describes.

Stage semantics are individually oracle-gated by the driver queries
(langid, quality, dedup_exact, near_dup, semi_join, grouped_topk);
the composite is gated end-to-end by `curation` (filters + dedup +
blocklist + cap over the real documents table) and `curation_neardup`
(planted near-dup corpus exercising stages 3-4), plus planted
fixtures in tests/test_curation.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["curate", "make_filter_fn", "neardup_loser_keys"]


def make_filter_fn(text_col="text", languages=("en",), min_quality=0.0):
    """Batch fn for stages 1+2: appends ``quality_score`` and keeps rows
    passing the quality threshold and (if ``languages``) the language-ID
    filter. Shared by curate() and the resumable job CLI
    (jobs/run_curation.py) so both apply bit-identical semantics."""
    from ..text.analysis import langid_batch, quality_batch

    langs = sorted(set(languages)) if languages else None

    def filter_stage(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch, text_col=text_col)
        score = q.column("quality_score")
        keep = pc.greater_equal(score, pa.scalar(float(min_quality)))
        if langs is not None:
            lb = langid_batch(batch, text_col=text_col)
            lang_ok = pc.is_in(lb.column("lang_pred"),
                               value_set=pa.array(langs))
            keep = pc.and_(keep, lang_ok)
        out = batch.append_column("quality_score", score)
        return out.filter(keep)

    return filter_stage


def neardup_loser_keys(ds, key_col="doc_id", text_col="text"):
    """Dataset of ``loser`` keys: every doc with a SMALLER MinHash-LSH
    near-dup partner (including exact duplicates — identical texts
    collide in every band with certainty). Dropping these keys from
    ``ds`` is the whole dedup step. Computed pair-free via
    text/dedup.lsh_loser_keys (per-bucket non-min emission — identical
    loser set, no O(family²) pair materialization). The key list may
    contain repeats (one per bucket), which every consumer here
    tolerates (np.unique on the broadcast path, duplicate-safe
    anti-join on the join path)."""
    from ..text.dedup import MinHasher, lsh_loser_keys

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({key_col: batch.column(key_col),
                         "text": batch.column(text_col)})

    sigs = ds.map_batches(project, batch_format="pyarrow") \
        .map_batches(MinHasher(), batch_format="pyarrow")
    return lsh_loser_keys(sigs, key_col=key_col)


def curate(docs_ds, key_col="doc_id", text_col="text", source_col=None,
           languages=("en",), min_quality=0.0, near_dup=True,
           blocklist_ds=None, blocklist_key=None, per_source_cap=None,
           filter_mode="broadcast", line_dedup_min_docs=None,
           decontam_ds=None, decontam_ngram=13, c4_rules=False):
    """documents Dataset → curated documents Dataset (same columns,
    plus ``quality_score`` whenever a quality/language filter or the
    per-source cap is active). See module docstring for the stage
    sequence;
    every stage is optional via its parameter (``languages=None`` skips
    language ID, ``min_quality=0`` keeps the score column but drops
    nothing, ``near_dup=False`` / ``blocklist_ds=None`` /
    ``per_source_cap=None`` skip their stages).

    filter_mode picks the key-filter machinery for the dedup winner /
    near-dup loser / blocklist stages: "broadcast" (default — sorted
    key arrays via ray.put, bounded at 8 B/key of object store) or
    "join" (key-partitioned hash joins via partitioned_key_filter —
    the payload crosses the wire once per filtered stage, but nothing
    is driver-materialized at ANY key cardinality; the 10-TB+ setting
    for duplicate-heavy corpora).

    Two optional pre-stages (session-6 operators): ``line_dedup_min_docs``
    strips boilerplate lines repeated across >= that many docs
    (text/linededup.py) BEFORE anything reads the text — quality
    scores and dedup hashes then see the cleaned text;
    ``decontam_ds`` drops docs sharing any ``decontam_ngram``-gram
    with the given benchmark Dataset (text/decontaminate.py), using
    the broadcast or join route per ``filter_mode``. ``c4_rules``
    applies the C4 heuristic page/line cleaning (text/c4.py) in place
    before everything else."""
    from ..text.dedup import _winner_cache_get, exact_dedup

    # 0: C4 heuristic cleaning (text/c4.py) — the raw-page rule set
    # runs FIRST (its page rules are defined on the uncleaned text);
    # purely doc-local, so it fuses into the read as one map stage
    if c4_rules:
        from ..text.c4 import c4_clean
        docs_ds = c4_clean(docs_ds, text_col=text_col, out_col=None)

    # 0a: boilerplate line strip (text-mutating — must precede every
    # stage that reads the text)
    if line_dedup_min_docs is not None:
        from ..text.linededup import line_dedup as _line_dedup
        cleaned = _line_dedup(docs_ds, text_col=text_col,
                              min_docs=line_dedup_min_docs,
                              out_col="__clean_text")

        def swap(batch: pa.Table) -> pa.Table:
            i = batch.schema.get_field_index(text_col)
            return batch.set_column(
                i, text_col, batch.column("__clean_text")) \
                .drop_columns(["__clean_text"])

        docs_ds = cleaned.map_batches(swap, batch_format="pyarrow")

    # 0b: benchmark decontamination
    if decontam_ds is not None:
        from ..text.decontaminate import decontaminate
        docs_ds = decontaminate(
            docs_ds, decontam_ds, text_col=text_col, key_col=key_col,
            n=decontam_ngram,
            mode="join" if filter_mode == "join" else "broadcast")

    # 1+2: language + quality in ONE map stage (both are per-row
    # vectorized kernels; fusing avoids a second pass over the text).
    # Skipped entirely when nothing downstream needs the score — the
    # filtered lineage re-executes per dedup pass, so a no-op filter
    # would still pay the quality kernels several times over.
    needs_filter = (languages is not None or min_quality > 0
                    or (per_source_cap is not None
                        and source_col is not None))
    ds = docs_ds
    if needs_filter:
        ds = ds.map_batches(
            make_filter_fn(text_col, languages, min_quality),
            batch_format="pyarrow")

    # 3: exact dedup (min-key winner per identical text). When the LSH
    # stage runs it SUBSUMES exact dedup — identical texts have
    # identical signatures, hence collide in every band with certainty,
    # and the drop-iff-smaller-partner rule keeps exactly the min key —
    # so the separate stage (two dataset passes + a groupby shuffle) is
    # skipped and one dedup machinery handles both.
    if not near_dup:
        ds = exact_dedup(ds, text_col=text_col, key_col=key_col,
                         winner_mode=filter_mode)

    # 4: near-dup removal — drop docs with a smaller LSH partner.
    # Signatures are computed over a (key, text) projection so the other
    # payload columns never reach the signature stage; lsh_band_pairs
    # then shuffles only 16-byte (key, bucket) rows.
    if near_dup:
        import ray

        loser_ds = neardup_loser_keys(ds, key_col=key_col,
                                      text_col=text_col)

        if filter_mode == "join":
            # fully-distributed drop: anti-join the corpus against the
            # loser keys (duplicate-safe in anti mode — no dedup pass)
            from ..join.semijoin import partitioned_key_filter
            ds = partitioned_key_filter(ds, loser_ds, "loser",
                                        big_key_col=key_col, anti=True)
            return _finish(ds, blocklist_ds, blocklist_key, key_col,
                           source_col, per_source_cap, filter_mode)

        loser_parts = [
            b.column("loser").to_numpy(zero_copy_only=False)
            for b in loser_ds.iter_batches(batch_format="pyarrow")]
        loser_keys = np.unique(np.concatenate(loser_parts)) \
            if loser_parts else np.empty(0, np.int64)
        ref = ray.put(loser_keys)

        def drop_losers(batch: pa.Table) -> pa.Table:
            lk = _winner_cache_get(ref)
            keys = batch.column(key_col).to_numpy(zero_copy_only=False)
            if len(lk) == 0:
                return batch
            pos = np.clip(np.searchsorted(lk, keys), 0, len(lk) - 1)
            return batch.filter(pa.array(~(lk[pos] == keys)))

        ds = ds.map_batches(drop_losers, batch_format="pyarrow")

    return _finish(ds, blocklist_ds, blocklist_key, key_col, source_col,
                   per_source_cap, filter_mode)


def _finish(ds, blocklist_ds, blocklist_key, key_col, source_col,
            per_source_cap, filter_mode):
    """Stages 5 (blocklist anti-join) + 6 (per-source quality cap)."""
    # 5: blocklist anti-join
    if blocklist_ds is not None:
        if filter_mode == "join":
            from ..join.semijoin import partitioned_key_filter
            ds = partitioned_key_filter(ds, blocklist_ds,
                                        blocklist_key or key_col,
                                        big_key_col=key_col, anti=True)
        else:
            from ..join.semijoin import bloom_semi_join
            ds = bloom_semi_join(ds, blocklist_ds,
                                 blocklist_key or key_col,
                                 big_key_col=key_col, anti=True)

    # 6: per-source cap by quality (ties by key — deterministic)
    if per_source_cap is not None and source_col is not None:
        from ..ops.grouped import grouped_topk
        ds = grouped_topk(ds, source_col, "quality_score",
                          per_source_cap, tie_col=key_col)

    return ds
