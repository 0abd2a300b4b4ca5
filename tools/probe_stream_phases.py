"""Phase-split probe for the heavy streaming rows (r16, guide §1):
breaks streaming_incremental_dedup / streaming_intake_pipeline into
stage / artifact / statics / drain / read phases, and (with --epochs)
re-runs the per-epoch handle body with timers around the exact stage,
near stage, and the three commit writes.

Probe only -- mirrors the query code without replacing it; results feed
OPTIMIZATION_r16.md. Usage:
    python tools/probe_stream_phases.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rlink_rs_spark.session import get_spark


def t(label: str, fn, out: dict):
    t0 = time.time()
    r = fn()
    dt = time.time() - t0
    out[label] = round(dt, 3)
    print(f"  {label:28s} {dt:7.3f}s", flush=True)
    return r


def probe_incremental_dedup(spark, sf_dir: str, with_quality: bool) -> dict:
    import tempfile

    from rlink_rs_spark.operators.dedup import load_or_build_band_index, with_shingles
    from rlink_rs_spark.queries.dedup import (
        _BANDS,
        _INCR_THR,
        _N_HASHES,
        _documents_fingerprint,
    )
    from rlink_rs_spark.streaming.dedup import (
        read_verdicts,
        streaming_incremental_dedup_sink,
    )
    from rlink_rs_spark.streaming.sources import file_stream
    from rlink_rs_spark.tables import load_table

    name = "intake" if with_quality else "sdedup"
    print(f"--- {name} phase split", flush=True)
    out: dict = {}
    docs = load_table(spark, sf_dir, "documents")
    history = docs.where(F.col("doc_id") % 4 != 0)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fp = _documents_fingerprint(sf_dir)
    hist_banded = t(
        "artifact_band_index",
        lambda: load_or_build_band_index(
            spark,
            with_shingles(history),
            cache_dir=os.path.join(repo_root, "artifacts", "lsh_band_index"),
            fingerprint=fp,
            n_hashes=_N_HASHES,
            bands=_BANDS,
        ),
        out,
    )

    score_fn = None
    if with_quality:
        from rlink_rs_spark.operators.lm import (
            load_or_train_lm_lut,
            normalize_expr,
            score_stream_columns,
        )
        from rlink_rs_spark.queries.lm import _QG_THR_CENTI, LM_SCALE, bigram_rows

        def build_lut():
            return load_or_train_lm_lut(
                spark,
                bigram_rows(
                    docs.where((F.col("lang") == "en") & (F.col("doc_id") % 4 != 0))
                ),
                cache_dir=os.path.join(repo_root, "artifacts", "lm_lut"),
                fingerprint=fp,
            )

        lut, pre_lut = t("artifact_lm_lut", build_lut, out)
        lut_pairs = t("lut_collect", lambda: [(r.bg, r.lp) for r in lut.collect()], out)
        pre_pairs = [(r.pre, r.lp) for r in pre_lut.collect()]

        def score_fn(batch_df):
            normed = batch_df.select(
                "doc_id", normalize_expr("text").alias("norm")
            ).where(F.length("norm") >= 2)
            n_bigrams, sum_lp = score_stream_columns(lut_pairs, pre_pairs)
            return normed.select(
                "doc_id",
                ((-sum_lp) * 100 <= n_bigrams * (_QG_THR_CENTI * LM_SCALE)).alias(
                    "passes"
                ),
            )

    # statics, timed separately from the drain by materializing them first
    # (the sink would otherwise build them inside epoch 0)
    hist_hashes = history.select(F.md5("text").alias("h")).distinct().cache()
    t("static_hist_hashes", lambda: hist_hashes.count(), out)
    shingled_all = with_shingles(docs)
    corpus_sets = (
        shingled_all.groupBy("doc_id").agg(F.collect_set("shingle").alias("sh")).cache()
    )
    t("static_corpus_sets", lambda: corpus_sets.count(), out)
    hist_hashes.unpersist()
    corpus_sets.unpersist()

    src = t(
        "stage_stream",
        lambda: file_stream(
            spark, sf_dir, "documents", max_files_per_trigger=1, chunks=2, order_col="doc_id"
        ).where(F.col("doc_id") % 4 == 0),
        out,
    )
    work_dir = tempfile.mkdtemp(prefix=f"rlink_probe_{name}_")
    statics: list = []

    def drain():
        q = streaming_incremental_dedup_sink(
            src,
            history,
            hist_banded,
            with_shingles(docs),
            work_dir=work_dir,
            checkpoint=tempfile.mkdtemp(prefix=f"rlink_probe_{name}_ck_"),
            threshold=_INCR_THR,
            n_hashes=_N_HASHES,
            bands=_BANDS,
            score_fn=score_fn,
            static_frames_out=statics,
        )
        q.awaitTermination(600)
        if q.isActive:
            q.stop()
        for f in statics:
            f.unpersist()

    t("drain_total", drain, out)
    t(
        "read_verdicts_noop",
        lambda: read_verdicts(spark, work_dir, with_quality=with_quality)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        out,
    )
    print(f"  {'TOTAL':28s} {sum(out.values()):7.3f}s", flush=True)
    return out


def probe_epoch_body(spark, sf_dir: str) -> dict:
    """Re-run the per-epoch handle body (batch = docs%4==0 second half) with
    per-stage timers -- the reducible-part evidence inside one epoch."""
    from pyspark.sql.window import Window

    from rlink_rs_spark.operators.dedup import (
        band_signatures,
        minhash_signatures,
        verify_jaccard,
        with_shingles,
    )
    from rlink_rs_spark.queries.dedup import _BANDS, _INCR_THR, _N_HASHES, _documents_fingerprint
    from rlink_rs_spark.operators.dedup import load_or_build_band_index
    from rlink_rs_spark.tables import load_table

    print("--- epoch body split (single epoch, batch = 2nd-half stream chunk)", flush=True)
    out: dict = {}
    docs = load_table(spark, sf_dir, "documents")
    history = docs.where(F.col("doc_id") % 4 != 0)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hist_banded = load_or_build_band_index(
        spark,
        with_shingles(history),
        cache_dir=os.path.join(repo_root, "artifacts", "lsh_band_index"),
        fingerprint=_documents_fingerprint(sf_dir),
        n_hashes=_N_HASHES,
        bands=_BANDS,
    )
    hist_hashes = history.select(F.md5("text").alias("h")).distinct().cache()
    hist_hashes.count()
    shingled_all = with_shingles(docs)
    corpus_sets = (
        shingled_all.groupBy("doc_id").agg(F.collect_set("shingle").alias("sh")).cache()
    )
    corpus_sets.count()

    # batch = second chunk of the %4==0 stream (doc_id >= median)
    batch_all = docs.where(F.col("doc_id") % 4 == 0)
    med = batch_all.approxQuantile("doc_id", [0.5], 0.01)[0]
    batch = batch_all.where(F.col("doc_id") >= med).select("doc_id", "text").cache()
    t("batch_cache", lambda: batch.count(), out)

    w = Window.partitionBy("h")
    bh = batch.select("doc_id", F.md5("text").alias("h")).withColumn(
        "min_id", F.min("doc_id").over(w)
    )
    known = hist_hashes
    ex = bh.join(known.withColumn("in_known", F.lit(True)), "h", "left").select(
        "doc_id",
        "h",
        (F.coalesce("in_known", F.lit(False)) | (F.col("min_id") < F.col("doc_id"))).alias(
            "exact_dup"
        ),
    )
    t("exact_stage_noop", lambda: ex.write.format("noop").mode("overwrite").save(), out)

    batch_banded = band_signatures(
        minhash_signatures(with_shingles(batch), n_hashes=_N_HASHES),
        n_hashes=_N_HASHES,
        bands=_BANDS,
    ).cache()
    t("batch_banded_cache", lambda: batch_banded.count(), out)
    bb = batch_banded.select(F.col("doc_id").alias("id_a"), "band", "sig")
    earlier = hist_banded.select(F.col("doc_id").alias("id_b"), "band", "sig")
    cands_prior = bb.join(earlier, ["band", "sig"]).select("id_a", "id_b")
    cands_self = (
        bb.join(
            batch_banded.select(F.col("doc_id").alias("id_b"), "band", "sig"),
            ["band", "sig"],
        )
        .where(F.col("id_b") < F.col("id_a"))
        .select("id_a", "id_b")
    )
    cands = cands_prior.unionByName(cands_self).distinct()
    near = (
        verify_jaccard(cands, shingled_all, threshold=_INCR_THR, sets=corpus_sets)
        .groupBy(F.col("id_a").alias("doc_id"))
        .agg(F.min("id_b").alias("near_dup_of"))
    )
    t("near_stage_noop", lambda: near.write.format("noop").mode("overwrite").save(), out)

    verdict = ex.join(near, "doc_id", "left").select(
        "doc_id",
        "exact_dup",
        "near_dup_of",
        (~F.col("exact_dup") & F.col("near_dup_of").isNull()).alias("admit"),
    )
    import tempfile

    wd = tempfile.mkdtemp(prefix="rlink_probe_epoch_")
    t(
        "verdict_write",
        lambda: verdict.write.mode("overwrite").parquet(os.path.join(wd, "out")),
        out,
    )
    t(
        "hash_state_write",
        lambda: ex.select("doc_id", "h").write.mode("overwrite").parquet(os.path.join(wd, "h")),
        out,
    )
    t(
        "band_state_write",
        lambda: batch_banded.write.mode("overwrite").parquet(os.path.join(wd, "b")),
        out,
    )
    batch.unpersist()
    batch_banded.unpersist()
    hist_hashes.unpersist()
    corpus_sets.unpersist()
    print(f"  {'TOTAL':28s} {sum(out.values()):7.3f}s", flush=True)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2:] or ["sdedup", "intake", "epoch"]
    spark = get_spark("probe_stream_phases")
    for w in which:
        if w == "sdedup":
            probe_incremental_dedup(spark, sf_dir, with_quality=False)
        elif w == "intake":
            probe_incremental_dedup(spark, sf_dir, with_quality=True)
        elif w == "epoch":
            probe_epoch_body(spark, sf_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
