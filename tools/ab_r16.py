"""Interleaved A/B harness for the r16 optimization candidates: builds the
OLD wiring inline (pre-change operator composition) and the NEW wiring
(current registry code), then alternates noop-sink executions in ONE JVM,
reporting per-variant min-of-N -- the ambient-drift-immune methodology from
r15. Streaming variants run the full query with fresh work dirs per round.

Usage: python tools/ab_r16.py [sf_dir] [rounds] target [target ...]
Targets: minhash, ngram_jaccard, containment, simhash, incr_batch,
         bpe_train, bpe_tokenize, sdedup_stream, intake_stream
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rlink_rs_spark.queries import REGISTRY
from rlink_rs_spark.session import get_spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


# --- old wirings (pre-r16), inline ------------------------------------------

def old_minhash(spark, sf_dir):
    from rlink_rs_spark.operators.dedup import (
        band_signatures,
        minhash_signatures,
        verify_jaccard,
        with_shingles,
    )
    from rlink_rs_spark.queries.dedup import _BANDS, _N_HASHES
    from rlink_rs_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    shingled = with_shingles(docs)
    sigs = minhash_signatures(shingled, n_hashes=_N_HASHES)
    banded = band_signatures(sigs, n_hashes=_N_HASHES, bands=_BANDS)  # no cache
    left, right = banded.alias("a"), banded.alias("b")
    cands = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    return verify_jaccard(cands, shingled, threshold=0.7)  # grouped sets


def old_ngram_jaccard(spark, sf_dir):
    from rlink_rs_spark.operators.dedup import ngram_jaccard_pairs, with_shingles
    from rlink_rs_spark.queries.dedup import _MAX_DF
    from rlink_rs_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(with_shingles(docs), threshold=0.6, max_df=_MAX_DF)


def old_containment(spark, sf_dir):
    from rlink_rs_spark.operators.dedup import postings_pair_counts, with_shingles
    from rlink_rs_spark.queries.dedup import _CONT_K, _CONT_THR, _MAX_DF
    from rlink_rs_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = with_shingles(docs, k=_CONT_K)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n_sh"))
    und = (
        postings_pair_counts(sh, max_df=_MAX_DF)
        .join(sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .where(
            (F.col("common") >= F.lit(_CONT_THR) * F.col("na"))
            | (F.col("common") >= F.lit(_CONT_THR) * F.col("nb"))
        )
    )
    fwd = und.where(F.col("common") >= F.lit(_CONT_THR) * F.col("na")).select(
        "id_a", "id_b", "common", F.col("na").alias("n_a")
    )
    rev = und.where(F.col("common") >= F.lit(_CONT_THR) * F.col("nb")).select(
        F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "common",
        F.col("nb").alias("n_a"),
    )
    return fwd.unionAll(rev).select(
        "id_a", "id_b", "common", "n_a",
        (F.col("common").cast("double") / F.col("n_a").cast("double")).alias("containment"),
    )


def old_simhash(spark, sf_dir):
    from rlink_rs_spark.operators.dedup import simhash, with_shingles
    from rlink_rs_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sims = simhash(with_shingles(docs))
    # old pigeonhole banding without the cache
    n_blocks, width = 4, 8
    mask = (1 << width) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(b).alias("blk"),
                F.shiftright("simhash", b * width).bitwiseAND(F.lit(mask)).alias("val"),
            )
            for b in range(n_blocks)
        ]
    )
    exploded = sims.select(
        F.col("doc_id"), F.col("simhash"), F.explode(blocks).alias("b")
    ).select("doc_id", "simhash", "b.blk", "b.val")
    a = exploded.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("sim_a"), "blk", "val"
    )
    b = exploded.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("sim_b"), "blk", "val"
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return (
        a.join(b, ["blk", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= 3)
        .distinct()
    )


def old_incr_batch(spark, sf_dir):
    from pyspark.sql import Window

    from rlink_rs_spark.operators.dedup import (
        band_signatures,
        load_or_build_band_index,
        minhash_signatures,
        verify_jaccard,
        with_shingles,
    )
    from rlink_rs_spark.queries.dedup import (
        _BANDS,
        _INCR_THR,
        _N_HASHES,
        _documents_fingerprint,
    )
    from rlink_rs_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    history = docs.where(F.col("doc_id") % 4 != 0)
    batch = docs.where(F.col("doc_id") % 4 == 0)
    hist_hashes = history.select(F.md5("text").alias("h")).distinct()
    w = Window.partitionBy("h")
    bh = batch.select("doc_id", F.md5("text").alias("h")).withColumn(
        "min_id", F.min("doc_id").over(w)
    )
    ex = bh.join(hist_hashes.withColumn("in_hist", F.lit(True)), "h", "left").select(
        "doc_id",
        (F.coalesce("in_hist", F.lit(False)) | (F.col("min_id") < F.col("doc_id"))).alias(
            "exact_dup"
        ),
    )
    shingled_all = with_shingles(docs)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hist_banded = load_or_build_band_index(
        spark,
        with_shingles(history),
        cache_dir=os.path.join(repo_root, "artifacts", "lsh_band_index"),
        fingerprint=_documents_fingerprint(sf_dir),
        n_hashes=_N_HASHES,
        bands=_BANDS,
    )
    batch_banded = band_signatures(
        minhash_signatures(with_shingles(batch), n_hashes=_N_HASHES),
        n_hashes=_N_HASHES,
        bands=_BANDS,
    ).cache()
    bb = batch_banded.select(F.col("doc_id").alias("id_a"), "band", "sig")
    hb = hist_banded.select(F.col("doc_id").alias("id_b"), "band", "sig")
    cands_hist = bb.join(hb, ["band", "sig"]).select("id_a", "id_b").distinct()
    bb2 = batch_banded.select(F.col("doc_id").alias("id_b"), "band", "sig")
    cands_batch = (
        bb.join(bb2, ["band", "sig"])
        .where(F.col("id_b") < F.col("id_a"))
        .select("id_a", "id_b")
        .distinct()
    )
    cands = cands_hist.unionByName(cands_batch).distinct()
    near = (
        verify_jaccard(cands, shingled_all, threshold=_INCR_THR)  # grouped sets
        .groupBy(F.col("id_a").alias("doc_id"))
        .agg(F.min("id_b").alias("near_dup_of"))
    )
    return ex.join(near, "doc_id", "left").select(
        "doc_id", "exact_dup", "near_dup_of",
        (~F.col("exact_dup") & F.col("near_dup_of").isNull()).alias("admit"),
    )


def old_bpe_train(spark, sf_dir):
    """Pre-r16 trainer: eager localCheckpoint per merge apply."""
    from rlink_rs_spark.operators.text import BPE_SEP
    from rlink_rs_spark.queries.text import _BPE_MERGES
    from rlink_rs_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_merges = _BPE_MERGES
    words = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    chars = F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    sep2 = BPE_SEP + BPE_SEP
    cur = words.select(
        "freq",
        F.concat(F.lit(BPE_SEP), F.concat_ws(sep2, chars), F.lit(BPE_SEP)).alias("s"),
    ).localCheckpoint(eager=True)
    merges = []
    pair_structs = F.expr(
        "transform(sequence(1, size(a) - 1), "
        "i -> struct(element_at(a, i) AS l, element_at(a, i + 1) AS r))"
    )
    for t in range(1, n_merges + 1):
        arr = cur.withColumn(
            "a", F.split(F.expr("substring(s, 2, length(s) - 2)"), sep2)
        ).where(F.size("a") >= 2)
        pairs = arr.select("freq", F.explode(pair_structs).alias("p")).select(
            "freq", "p.l", "p.r"
        )
        best = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()[0]
        )
        merges.append((t, best.l, best.r, best.cnt))
        if t == n_merges:
            break
        cur = cur.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(BPE_SEP + best.l + sep2 + best.r + BPE_SEP),
                F.lit(BPE_SEP + best.l + best.r + BPE_SEP),
            ),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, schema="iteration int, left_sym string, right_sym string, pair_count long"
    )


def old_bpe_tokenize(spark, sf_dir):
    from rlink_rs_spark.operators.repartition import fan_out
    from rlink_rs_spark.operators.text import apply_bpe_token_counts
    from rlink_rs_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    rules = old_bpe_train(spark, sf_dir).orderBy("iteration").collect()
    return apply_bpe_token_counts(
        fan_out(docs), [(r.left_sym, r.right_sym) for r in rules]
    )


# --- streaming variants: full query, old = corpus_sets_df omitted ------------

def _stream_dedup(spark, sf_dir, with_quality: bool, new: bool):
    import tempfile

    from rlink_rs_spark.operators.dedup import (
        load_or_build_band_index,
        shingle_sets,
        with_shingles,
    )
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

    docs = load_table(spark, sf_dir, "documents")
    history = docs.where(F.col("doc_id") % 4 != 0)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fp = _documents_fingerprint(sf_dir)
    hist_banded = load_or_build_band_index(
        spark,
        with_shingles(history),
        cache_dir=os.path.join(repo_root, "artifacts", "lsh_band_index"),
        fingerprint=fp,
        n_hashes=_N_HASHES,
        bands=_BANDS,
    )
    score_fn = None
    if with_quality:
        from rlink_rs_spark.operators.lm import (
            load_or_train_lm_lut,
            normalize_expr,
            score_stream_columns,
        )
        from rlink_rs_spark.queries.lm import _QG_THR_CENTI, LM_SCALE, bigram_rows

        lut, pre_lut = load_or_train_lm_lut(
            spark,
            bigram_rows(docs.where((F.col("lang") == "en") & (F.col("doc_id") % 4 != 0))),
            cache_dir=os.path.join(repo_root, "artifacts", "lm_lut"),
            fingerprint=fp,
        )
        lut_pairs = [(r.bg, r.lp) for r in lut.collect()]
        pre_pairs = [(r.pre, r.lp) for r in pre_lut.collect()]

        def score_fn(batch_df):
            normed = batch_df.select(
                "doc_id", normalize_expr("text").alias("norm")
            ).where(F.length("norm") >= 2)
            n_bigrams, sum_lp = score_stream_columns(lut_pairs, pre_pairs)
            return normed.select(
                "doc_id",
                ((-sum_lp) * 100 <= n_bigrams * (_QG_THR_CENTI * LM_SCALE)).alias("passes"),
            )

    src = file_stream(
        spark, sf_dir, "documents", max_files_per_trigger=1, chunks=2, order_col="doc_id"
    ).where(F.col("doc_id") % 4 == 0)
    work_dir = tempfile.mkdtemp(prefix="rlink_ab_sd_")
    statics: list = []
    q = streaming_incremental_dedup_sink(
        src,
        history,
        hist_banded,
        with_shingles(docs),
        work_dir=work_dir,
        checkpoint=tempfile.mkdtemp(prefix="rlink_ab_sd_ck_"),
        threshold=_INCR_THR,
        n_hashes=_N_HASHES,
        bands=_BANDS,
        score_fn=score_fn,
        static_frames_out=statics,
        # corpus_sets_df variant retired: the r16 post-commit A/B measured
        # the map-side static + per-epoch caches SLOWER on the full streaming
        # rows (see OPTIMIZATION_r16.md) and the sink reverted to the r15
        # wiring, dropping the parameter.
    )
    try:
        if not q.awaitTermination(600):
            raise TimeoutError("drain timeout")
    finally:
        if q.isActive:
            q.stop()
        for f in statics:
            f.unpersist()
    _noop(read_verdicts(spark, work_dir, with_quality=with_quality))


# --- streaming concurrency A/B (r16 session 4): old = the SAME registry
# query with the sink's concurrency seams monkeypatched serial (immediate
# pool, no-op warm threads == the sequential pre-change epoch body), new =
# code as shipped. Runs REGISTRY[...].fn so wiring matches the bench row
# exactly.

class _SerialFuture:
    def __init__(self, fn):
        self._v = fn()

    def result(self):
        return self._v


class _SerialPool:
    def __init__(self, max_workers=None):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def submit(self, fn):
        return _SerialFuture(fn)


class _NoopThread:
    def __init__(self, target=None, daemon=None):
        pass

    def start(self):
        pass

    def join(self):
        pass


class _StubThreading:
    Thread = _NoopThread


def _stream_conc(spark, sf_dir, qname: str, new: bool):
    from rlink_rs_spark.streaming import dedup as sdd

    if new:
        _noop(REGISTRY[qname].fn(spark, sf_dir))
        return
    saved_pool, saved_threading = sdd.ThreadPoolExecutor, sdd.threading
    sdd.ThreadPoolExecutor = _SerialPool
    sdd.threading = _StubThreading
    try:
        _noop(REGISTRY[qname].fn(spark, sf_dir))
    finally:
        sdd.ThreadPoolExecutor = saved_pool
        sdd.threading = saved_threading


TARGETS = {
    "minhash": (old_minhash, lambda s, d: REGISTRY["minhash_lsh_near_dup"].fn(s, d)),
    "ngram_jaccard": (old_ngram_jaccard, lambda s, d: REGISTRY["ngram_jaccard_dedup"].fn(s, d)),
    "containment": (old_containment, lambda s, d: REGISTRY["ngram_containment_pairs"].fn(s, d)),
    "simhash": (old_simhash, lambda s, d: REGISTRY["simhash_near_dup"].fn(s, d)),
    "incr_batch": (old_incr_batch, lambda s, d: REGISTRY["incremental_batch_dedup"].fn(s, d)),
    "near_dup_clusters": (None, lambda s, d: REGISTRY["near_dup_clusters"].fn(s, d)),
    "bpe_train": (old_bpe_train, lambda s, d: REGISTRY["bpe_train_merges"].fn(s, d)),
    "bpe_tokenize": (old_bpe_tokenize, lambda s, d: REGISTRY["bpe_tokenize_corpus"].fn(s, d)),
}

STREAM_TARGETS = {
    "sdedup_stream": lambda s, d, new: _stream_dedup(s, d, with_quality=False, new=new),
    "intake_stream": lambda s, d, new: _stream_dedup(s, d, with_quality=True, new=new),
    "sdedup_conc": lambda s, d, new: _stream_conc(s, d, "streaming_incremental_dedup", new),
    "intake_conc": lambda s, d, new: _stream_conc(s, d, "streaming_intake_pipeline", new),
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or list(TARGETS) + list(STREAM_TARGETS)
    spark = get_spark("ab_r16")
    results = {}
    for name in names:
        olds, news = [], []
        for r in range(rounds):
            for variant in ("old", "new"):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"{name}:{variant}:{r}")
                t0 = time.time()
                if name in STREAM_TARGETS:
                    STREAM_TARGETS[name](spark, sf_dir, variant == "new")
                else:
                    old_fn, new_fn = TARGETS[name]
                    if variant == "old" and old_fn is None:
                        continue
                    df = (old_fn if variant == "old" else new_fn)(spark, sf_dir)
                    _noop(df)
                dt = time.time() - t0
                (olds if variant == "old" else news).append(dt)
                print(f"{name:18s} {variant:3s} r{r}  {dt:7.3f}s", flush=True)
        results[name] = {
            "old_min": round(min(olds), 3) if olds else None,
            "new_min": round(min(news), 3),
            "old_all": [round(x, 3) for x in olds],
            "new_all": [round(x, 3) for x in news],
        }
    print("\n=== min-of-N summary ===")
    for name, r in results.items():
        o, n = r["old_min"], r["new_min"]
        ratio = f"{n / o:.2f}x" if o else "-"
        print(f"{name:18s} old={o} new={n} new/old={ratio}")
    import json

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
