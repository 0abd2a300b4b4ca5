"""Text-analysis operators for training-data pipelines (engine extras):
language ID (stopword-marker heuristic), quality scoring, token counting,
and document fingerprinting. All pure SQL expressions -- JVM-side,
codegen'd, and bit-replicable in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Deterministic tie-break: first language in this order wins ties.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # pinyin-romanized markers
}

STOPWORDS = LANG_MARKERS["en"]


def _in_list_sql(items: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in items)


def marker_count_sql(tokens: str, lang: str) -> str:
    """Count of marker-word occurrences; identical text in Spark SQL
    (filter + lambda) and DuckDB (list_filter + lambda)."""
    return f"len(list_filter({tokens}, t -> t IN ({_in_list_sql(LANG_MARKERS[lang])})))"


def argmax_case_sql() -> str:
    """Argmax over pre-projected marker-count columns c_<lang> with fixed
    precedence order; 'und' (undetermined) when no marker hits. Counts must
    be projected once upstream -- inlining them here repeats each heavy
    expression ~2x|langs| times and defeats subexpression elimination."""
    langs = list(LANG_MARKERS)
    conds = []
    for lang in langs:
        ge_all = " AND ".join(f"c_{lang} >= c_{o}" for o in langs if o != lang)
        conds.append(f"WHEN c_{lang} > 0 AND {ge_all} THEN '{lang}'")
    return "CASE " + " ".join(conds) + " ELSE 'und' END"


# --- quality scoring ---------------------------------------------------------

def quality_score_sql(n_tokens: str, n_chars: str, stop_cnt: str) -> str:
    """Quality heuristic in [0,1]: length band + mean word length band +
    stopword-ratio band, equally weighted. Integer/constant arithmetic
    then one final ROUND -> deterministic across engines."""
    mean_wl = f"(CAST({n_chars} AS DOUBLE) / {n_tokens})"
    stop_ratio = f"(CAST({stop_cnt} AS DOUBLE) / {n_tokens})"
    # Outer CAST: bare decimal literals (1.0/0.5) make Spark infer DECIMAL for
    # the whole expression while DuckDB returns DOUBLE; cast so both engines
    # agree on the output type (the driver's value hash is type-sensitive).
    return (
        "CAST(ROUND(("
        f"(CASE WHEN {n_tokens} >= 20 AND {n_tokens} <= 1000 THEN 1.0 "
        f"      WHEN {n_tokens} >= 5 THEN 0.5 ELSE 0.0 END) + "
        f"(CASE WHEN {mean_wl} >= 3.0 AND {mean_wl} <= 12.0 THEN 1.0 ELSE 0.0 END) + "
        f"(CASE WHEN {stop_ratio} >= 0.01 THEN 1.0 WHEN {stop_ratio} > 0.0 THEN 0.5 ELSE 0.0 END)"
        ") / 3.0, 4) AS DOUBLE)"
    )


# --- BPE merge training ------------------------------------------------------

BPE_SEP = "\x1f"  # ASCII unit separator: cannot appear in whitespace tokens


# Vocab-size bound for the driver-local BPE iteration path: a word-freq
# table with at most this many rows (~50 B/row -> well under a MB) trains
# locally; larger vocabularies keep the distributed loop. 4096 keeps the
# pure-Python pair fold comfortably under the per-iteration cost of even
# ONE Spark job, so the crossover cannot be mis-set by an order of
# magnitude in either direction.
_BPE_DRIVER_VOCAB_MAX = 4096


def _train_bpe_local(rows, n_merges: int):
    """Driver-local BPE iterations over the COLLECTED (freq, s) vocab
    table -- bit-identical semantics to the distributed loop: pair counts
    are exact integer sums, argmax tie-break (cnt desc, l asc, r asc)
    compares code points exactly like Spark's binary UTF8 ordering, and
    Python str.replace is the same left-to-right non-overlapping fold as
    F.replace over the separator-anchored symbol string."""
    sep, sep2 = BPE_SEP, BPE_SEP + BPE_SEP
    syms = [(r.freq, r.s) for r in rows]
    merges: list[tuple[int, str, str, int]] = []
    for t in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for freq, s in syms:
            a = s[1:-1].split(sep2)
            for l, r in zip(a, a[1:]):
                counts[(l, r)] = counts.get((l, r), 0) + freq
        # max by (cnt desc, l asc, r asc) == orderBy(cnt desc, l, r).limit(1)
        (bl, br), bc = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((t, bl, br, bc))
        if t == n_merges:
            break
        pat = sep + bl + sep2 + br + sep
        rep = sep + bl + br + sep
        syms = [(f, s.replace(pat, rep)) for f, s in syms]
    return merges


def train_bpe_merges(docs, text_col: str = "text", n_merges: int = 4):
    """Distributed BPE tokenizer training (the merge-learning loop of the
    GPT-2/sentencepiece family) as DataFrame iterations.

    Classic BPE trains on the WORD-FREQUENCY table, not the corpus: the
    corpus is scanned once into (distinct word, freq) -- at 100 TB that
    table is vocabulary-sized (millions of rows), so every training
    iteration after the first scan is corpus-size-independent. Each
    iteration: (1) adjacent-symbol pair counts weighted by word freq --
    one map-side-combined shuffle over the vocab; (2) global argmax pair
    (count desc, pair asc -- deterministic) as a 1-row driver scalar, the
    same iterative-driver pattern as connected_components' convergence
    check; (3) merge application as a map-side string replace over a
    separator-ANCHORED symbol string: each symbol is wrapped in unit
    separators (`SEP sym SEP`, adjacent symbols sharing a double SEP), so
    the replace pattern `SEP l SEP SEP r SEP` can only match whole symbols
    -- a bare `l+SEP+r` pattern would also fire when l is a SUFFIX of a
    longer symbol (e.g. rule (he,n) on symbols [the, n]), diverging from
    sequential BPE. Left-to-right non-overlapping replace == the
    sequential BPE merge fold; both engines share these semantics, so the
    DuckDB oracle matches exactly.

    Returns (iteration, left_sym, right_sym, pair_count) -- the learned
    merge table, the artifact a tokenizer ships."""
    from pyspark.sql import DataFrame

    spark = docs.sparkSession
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
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
    # Adaptive driver-local iterations (r16, guide §1.2/§2.3): the corpus
    # is scanned ONCE into the checkpointed word-freq table above; every
    # iteration after that is vocabulary-bounded. When the vocab fits a
    # small driver budget (bounded probe: take(N+1), never an unbounded
    # collect), the n_merges count+argmax round-trips -- each a scheduled
    # job with freshly codegen'd higher-order transforms, ~0.3 s of pure
    # overhead per iteration at fixture scale for a 31-word vocab -- run
    # as an exact local fold instead. Larger vocabularies (the 100 TB
    # shape: millions of distinct words) take the distributed loop below,
    # unchanged. Equivalence of the two paths is pytest-pinned.
    head = cur.take(_BPE_DRIVER_VOCAB_MAX + 1)
    if len(head) <= _BPE_DRIVER_VOCAB_MAX:
        return spark.createDataFrame(
            _train_bpe_local(head, n_merges),
            schema="iteration int, left_sym string, right_sym string, pair_count long",
        )
    merges: list[tuple[int, str, str, int]] = []
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
            # the merged symbol table is never read again after the last
            # argmax -- applying the final rule + eager checkpoint was a
            # whole wasted distributed pass (r15, guide §1.2 "don't
            # compute things you throw away")
            break
        # LAZY merge apply (r16, guide §1.2): the replace is a trivial
        # map over the vocab-sized symbol table, so re-evaluating a <=3-
        # deep replace chain inside the next iteration's count pass is
        # far cheaper than materializing the table per iteration -- the
        # old eager localCheckpoint here was one whole extra distributed
        # pass per iteration (n_merges-1 jobs dropped). Lineage stays
        # bounded: the chain grows one replace per iteration on top of
        # the single checkpointed base.
        cur = cur.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(BPE_SEP + best.l + sep2 + best.r + BPE_SEP),
                F.lit(BPE_SEP + best.l + best.r + BPE_SEP),
            ),
        )
    return spark.createDataFrame(
        merges, schema="iteration int, left_sym string, right_sym string, pair_count long"
    )


def apply_bpe_token_counts(docs, merges, text_col: str = "text", id_col: str = "doc_id"):
    """Tokenize the corpus with a TRAINED merge table (the deployment face
    of train_bpe_merges): per word, start from characters and apply each
    merge rule in training order as the same separator-anchored
    left-to-right non-overlapping replace used during training, then count
    the resulting symbols. Emits (id, n_words, n_bpe_tokens, bpe_per_word).

    ``merges`` is the collected rule list [(left_sym, right_sym), ...] in
    iteration order -- a tokenizer artifact is KBs, so the rules embed as
    literals in ONE map-side expression: tokenization is a zero-shuffle
    projection at any corpus size (the reference's flat_map shape,
    rlink/src/core/function.rs:60-76). The whole pipeline is built as a
    staged projection so each higher-order-function evaluates once."""
    sep = "chr(31)"
    sep2 = f"concat({sep}, {sep})"

    def lit(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    # SEP || c1 || SEP SEP || c2 || ... || SEP  (anchored char string)
    anchored = (
        f"concat({sep}, array_join(transform(sequence(1, length(w)), "
        f"i -> substring(w, i, 1)), {sep2}), {sep})"
    )
    applied = anchored
    for l, r in merges:
        pat = f"concat({sep}, {lit(l)}, {sep2}, {lit(r)}, {sep})"
        rep = f"concat({sep}, {lit(l + r)}, {sep})"
        applied = f"replace({applied}, {pat}, {rep})"
    # inner transform materializes each word's merged string ONCE; the outer
    # lambda only counts symbols in it
    symcnt = f"CAST(size(split(substring(s, 2, length(s) - 2), {sep2})) AS BIGINT)"
    words = F.expr(f"filter(split({text_col}, ' '), w -> w != '')")
    staged = docs.select(F.col(id_col), words.alias("__ws")).select(
        id_col,
        F.expr("size(__ws)").cast("long").alias("n_words"),
        F.expr(
            f"aggregate(transform(transform(__ws, w -> {applied}), s -> {symcnt}), "
            f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        ).alias("n_bpe_tokens"),
    )
    return staged.select(
        id_col,
        "n_words",
        "n_bpe_tokens",
        (F.col("n_bpe_tokens").cast("double") / F.col("n_words")).alias("bpe_per_word"),
    )
