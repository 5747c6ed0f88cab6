"""Corpus-curation operators: the steps between "raw crawl" and
"training mix" that a 100 TB LLM-data pipeline runs after dedup.

No analog in the reference (its curation is a driver-side dict and a
dbt test, ``/root/reference/dags/spurs_historic_games.py:226-229``);
these generalize the brief's training-data-pipeline surface. All pure
DataFrame compositions over the cross-engine md5 scheme
(``functions.scalar.md5_long``) so every operator carries a full
DuckDB oracle.

Scale design (100 TB):
- **Decontamination**: the benchmark side is SMALL (eval suites are
  10^4-10^6 grams) — broadcast its distinct gram set; the corpus-side
  gram stream then anti/semi-joins map-side with ZERO shuffle of the
  corpus grams. Never shuffle 100 TB of grams against a 10 MB eval set.
- **Sequence packing**: concat-and-chunk is a prefix sum — a GLOBAL
  prefix sum is one task, so pack per shard key (source here): each
  shard packs independently in parallel, which is how training shards
  are laid out anyway.
- **Per-source quotas / quantile filters**: both are one partial-agg
  shuffle keyed by source/lang; caps and thresholds are tiny frames
  that broadcast back onto the corpus scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import md5_long


def _grams_from_tokens(w: Column, n: int) -> Column:
    """Distinct word n-grams from a PRE-SPLIT token array column
    (guarded for short docs). Takes tokens, not text, on purpose: see
    :func:`hashed_grams`."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, n)),
    )
    return F.array_distinct(
        F.when(F.size(w) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def hashed_grams(
    df: DataFrame, text: Column, n: int, *keys: Column
) -> DataFrame:
    """(keys..., gh): one md5-folded distinct word n-gram per row — the
    gram stream every decontamination/novelty operator consumes.

    The split() is PROJECTED to a column before the gram transform:
    higher-order functions run interpreted (no codegen subexpression
    elimination), so an inline split inside the lambda re-tokenizes
    the doc once per gram — O(words^2) per doc, the hazard
    operators/dedup.py:55 documents (measured 3x on the gram stage
    there). This helper is the single definition of that plumbing;
    previously three operators (decontaminate, decontaminate_bloom,
    ngram_novelty) carried hand-kept inline copies.
    """
    tok = df.select(*keys, F.split(text, " ").alias("_w"))
    key_names = tok.columns[:-1]
    return tok.select(
        *key_names, F.explode(_grams_from_tokens(F.col("_w"), n)).alias("g")
    ).select(*key_names, md5_long(F.col("g")).alias("gh"))


def _overlap_report(
    docs: DataFrame, id_col: str, hits: DataFrame, min_hits: int
) -> DataFrame:
    """Left-join the per-doc hit counts back onto the corpus so clean
    docs report hits=0 (shared by both decontaminate variants)."""
    return (
        docs.select(F.col(id_col).alias("doc"))
        .join(hits, "doc", "left")
        .select(
            "doc",
            F.coalesce("hits", F.lit(0)).alias("hits"),
            (F.coalesce("hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """Per-doc benchmark-overlap report: (doc, hits, contaminated).

    The standard pretraining decontamination pass (13-gram overlap in
    GPT-3/PaLM reports; n is a parameter — the fixture corpus is
    short-sentence synthetic, so tests use smaller n): a doc is
    contaminated when >= ``min_hits`` of its distinct word n-grams
    appear anywhere in the benchmark set.

    Plan: benchmark grams -> distinct (tiny) -> BROADCAST inner join
    against the exploded corpus grams -> count distinct hits per doc ->
    right-join back onto the corpus so clean docs report hits=0. The
    corpus side never shuffles its grams; the only exchange is the
    per-doc hit count (scalar rows). Grams are md5-folded to longs so
    the broadcast table and the join keys are 8 bytes, not n-word
    strings.
    """
    bcol = bench_text_col or text_col
    bench_grams = hashed_grams(benchmark, F.col(bcol), n).distinct()
    doc_grams = hashed_grams(
        docs, F.col(text_col), n, F.col(id_col).alias("doc")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gh")
        .groupBy("doc")
        .agg(F.count_distinct("gh").alias("hits"))
    )
    return _overlap_report(docs, id_col, hits, min_hits)


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    n: int = 5,
    min_hits: int = 1,
    expected_grams: int = 100_000,
    bits_per_item: int = 10,
    num_hashes: int = 7,
) -> DataFrame:
    """``decontaminate`` for eval sets too big to broadcast as a hash
    table — EXACT same output, bloom-prefiltered plan.

    At frontier scale the eval-suite gram set runs to billions of
    entries: a broadcast hashmap is ~10x the raw key bytes and stops
    fitting, while a bloom filter at ``bits_per_item`` bits/item is an
    order of magnitude smaller. Built entirely with DataFrame ops
    (Spark's internal BloomFilterAggregate is not SQL-callable):

    1. benchmark grams explode into ``num_hashes`` xxhash64 bit
       positions and BIT_OR-aggregate into a words table of
       ``m/64`` longs — insertion-order independent (pure bit-OR), so
       deterministic, and 64 set-bits travel as one long;
    2. corpus grams probe the BROADCAST words table on word index —
       the broadcast payload is the compressed bit array (~1.6
       bytes/benchmark-gram here), never the gram keys — and survive
       only if ALL ``num_hashes`` probed bits are set;
    3. survivors (true hits + the fpp tail) meet the benchmark grams
       in an exact equi-join that removes every false positive — bloom
       filters have no false negatives, so the result is bit-identical
       to ``decontaminate`` (shared oracle).

    The survivor join is left unbroadcast deliberately: in the regime
    this variant exists for, the bench side CANNOT broadcast; the
    shuffle it pays carries survivors only, not the corpus.
    """
    bcol = bench_text_col or text_col
    m = expected_grams * bits_per_item  # filter size in bits
    seeds = F.array(*[F.lit(i) for i in range(num_hashes)])

    def with_probe(df_):
        # shiftleft's shift amount must be a column-side expression:
        # SQL-string form, since the python API only takes int literals
        return df_.withColumn(
            "pos", F.pmod(F.xxhash64(F.col("gh"), F.col("seed")), F.lit(m))
        ).select(
            *df_.columns,
            F.expr("CAST(pos DIV 64 AS LONG)").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS LONG), CAST(pos % 64 AS INT))").alias(
                "mask"
            ),
        )

    # consumed TWICE (bloom words build + exact verify join): without
    # the checkpoint the whole benchmark tokenize+explode+md5+distinct
    # lineage runs two full passes — in exactly the billions-of-grams
    # regime this variant exists for
    bench_grams = (
        hashed_grams(benchmark, F.col(bcol), n)
        .distinct()
        .localCheckpoint(eager=False)
    )
    words = (
        with_probe(bench_grams.select("gh", F.explode(seeds).alias("seed")))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )
    doc_grams = hashed_grams(
        docs, F.col(text_col), n, F.col(id_col).alias("doc")
    )
    survivors = (
        with_probe(doc_grams.select("doc", "gh", F.explode(seeds).alias("seed")))
        .join(F.broadcast(words), "word_idx")
        .filter(F.col("bits").bitwiseAND(F.col("mask")) != 0)
        .groupBy("doc", "gh")
        # DISTINCT seeds, not row count: a duplicated doc row (or a
        # repeated gram within one doc) multiplies the probe rows, and
        # a plain count == num_hashes then REJECTS true hits — a bloom
        # false negative, which the exact verify join cannot repair
        # (differential-fuzzer find)
        .agg(F.count_distinct("seed").alias("k_hits"))
        .filter(F.col("k_hits") == num_hashes)  # ALL probes must hit
        .select("doc", "gh")
    )
    hits = (
        survivors.join(bench_grams, "gh")  # exact: kills bloom FPs
        .groupBy("doc")
        .agg(F.count_distinct("gh").alias("hits"))
    )
    return _overlap_report(docs, id_col, hits, min_hits)


def pack_sequences(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shard_col: str,
    capacity: int = 256,
) -> DataFrame:
    """Concat-and-chunk packing plan: which context-window bin does each
    doc's first token land in, per shard.

    The classic pretraining layout: concatenate documents in a
    deterministic pseudo-random order (md5 of the id — a stable
    shuffle), then cut every ``capacity`` tokens. Returns per-bin
    stats: (shard, bin, n_docs, bin_tokens, spans_boundary) where
    ``spans_boundary`` counts docs split across a chunk edge.

    Scale: packing is a prefix sum, and a global prefix sum is ONE
    task — so the order/cumsum window partitions by the shard key and
    each shard packs independently (training shards are written per
    shard anyway). Token counts are whitespace tokens here; swap the
    token expression for a real tokenizer count column when available.
    """
    # a doc without text has no tokens to pack (its NULL n_tok would
    # poison every later offset in its shard's running sum) and one
    # without a shard key cannot be routed — excluded, mirrored in the
    # oracle (differential-fuzzer find)
    toks = docs.filter(
        F.col(text_col).isNotNull() & F.col(shard_col).isNotNull()
    ).select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("doc"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tok"),
        md5_long(F.concat(F.lit("pk_"), F.col(id_col).cast("string"))).alias(
            "ord"
        ),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("ord", "doc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.select(
        "shard",
        "doc",
        "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("start_off"),
    ).select(
        "shard",
        "doc",
        "n_tok",
        (F.col("start_off") / capacity).cast("long").alias("bin"),
        (
            (F.col("start_off") / capacity).cast("long")
            != ((F.col("start_off") + F.col("n_tok") - 1) / capacity).cast("long")
        ).alias("crosses"),
    )
    return placed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("bin_tokens"),
        F.sum(F.col("crosses").cast("int")).alias("spans_boundary"),
    )


def source_quota(
    docs: DataFrame,
    id_col: str,
    source_col: str,
    quota: int,
) -> DataFrame:
    """Keep at most ``quota`` docs per source, chosen by a deterministic
    hash order (stable across retries/partitioning — never RNG).

    The CommonCrawl-style per-domain cap that stops a handful of mega
    domains dominating the mix. Returns the kept (source, doc) rows.

    Scale: one shuffle keyed by source. A mega-source's partition holds
    only that source's rows; for truly pathological single-source skew,
    pre-filter with an approximate per-source count and sample before
    the exact window (the cap makes the tail exact).
    """
    w = Window.partitionBy("source").orderBy("ord", "doc")
    return (
        docs.select(
            F.col(source_col).alias("source"),
            F.col(id_col).alias("doc"),
            md5_long(
                F.concat(F.lit("qt_"), F.col(id_col).cast("string"))
            ).alias("ord"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= quota)
        .select("source", "doc", F.col("rn").cast("int").alias("rn"))
    )


def shard_plan(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_shards: int = 16,
) -> DataFrame:
    """The training-mix export layout: a deterministic global shuffle
    into ``n_shards`` shards, reported as per-shard stats.

    shard = md5(id) % n_shards — a hash-stable permutation (identical
    across retries and partitioning, unlike RNG shuffles), which is
    both the cross-shard randomization pretraining needs AND the write
    partitioning: follow with
    ``df.repartition(n_shards, F.col("shard")).write.partitionBy("shard")``
    and each task writes exactly one shard file.

    Returns (shard, n_docs, shard_tokens, min_ord, max_ord) — the
    manifest a downstream loader uses to size epochs. Balance check:
    md5 is uniform, so shard sizes concentrate tightly around
    n/n_shards (assert via the manifest, not by faith).
    """
    ordered = docs.select(
        F.col(id_col).alias("doc"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tok"),
        md5_long(F.concat(F.lit("sh_"), F.col(id_col).cast("string"))).alias(
            "ord"
        ),
    )
    return (
        ordered.select(
            (F.col("ord") % n_shards).cast("int").alias("shard"),
            "n_tok",
            "ord",
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("shard_tokens"),
            F.min("ord").alias("min_ord"),
            F.max("ord").alias("max_ord"),
        )
    )


def mixture_sample(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    weights: dict[str, float],
    token_budget: int,
) -> DataFrame:
    """Downsample each group toward a target token MIXTURE: group g
    gets ~``token_budget * weights[g]`` tokens, never upsampled.

    The training-mix step: per-group keep-rate = min(1, target_g /
    available_g), inclusion decided by a uniform md5 bucket per doc —
    hash-stable (same sample across retries, partitionings, engines),
    never RNG. Groups absent from ``weights`` are dropped (rate 0).

    Determinism contract: the rate is floored to an integer
    per-million threshold and compared against ``md5 % 1e6`` — pure
    integer compare, no float equality at the boundary. Both engines
    compute the threshold with the same IEEE double ops.

    Scale: one partial-agg shuffle for the per-group token totals; the
    resulting rate table broadcasts back onto the scan, so the corpus
    itself never shuffles.
    """
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tok"),
        (
            md5_long(F.concat(F.lit("mx_"), F.col(id_col).cast("string")))
            % 1_000_000
        ).alias("bucket"),
    )
    totals = toks.groupBy("grp").agg(F.sum("n_tok").alias("avail"))
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    rates = totals.select(
        "grp",
        F.floor(
            F.least(
                F.lit(1.0),
                F.lit(float(token_budget))
                * F.coalesce(wmap[F.col("grp")], F.lit(0.0))
                / F.col("avail"),
            )
            * 1_000_000
        ).cast("long").alias("threshold"),
    )
    return (
        toks.join(F.broadcast(rates), "grp")
        .filter(F.col("bucket") < F.col("threshold"))
        .select("grp", "doc", "n_tok")
    )


def quality_quantile_filter(
    docs: DataFrame,
    id_col: str,
    group_col: str,
    score: Column,
    q: float = 0.25,
) -> DataFrame:
    """Keep docs whose quality ``score`` is >= their group's q-quantile
    (exact linear-interpolated percentile, matching DuckDB
    quantile_cont bit-for-bit on integer scores).

    The per-language quality floor of a curation pipeline: absolute
    thresholds misfire across languages, so the cut adapts per group.
    Returns (group, doc, score, threshold).

    Scale: the quantile is one partial-agg shuffle per group (exact
    percentile needs the group's scores — for extreme cardinality
    groups switch to approx_percentile and accept the epsilon); the
    per-group thresholds are a tiny frame broadcast back onto the scan.
    """
    scored = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc"),
        score.alias("score"),
    )
    thresholds = scored.groupBy("grp").agg(
        F.percentile("score", F.lit(q)).alias("threshold")
    )
    return (
        scored.join(F.broadcast(thresholds), "grp")
        .filter(F.col("score") >= F.col("threshold"))
        .select("grp", "doc", "score", "threshold")
    )


def ngram_novelty(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str,
    text_col: str,
    ref_text_col: str | None = None,
    n: int = 3,
) -> DataFrame:
    """Per-doc novelty report vs a reference corpus:
    (doc, n_grams, known_grams, novelty) with novelty = 1 - known/total
    over distinct word n-grams (NULL for docs too short to have any).

    ``decontaminate``'s scoring complement: instead of flagging docs
    that overlap an eval set, this SCORES how much of each doc is
    already present in a reference corpus — the dedup-aware freshness
    signal used for data mixing (prefer high-novelty docs) and
    memorization studies (low novelty = near-verbatim of training
    data).

    Plan: identical to decontaminate — reference grams md5-folded,
    distinct, BROADCAST; corpus grams probe map-side; one per-doc
    count exchange. Integer counts divide into an exact double, so the
    oracle is bit-identical.
    """
    rcol = ref_text_col or text_col
    ref_grams = hashed_grams(reference, F.col(rcol), n).distinct()
    doc_grams = hashed_grams(
        docs, F.col(text_col), n, F.col(id_col).alias("doc")
    )
    counts = (
        doc_grams.join(
            F.broadcast(ref_grams.withColumn("known", F.lit(1))),
            "gh",
            "left",
        )
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("known").alias("known_grams"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc"))
        .join(counts, "doc", "left")
        .select(
            "doc",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("known_grams", F.lit(0)).alias("known_grams"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.lit(1.0)
                - F.col("known_grams").cast("double") / F.col("n_grams"),
            ).alias("novelty"),
        )
    )


def dsir_topk(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_slots: int = 256,
    k: int = 100,
) -> DataFrame:
    """Top-k raw-pool docs by DSIR importance weight (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling").

    DSIR scores every doc in a raw crawl by how target-like it is:
    hashed word-bigram features induce two multinomial distributions —
    p_target from the (small) target corpus, p_raw from the pool — and
    a doc's log importance weight is ``sum_b cnt[b] * (ln p_t[b] -
    ln p_r[b])`` (Laplace +1 smoothing over ``n_slots`` buckets). The
    hashing trick means NO vocabulary state: both distributions are
    ``n_slots``-row tables, broadcast everywhere.

    Determinism contract (the BM25 precedent, operators/search.py):
    the raw double weight never surfaces — ranking is ulp-robust,
    the float is not. Per-doc weights fold SEQUENTIALLY over the
    doc's slot-sorted term array (sort_array + F.aggregate, matching
    DuckDB ``list(... ORDER BY slot)`` + ``list_reduce``), so the sum
    order is pinned on both engines and across Spark retries — an
    unordered SUM over shuffled slot rows would let partial-agg order
    jitter adjacent ranks of near-tied docs. Ties break on doc id.
    Docs with no bigram (< 2 words) have no features and are excluded
    by contract.

    Returns ``(doc, n_feats, rank)``, rank 1..k by descending weight.

    Scale (100 TB): the token stream never shuffles wider than
    (doc, slot) counts — one map-combined groupBy; both distribution
    tables and the two scalar totals are broadcast; the final ranking
    uses the explicit ``global_rank_topk`` two-phase form —
    ``orderBy().limit(k)`` (TakeOrderedAndProject: per-partition
    k-row heaps, driver merge) followed by a k-row rank window — so
    no data-scale row ever crosses a SinglePartition exchange
    regardless of optimizer rewrites. Target corpora are small by
    definition.
    """
    from pyspark.sql import Window

    spark = raw.sparkSession

    def slot_stream(df: DataFrame) -> DataFrame:
        w = df.select(
            F.col(id_col).alias("doc"), F.split(text_col, " ").alias("w")
        )
        big = w.select(
            "doc",
            F.explode(
                F.when(
                    F.size("w") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("w") - 1),
                        lambda i: F.concat_ws(
                            " ", F.slice(F.col("w"), i, 2)
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("bg"),
        )
        return big.select(
            "doc", (md5_long(F.col("bg")) % n_slots).alias("slot")
        )

    t_stream = slot_stream(target)
    r_stream = slot_stream(raw)

    spine = spark.range(n_slots).select(F.col("id").alias("slot"))
    # Every raw-pool statistic derives from the ONE (doc, slot) count
    # aggregation below: cr collapses it by slot, tr sums cr, and the
    # per-doc weight fold joins it against the weight table. All four
    # consumers sit on the identical Exchange(hash(doc, slot))
    # subtree, which Spark's exchange reuse materializes once — the
    # raw corpus is tokenized, bigram-exploded, and md5-hashed exactly
    # one time (three separate slot_stream() aggregations used to cost
    # three full corpus passes). Target-side ct/tt derive the same way
    # (target corpora are small, but the shape is uniform).
    doc_slots = r_stream.groupBy("doc", "slot").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ct = (
        t_stream.groupBy("doc", "slot")
        .agg(F.count(F.lit(1)).alias("tcnt"))
        .groupBy("slot")
        .agg(F.sum("tcnt").alias("ct"))
    )
    cr = doc_slots.groupBy("slot").agg(F.sum("cnt").alias("cr"))
    tot = ct.agg(F.sum("ct").alias("tt")).crossJoin(
        cr.agg(F.sum("cr").alias("tr"))
    )
    dw = (
        spine.join(ct, "slot", "left")
        .join(cr, "slot", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "slot",
            (
                F.log(
                    (F.coalesce("ct", F.lit(0)) + 1).cast("double")
                    / (F.col("tt") + n_slots)
                )
                - F.log(
                    (F.coalesce("cr", F.lit(0)) + 1).cast("double")
                    / (F.col("tr") + n_slots)
                )
            ).alias("dw"),
        )
    )

    terms = (
        doc_slots.join(F.broadcast(dw), "slot")
        .groupBy("doc")
        .agg(
            F.sum("cnt").alias("n_feats"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("slot"),
                        (F.col("cnt") * F.col("dw")).alias("t"),
                    )
                )
            ).alias("ts"),
        )
        .select(
            "doc",
            "n_feats",
            F.aggregate(
                "ts", F.lit(0.0), lambda a, s: a + s["t"]
            ).alias("lw"),
        )
    )
    # Explicit two-phase global top-k (the global_rank_topk pattern,
    # plans/tpch_core.py): orderBy().limit(k) plans as
    # TakeOrderedAndProject — a parallel per-partition k-row heap
    # merged on the driver — and the rank window then runs over k rows
    # total. The rank-then-filter form produced the same physical
    # shape only via the LimitPushDownThroughWindow optimizer rule;
    # this form IS the safe plan with or without that rule.
    topk = terms.orderBy(F.col("lw").desc(), F.col("doc").asc()).limit(k)
    win = Window.orderBy(F.col("lw").desc(), F.col("doc").asc())
    return topk.withColumn("rank", F.row_number().over(win)).select(
        "doc", "n_feats", "rank"
    )


def decontaminate_neardup(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate benchmark contamination: corpus docs that are
    minhash-LSH-close to an eval doc, verified by exact shingle
    jaccard.

    ``decontaminate`` above catches VERBATIM n-gram overlap; paraphrase
    and light-edit contamination (the common leak once benchmarks pass
    through web pipelines) survives it. This is the near-dup
    complement: the eval set's minhash band index (small by definition)
    broadcasts; corpus band rows probe it map-side, so candidate
    generation costs one signature pass over the corpus and NO
    corpus-vs-corpus pair space. Candidates — and only candidates —
    then verify with exact jaccard over md5-hashed distinct shingles
    (eval shingle sets broadcast too).

    Returns ``(doc, eval_doc, jaccard)`` for corpus docs with verified
    jaccard >= ``threshold``; the decontaminated corpus is one
    anti-join away. Band probability: with k=16, r=4 a true pair at
    jaccard s is caught with prob 1-(1-s^4)^4 — recall is tunable with
    more hashes/bands, cost stays O(|corpus|).

    Scale (100 TB): corpus-side work is exactly one shingle explode +
    one groupBy-min signature shuffle (shared shape with
    ``minhash_bands``); everything eval-sized broadcasts. If the eval
    union outgrows broadcast, the banded index join of
    ``incremental_minhash_pairs`` applies unchanged — this operator IS
    that join with the roles fixed.
    """
    from . import dedup

    eb = dedup.minhash_bands(
        eval_df, id_col, text_col, num_hashes, band_size, n
    )
    cb = dedup.minhash_bands(
        corpus, id_col, text_col, num_hashes, band_size, n
    )
    # Candidate pairs are eval-adjacent — tiny by definition — so pin
    # them once (localCheckpoint, same bounded-metadata pattern as the
    # BPE winner rows): the pair list feeds both the verify join and
    # the corpus pre-filter below, and an unpinned plan would re-run
    # the corpus signature pass for each consumer.
    cand = (
        cb.join(
            F.broadcast(
                eb.select(
                    F.col("doc").alias("eval_doc"), "band", "bkey"
                )
            ),
            ["band", "bkey"],
        )
        .select("doc", "eval_doc")
        .distinct()
        .localCheckpoint(eager=True)
    )

    def sets(df: DataFrame, doc_out: str, arr: str, cnt: str) -> DataFrame:
        return (
            dedup._hashed_shingles(df, id_col, text_col, n)
            .groupBy("doc")
            .agg(
                F.sort_array(F.collect_list("h")).alias(arr),
                F.count(F.lit(1)).alias(cnt),
            )
            .withColumnRenamed("doc", doc_out)
        )

    # Verify ONLY candidates: semi-join the corpus down to candidate
    # docs before building exact shingle sets. Without this the
    # groupBy/collect_list in sets() tokenizes, hashes, and shuffles a
    # sorted shingle array for EVERY corpus doc — a second corpus-wide
    # pass with heavy array payloads — and the candidate filter cannot
    # be pushed below the aggregation by Catalyst.
    cand_ids = F.broadcast(
        cand.select(F.col("doc").alias(id_col)).distinct()
    )
    cs = sets(corpus.join(cand_ids, id_col, "left_semi"), "doc", "ca", "na")
    es = sets(eval_df, "eval_doc", "ea", "ne")
    inter = F.size(F.array_intersect(F.col("ca"), F.col("ea")))
    return (
        cand.join(cs, "doc")
        .join(F.broadcast(es), "eval_doc")
        .select(
            "doc",
            "eval_doc",
            (
                inter.cast("double") / (F.col("na") + F.col("ne") - inter)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def linear_quality_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_slots: int = 256,
    scale: int = 1000,
) -> DataFrame:
    """Model-based quality scoring: a linear text classifier over
    hashed bag-of-words features — the fastText-style quality filter
    (e.g. CCNet / GPT-3's "similarity to WebText" LR) every large
    training-data pipeline runs between heuristics and dedup.

    Spark-first shape: tokens hash straight to ``md5 % n_slots``
    feature slots (the hashing trick — no vocabulary state), each
    slot's weight derives from md5 too (an integer in
    ``[-scale, scale]`` — the deterministic stand-in for trained
    weights; a real deployment broadcasts its fitted weight table and
    the plan is identical), and the per-doc score is ONE map-combined
    integer SUM — no join, no vocabulary broadcast, no Python.

    Integer weights are the determinism contract: ``k/1000`` is not
    exact in binary, so summing double weights would make the score
    depend on partition order. Summing BIGINT weight units is exact
    and associative; the ONE division at the surface (mean weight per
    token) is a single correctly-rounded IEEE op on both engines.

    Returns (doc, n_tokens, score_units, score, kept): ``score`` is
    the mean per-token weight in [-1, 1], ``kept`` the binary
    classifier decision (score_units > 0).
    """
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    slot = md5_long(F.col("term")) % F.lit(n_slots)
    # weight units in [-scale, scale], keyed by slot only — stable
    # under any tokenization order and inlineable by the SQL oracle
    w = (
        md5_long(F.concat(F.lit("qw_"), slot.cast("string")))
        % F.lit(2 * scale + 1)
        - F.lit(scale)
    )
    return (
        tok.select("doc", w.alias("w"))
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").alias("score_units"),
        )
        .select(
            "doc",
            "n_tokens",
            "score_units",
            (
                F.col("score_units").cast("double")
                / (F.lit(float(scale)) * F.col("n_tokens"))
            ).alias("score"),
            (F.col("score_units") > 0).alias("kept"),
        )
    )
