"""Catalog registrations for the corpus-curation operators.

Each entry pairs ``operators.curation`` (and the embedding SemDeDup
composition) with a self-contained DuckDB oracle over the same parquet
tables. The fixture "benchmark" for decontamination is a deterministic
slice of the corpus itself (doc_id % 97 == 0) — the eval-set shape
without shipping an eval set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import md5_long_sql
from ..operators import curation, dedup
from ..sources.catalog import load_table
from .registry import register, registry

# word n-gram CTE builder (DuckDB twin of curation._grams)
def _grams_cte(src_filter: str, n: int, out: str) -> str:
    return f"""{out} AS (
  SELECT doc_id AS doc, unnest(
    CASE WHEN len(w) >= {n} THEN
      list_distinct(list_transform(
        generate_series(1, len(w) - {n - 1}),
        i -> array_to_string(w[i:i+{n - 1}], ' ')))
    ELSE [] END) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w
        FROM documents {src_filter})
)"""


_DECON_N, _DECON_MIN_HITS = 3, 3


@register(
    "corpus_decontaminate",
    group="ext-curation",
    oracle=f"""
WITH {_grams_cte("WHERE doc_id % 97 = 0", _DECON_N, "bench_grams")},
{_grams_cte("WHERE doc_id % 97 <> 0", _DECON_N, "doc_grams")},
bench AS (SELECT DISTINCT {md5_long_sql("gram")} AS gh FROM bench_grams),
hits AS (
  SELECT doc, COUNT(DISTINCT gh) AS hits FROM (
    SELECT doc, {md5_long_sql("gram")} AS gh FROM doc_grams
  ) dg JOIN bench USING (gh) GROUP BY doc
)
SELECT d.doc_id AS doc,
  CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
  COALESCE(h.hits, 0) >= {_DECON_MIN_HITS} AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc
WHERE d.doc_id % 97 <> 0
""",
    doc="Benchmark decontamination: flag corpus docs sharing >= "
    f"{_DECON_MIN_HITS} distinct {_DECON_N}-grams with the eval set "
    "(fixture eval set = doc_id % 97 == 0 slice). The benchmark gram "
    "set is BROADCAST, so the corpus grams never shuffle — the "
    "only exchange is per-doc hit counts.",
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return curation.decontaminate(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        "doc_id",
        "text",
        n=_DECON_N,
        min_hits=_DECON_MIN_HITS,
    )


@register(
    "corpus_decontaminate_bloom",
    group="ext-curation bloom",
    oracle=registry()["corpus_decontaminate"].oracle,
    doc="Decontamination for eval sets too big to broadcast as a "
    "hashmap: benchmark grams BIT_OR-aggregate into a compressed "
    "bloom words table (~1.6 bytes/gram broadcast instead of 8+ byte "
    "keys), corpus grams probe it with 7 xxhash64 functions and "
    "survive only if every bit is set, and survivors alone meet the "
    "benchmark grams in an exact join that removes bloom false "
    "positives — bit-identical to corpus_decontaminate (shared "
    "oracle); the corpus side never shuffles its grams.",
)
def corpus_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return curation.decontaminate_bloom(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        "doc_id",
        "text",
        n=_DECON_N,
        min_hits=_DECON_MIN_HITS,
    )


_PACK_CAPACITY = 256


@register(
    "corpus_pack_bins",
    group="ext-curation",
    oracle=f"""
WITH toks AS (
  SELECT source AS shard, doc_id AS doc,
    len(string_split(text, ' ')) AS n_tok,
    {md5_long_sql("'pk_' || CAST(doc_id AS VARCHAR)")} AS ord
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
placed AS (
  SELECT shard, doc, n_tok,
    SUM(n_tok) OVER (PARTITION BY shard ORDER BY ord, doc
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS start_off
  FROM toks
),
binned AS (
  SELECT shard, doc, n_tok,
    start_off // {_PACK_CAPACITY} AS bin,
    (start_off // {_PACK_CAPACITY})
      <> ((start_off + n_tok - 1) // {_PACK_CAPACITY}) AS crosses
  FROM placed
)
SELECT shard, CAST(bin AS BIGINT) AS bin,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
  CAST(SUM(CASE WHEN crosses THEN 1 ELSE 0 END) AS BIGINT)
    AS spans_boundary
FROM binned GROUP BY 1, 2
""",
    doc="Sequence packing (concat-and-chunk): documents concatenated "
    "per shard in deterministic md5 order and cut every "
    f"{_PACK_CAPACITY} tokens; per-bin doc/token/boundary stats. "
    "Prefix sum partitions by the shard key — a GLOBAL prefix sum "
    "would be one task.",
)
def corpus_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.pack_sequences(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        "source",
        capacity=_PACK_CAPACITY,
    )


_QUOTA = 30


@register(
    "corpus_source_quota",
    group="ext-curation",
    oracle=f"""
SELECT source, doc, CAST(rn AS INT) AS rn FROM (
  SELECT source, doc_id AS doc, ROW_NUMBER() OVER (
    PARTITION BY source
    ORDER BY {md5_long_sql("'qt_' || CAST(doc_id AS VARCHAR)")}, doc_id
  ) AS rn
  FROM documents
) t WHERE rn <= {_QUOTA}
""",
    doc=f"Per-source quota: keep at most {_QUOTA} docs per source in "
    "deterministic hash order (the CommonCrawl-style domain cap; "
    "hash order = retry-stable pseudo-random sample).",
)
def corpus_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.source_quota(
        load_table(spark, sf_dir, "documents"), "doc_id", "source", _QUOTA
    )


@register(
    "corpus_quality_floor",
    group="ext-curation",
    oracle="""
WITH scored AS (
  SELECT lang AS grp, doc_id AS doc, CAST(n_chars AS BIGINT) AS score
  FROM documents
),
thr AS (
  SELECT grp, quantile_cont(score, 0.25) AS threshold
  FROM scored GROUP BY grp
)
SELECT s.grp, s.doc, s.score, t.threshold
FROM scored s JOIN thr t ON s.grp = t.grp
WHERE s.score >= t.threshold
""",
    doc="Per-language quality floor: keep docs at/above their "
    "language's exact 25th-percentile score (absolute thresholds "
    "misfire across languages). Exact interpolated percentile matches "
    "quantile_cont bit-for-bit on integer scores; thresholds broadcast "
    "back onto the scan.",
)
def corpus_quality_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return curation.quality_quantile_filter(
        docs, "doc_id", "lang", F.col("n_chars").cast("long"), q=0.25
    )


# target mix: en-heavy with a fixed minority share; zh deliberately
# absent -> dropped (the "exclude a language" path)
_MIX_WEIGHTS = {"en": 0.5, "de": 0.2, "es": 0.2, "fr": 0.1}
_MIX_BUDGET = 10_000


def _mixture_oracle() -> str:
    wvals = ", ".join(f"('{g}', {w})" for g, w in _MIX_WEIGHTS.items())
    return f"""
WITH toks AS (
  SELECT lang AS grp, doc_id AS doc,
    len(string_split(text, ' ')) AS n_tok,
    {md5_long_sql("'mx_' || CAST(doc_id AS VARCHAR)")} % 1000000 AS bucket
  FROM documents
),
w(grp, wt) AS (VALUES {wvals}),
rates AS (
  -- CAST both factors AS DOUBLE: DuckDB otherwise multiplies the
  -- DECIMAL weight exactly (10000.0 * 0.2 = DECIMAL 2000.00 -> double
  -- 2000.0) where Spark's lit(10000.0) * double(0.2) is
  -- 2000.0000000000002 — a 1-ulp numerator difference feeding a FLOOR
  -- threshold, the latent class the r07b fuzzer caught in
  -- events_weighted_sample (audit find, late r07)
  SELECT t.grp, CAST(FLOOR(LEAST(1.0,
      CAST({float(_MIX_BUDGET)} AS DOUBLE) * CAST(COALESCE(w.wt, 0.0)
        AS DOUBLE) / SUM(t.n_tok)
    ) * 1000000) AS BIGINT) AS threshold
  FROM toks t LEFT JOIN w ON t.grp = w.grp
  GROUP BY t.grp, w.wt
)
SELECT t.grp, t.doc, CAST(t.n_tok AS BIGINT) AS n_tok
FROM toks t JOIN rates r ON t.grp = r.grp
WHERE t.bucket < r.threshold
"""


@register(
    "corpus_mixture_sample",
    group="ext-curation",
    oracle=_mixture_oracle(),
    doc="Training-mix sampling: downsample each language toward a "
    "target token mixture (en 50 / de 20 / es 20 / fr 10, zh dropped) "
    "within a fixed token budget — per-group keep-rates from one "
    "partial-agg shuffle, inclusion by integer md5 bucket (hash-stable "
    "across retries/engines), rate table broadcast onto the scan.",
)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.mixture_sample(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        "lang",
        _MIX_WEIGHTS,
        _MIX_BUDGET,
    )


_N_SHARDS = 16


@register(
    "corpus_shard_plan",
    group="ext-curation",
    oracle=f"""
SELECT CAST(ord % {_N_SHARDS} AS INT) AS shard,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tok) AS BIGINT) AS shard_tokens,
  CAST(MIN(ord) AS BIGINT) AS min_ord,
  CAST(MAX(ord) AS BIGINT) AS max_ord
FROM (
  SELECT len(string_split(text, ' ')) AS n_tok,
    {md5_long_sql("'sh_' || CAST(doc_id AS VARCHAR)")} AS ord
  FROM documents
) GROUP BY 1
""",
    doc=f"Training-mix shard manifest: deterministic md5 shuffle into "
    f"{_N_SHARDS} shards with per-shard doc/token counts — the layout "
    "step before the sharded write (hash permutation = retry-stable "
    "cross-shard randomization; one partial-agg shuffle).",
)
def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.shard_plan(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", _N_SHARDS
    )


# ---------------------------------------------------------------------------
# graph: integer PageRank over the minhash dup-pair graph
# ---------------------------------------------------------------------------

_PR_ITER, _PR_SCALE, _PR_NUM, _PR_DEN = 3, 1_000_000_000, 85, 100


def _pagerank_oracle() -> str:
    from .pipeline_ext import _minhash_pairs_ctes

    base = _PR_SCALE * (_PR_DEN - _PR_NUM) // _PR_DEN
    step = (
        "SELECT e.dst AS node, {base} + ({num} * SUM(r.rank // deg.d)) "
        "// {den} AS rank\n"
        "  FROM edges e JOIN {prev} r ON e.src = r.node "
        "JOIN deg ON e.src = deg.src GROUP BY e.dst"
    )
    iters = ",\n".join(
        f"r{i + 1} AS ({step.format(base=base, num=_PR_NUM, den=_PR_DEN, prev=f'r{i}')})"
        for i in range(_PR_ITER)
    )
    return f"""
WITH {_minhash_pairs_ctes()},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT src AS node, CAST({_PR_SCALE} AS BIGINT) AS rank FROM deg),
{iters}
SELECT node, CAST(rank AS BIGINT) AS rank FROM r{_PR_ITER}
"""


@register(
    "graph_pagerank_dups",
    group="ext-graph iterative",
    oracle=_pagerank_oracle(),
    doc="Integer PageRank (3 damped iterations, BIGINT floor "
    "arithmetic — bit-exact across engines/partitionings where float "
    "PageRank drifts) over the minhash dup-pair graph: high ranks are "
    "the hub documents mass boilerplate clusters orbit. The engine's "
    "second iterative algorithm beside connected components; oracle "
    "unrolls the iterations as chained CTEs.",
)
def graph_pagerank_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import integer_pagerank
    from .pipeline_ext import _BAND_SIZE, _NUM_HASHES

    pairs = dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        num_hashes=_NUM_HASHES,
        band_size=_BAND_SIZE,
    )
    return integer_pagerank(
        pairs, iterations=_PR_ITER, scale=_PR_SCALE,
        damp_num=_PR_NUM, damp_den=_PR_DEN,
    )


# ---------------------------------------------------------------------------
# SemDeDup: embedding-space semantic dedup, end to end
# ---------------------------------------------------------------------------


def _embedding_components_oracle() -> str:
    # Composed from the registered embedding-pair oracle so the pair
    # rule (sign-LSH buckets, cosine >= 0.4) cannot drift between the
    # two entries. pipeline_ext is imported before this module (see
    # plans.catalog), so the entry exists at module-import time.
    pair = registry()["dedup_embedding_cosine"].oracle
    return f"""
WITH RECURSIVE cand AS ({pair}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
nodes AS (SELECT DISTINCT src AS doc FROM edges),
walk(doc, lbl) AS (
  SELECT doc, doc FROM nodes
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON w.doc = e.src
)
SELECT e.vec_id, CAST(e.label AS INT) AS label FROM embeddings e
WHERE e.vec_id NOT IN (
  SELECT doc FROM (
    SELECT doc, MIN(lbl) AS component FROM walk GROUP BY doc
  ) WHERE doc <> component
)
"""


@register(
    "semantic_dedup_corpus",
    group="ext-curation ext-dedup iterative",
    oracle=_embedding_components_oracle(),
    doc="SemDeDup: embedding near-dup pairs (sign-LSH bucketed, cosine "
    ">= 0.4) -> connected components (min-label propagation) -> keep "
    "each cluster's min-id representative; returns the surviving "
    "embedding rows. The full semantic-dedup pass a pretraining corpus "
    "runs after exact/minhash dedup.",
)
def semantic_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = dedup.embedding_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, lsh_planes=6
    ).select("doc_a", "doc_b")
    comp = dedup.connected_components(pairs)
    drop = comp.filter(F.col("doc") != F.col("component")).select(
        F.col("doc").alias("vec_id")
    )
    return emb.select(
        "vec_id", F.col("label").cast("int").alias("label")
    ).join(drop, "vec_id", "left_anti")


# ---------------------------------------------------------------------------
# contrastive negative sampling
# ---------------------------------------------------------------------------

_NEG_B, _NEG_K, _NEG_PROBES = 64, 4, 8


@register(
    "contrastive_negatives",
    group="ext-curation sampling",
    oracle=f"""
WITH reps AS (
  SELECT {md5_long_sql("CAST(doc_id AS VARCHAR)")} % {_NEG_B} AS bucket,
    arg_min(doc_id, doc_id) AS rep_id,
    -- struct-packed: bare arg_min(source, doc_id) SKIPS rows whose
    -- source is NULL (DuckDB aggregates ignore NULL inputs) and would
    -- stitch the min-doc's id with ANOTHER row's source, while
    -- Spark's struct-min keeps row semantics (differential-fuzzer
    -- find)
    arg_min(struct_pack(s := source), doc_id).s AS rep_source
  FROM documents GROUP BY 1
),
probes AS (
  SELECT d.doc_id, d.source, j,
    {md5_long_sql("CAST(d.doc_id AS VARCHAR) || '_' || CAST(j AS VARCHAR)")}
      % {_NEG_B} AS bucket
  FROM documents d CROSS JOIN unnest(generate_series(1, {_NEG_PROBES})) t(j)
),
cand AS (
  SELECT p.doc_id, r.rep_id, r.rep_source, MIN(p.j) AS first_j
  FROM probes p JOIN reps r USING (bucket)
  WHERE r.rep_source <> p.source AND r.rep_id <> p.doc_id
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT doc_id, rep_id, rep_source,
    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY first_j, rep_id)
      AS neg_rank
  FROM cand
)
SELECT doc_id AS doc, CAST(neg_rank AS INT) AS neg_rank,
  rep_id AS neg_id, rep_source AS neg_source
FROM ranked WHERE neg_rank <= {_NEG_K}
""",
    doc="Deterministic negative sampling for contrastive training: "
    f"each anchor doc probes {_NEG_PROBES} hash-chosen buckets of a "
    f"{_NEG_B}-bucket representative table (argmin-by-id rep per "
    "bucket) and keeps the first "
    f"{_NEG_K} distinct representatives from a DIFFERENT source — the "
    "cross-source constraint that keeps negatives from being "
    "near-positives. The rep table is |buckets| rows (kilobytes, "
    "BROADCAST), probing is a narrow explode bounded by the probe "
    "count, and per-anchor ranking windows over <= probes rows — no "
    "corpus self-join, no RNG (hash identity => identical negatives "
    "across retries, repartitionings, and engines). At 1B docs the "
    "bucket count scales to ~sqrt(n) and reps refresh per corpus "
    "snapshot.",
)
def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.scalar import md5_long

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    reps = (
        docs.select(
            (md5_long(F.col("doc_id").cast("string")) % _NEG_B).alias("bucket"),
            F.struct("doc_id", "source").alias("ds"),
        )
        .groupBy("bucket")
        .agg(F.min("ds").alias("rep"))
        .select(
            "bucket",
            F.col("rep.doc_id").alias("rep_id"),
            F.col("rep.source").alias("rep_source"),
        )
    )
    probes = docs.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1), F.lit(_NEG_PROBES))).alias("j"),
    ).select(
        "doc_id",
        "source",
        "j",
        (
            md5_long(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("_"),
                    F.col("j").cast("string"),
                )
            )
            % _NEG_B
        ).alias("bucket"),
    )
    cand = (
        probes.join(F.broadcast(reps), "bucket")
        .filter(
            (F.col("rep_source") != F.col("source"))
            & (F.col("rep_id") != F.col("doc_id"))
        )
        .groupBy("doc_id", "rep_id", "rep_source")
        .agg(F.min("j").alias("first_j"))
    )
    w = Window.partitionBy("doc_id").orderBy("first_j", "rep_id")
    return (
        cand.select(
            F.col("doc_id").alias("doc"),
            F.row_number().over(w).alias("neg_rank"),
            F.col("rep_id").alias("neg_id"),
            F.col("rep_source").alias("neg_source"),
        )
        .filter(F.col("neg_rank") <= _NEG_K)
    )


# ---------------------------------------------------------------------------
# graph: triangle counts over the minhash dup-pair graph
# ---------------------------------------------------------------------------


def _triangles_oracle() -> str:
    from .pipeline_ext import _minhash_pairs_ctes

    return f"""
WITH {_minhash_pairs_ctes()},
tri AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM cand e1
  JOIN cand e2 ON e1.doc_b = e2.doc_a
  WHERE EXISTS (SELECT 1 FROM cand e3
                WHERE e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b)
),
nodes AS (
  SELECT a AS doc FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT doc, CAST(COUNT(*) AS BIGINT) AS triangles
FROM nodes GROUP BY doc
"""


@register(
    "graph_triangles_dups",
    group="ext-graph",
    oracle=_triangles_oracle(),
    doc="Per-node triangle counts over the minhash dup-pair graph "
    "(operators/graph.triangle_counts): ordered-wedge join + closing "
    "semi join finds each triangle a<b<c exactly once. Triangle "
    "density separates true dup cliques from chance band collisions — "
    "the cluster-purity signal next to connected_components' cluster "
    "ids. Two id-keyed equi-joins; hub skew is the failure mode, "
    "degree orientation the production fix (docstring).",
)
def graph_triangles_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_counts
    from .pipeline_ext import _BAND_SIZE, _NUM_HASHES

    pairs = dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        num_hashes=_NUM_HASHES,
        band_size=_BAND_SIZE,
    )
    return triangle_counts(pairs)


@register(
    "corpus_ngram_novelty",
    group="ext-curation novelty",
    oracle=f"""
WITH {_grams_cte("WHERE doc_id % 10 = 0", 3, "ref_grams")},
{_grams_cte("WHERE doc_id % 10 <> 0", 3, "doc_grams")},
ref AS (SELECT DISTINCT {md5_long_sql("gram")} AS gh FROM ref_grams),
cnt AS (
  SELECT doc, COUNT(*) AS n_grams, COUNT(r.gh) AS known_grams
  FROM (SELECT doc, {md5_long_sql("gram")} AS gh FROM doc_grams) dg
  LEFT JOIN ref r USING (gh) GROUP BY doc
)
SELECT d.doc_id AS doc,
  CAST(COALESCE(c.n_grams, 0) AS BIGINT) AS n_grams,
  CAST(COALESCE(c.known_grams, 0) AS BIGINT) AS known_grams,
  CASE WHEN COALESCE(c.n_grams, 0) > 0
       THEN 1.0 - CAST(c.known_grams AS DOUBLE) / c.n_grams END AS novelty
FROM documents d LEFT JOIN cnt c ON d.doc_id = c.doc
WHERE d.doc_id % 10 <> 0
""",
    doc="Per-doc novelty vs a reference corpus (fixture reference = "
    "doc_id % 10 == 0 slice): fraction of the doc's distinct 3-grams "
    "NOT already present in the reference — decontaminate's scoring "
    "complement, the freshness signal for data mixing and "
    "memorization studies. Reference grams broadcast; corpus grams "
    "probe map-side; one per-doc count exchange; integer-ratio "
    "doubles are bit-exact "
    "(operators/curation.py::ngram_novelty).",
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return curation.ngram_novelty(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        "doc_id",
        "text",
        n=3,
    )


# ---------------------------------------------------------------------------
# graph: deterministic label-propagation communities over the dup graph
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    from .pipeline_ext import _minhash_pairs_ctes

    step = (
        "c{n} AS (SELECT e.dst AS node, r.label, COUNT(*) AS c\n"
        "  FROM edges e JOIN r{p} r ON e.src = r.node GROUP BY 1, 2),\n"
        "r{n} AS (SELECT node, label FROM (\n"
        "  SELECT node, label, ROW_NUMBER() OVER (\n"
        "    PARTITION BY node ORDER BY c DESC, label) AS rn FROM c{n})\n"
        "  WHERE rn = 1)"
    )
    iters = ",\n".join(
        step.format(n=i + 1, p=i) for i in range(_LPA_ROUNDS)
    )
    return f"""
WITH {_minhash_pairs_ctes()},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand
),
r0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
{iters}
SELECT node, label FROM r{_LPA_ROUNDS}
"""


@register(
    "graph_label_propagation",
    group="ext-graph iterative",
    oracle=_lpa_oracle(),
    doc="Deterministic synchronous label propagation (3 rounds, "
    "(count DESC, label ASC) tie-break) over the minhash dup-pair "
    "graph (operators/graph.label_propagation): communities split "
    "weakly-linked chains of dense dup cores that connected "
    "components merges. The winner pick is a max_by aggregate over "
    "(vote count, -label) — no per-node window sort; per round one "
    "id-keyed join plus a map-combined two-level aggregate. Oracle "
    "unrolls the rounds as chained CTEs.",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation
    from .pipeline_ext import _BAND_SIZE, _NUM_HASHES

    pairs = dedup.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        num_hashes=_NUM_HASHES,
        band_size=_BAND_SIZE,
    )
    return label_propagation(pairs, rounds=_LPA_ROUNDS)


# ---------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

_DSIR_SLOTS = 256
_DSIR_K = 100


@register(
    "corpus_dsir_topk",
    group="ext-curation dsir",
    oracle=f"""
WITH big AS (
  SELECT doc_id AS doc, doc_id % 10 = 0 AS is_t,
         CAST({md5_long_sql("bg")} % {_DSIR_SLOTS} AS BIGINT) AS slot
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       unnest(CASE WHEN len(w) >= 2 THEN
         list_transform(generate_series(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i+1])
         ELSE [] END) AS t(bg)
),
spine AS (SELECT unnest(generate_series(0, {_DSIR_SLOTS - 1}))::BIGINT AS slot),
ct AS (SELECT slot, COUNT(*) AS c FROM big WHERE is_t GROUP BY 1),
cr AS (SELECT slot, COUNT(*) AS c FROM big WHERE NOT is_t GROUP BY 1),
tot AS (SELECT (SELECT COUNT(*) FROM big WHERE is_t) AS tt,
               (SELECT COUNT(*) FROM big WHERE NOT is_t) AS tr),
dw AS (
  SELECT s.slot,
    ln((COALESCE(ct.c, 0) + 1)::DOUBLE / (tot.tt + {_DSIR_SLOTS}))
  - ln((COALESCE(cr.c, 0) + 1)::DOUBLE / (tot.tr + {_DSIR_SLOTS})) AS dw
  FROM spine s LEFT JOIN ct USING (slot) LEFT JOIN cr USING (slot), tot
),
ds AS (SELECT doc, slot, COUNT(*) AS cnt FROM big WHERE NOT is_t GROUP BY 1, 2),
terms AS (
  SELECT ds.doc, CAST(SUM(ds.cnt) AS BIGINT) AS n_feats,
         list(ds.cnt * dw.dw ORDER BY ds.slot) AS ts
  FROM ds JOIN dw ON ds.slot = dw.slot GROUP BY ds.doc
),
w AS (SELECT doc, n_feats, list_reduce(ts, (x, y) -> x + y) AS lw FROM terms)
SELECT doc, n_feats,
       CAST(ROW_NUMBER() OVER (ORDER BY lw DESC, doc) AS INT) AS rank
FROM w QUALIFY rank <= {_DSIR_K}
""",
    doc="DSIR importance resampling (Xie et al. 2023): top-100 "
    "raw-pool docs by target-likeness, where the fixture target is "
    "the doc_id % 10 == 0 slice. Hashed word-bigram features (no "
    "vocabulary state) induce two 256-slot Laplace-smoothed "
    "multinomials; a doc scores sum cnt*(ln p_t - ln p_r). The raw "
    "double never surfaces (BM25 contract): per-doc terms fold "
    "sequentially in slot order — retry-stable and oracle-"
    "reproducible — and only the doc-tiebroken rank is emitted. "
    "Distribution tables and totals broadcast; the token stream "
    "shuffles once as map-combined (doc, slot) counts "
    "(operators/curation.py::dsir_topk).",
)
def corpus_dsir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return curation.dsir_topk(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        "doc_id",
        "text",
        n_slots=_DSIR_SLOTS,
        k=_DSIR_K,
    )


# ---------------------------------------------------------------------------
# near-dup decontamination (minhash-LSH cross-corpus)
# ---------------------------------------------------------------------------


def _neardup_decon_oracle() -> str:
    from .pipeline_ext import _minhash_pairs_ctes

    return f"""
WITH {_minhash_pairs_ctes()},
crossed AS (
  SELECT CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END AS doc,
         CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END AS eval_doc
  FROM cand WHERE (doc_a % 10 = 0) <> (doc_b % 10 = 0)
),
hsh AS (SELECT doc, {md5_long_sql("shingle")} AS h FROM shingle_pairs),
sizes AS (SELECT doc, COUNT(*) AS n FROM hsh GROUP BY doc),
inter AS (
  SELECT c.doc, c.eval_doc, COUNT(*) AS c
  FROM crossed c JOIN hsh a ON a.doc = c.doc
  JOIN hsh b ON b.doc = c.eval_doc AND b.h = a.h
  GROUP BY 1, 2
)
SELECT i.doc, i.eval_doc,
       CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc = i.doc
JOIN sizes sb ON sb.doc = i.eval_doc
WHERE CAST(i.c AS DOUBLE) / (sa.n + sb.n - i.c) >= 0.5
"""


@register(
    "corpus_decontaminate_neardup",
    group="ext-curation decontamination",
    oracle=_neardup_decon_oracle(),
    doc="Near-duplicate benchmark contamination (fixture eval set = "
    "doc_id % 10 == 0 slice): corpus docs minhash-LSH-close to an "
    "eval doc, verified by exact shingle jaccard >= 0.5. The verbatim "
    "n-gram decontaminate misses paraphrase/light-edit leaks; this is "
    "its near-dup complement. Eval band index AND eval shingle sets "
    "broadcast; corpus cost is one signature pass (no corpus-corpus "
    "pair space), exact verification runs over candidates only "
    "(operators/curation.py::decontaminate_neardup). Integer-ratio "
    "jaccard doubles are bit-exact cross-engine.",
)
def corpus_decontaminate_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline_ext import _BAND_SIZE, _NUM_HASHES

    docs = load_table(spark, sf_dir, "documents")
    return curation.decontaminate_neardup(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        "doc_id",
        "text",
        num_hashes=_NUM_HASHES,
        band_size=_BAND_SIZE,
        n=3,
        threshold=0.5,
    )


@register(
    "corpus_quality_model_filter",
    group="ext-curation model-filter",
    oracle=f"""
WITH tok AS (
  SELECT doc_id AS doc, unnest(string_split(text, ' ')) AS term
  FROM documents
),
wtok AS (
  SELECT doc,
    {md5_long_sql("'qw_' || CAST(" + md5_long_sql("term") + " % 256 AS VARCHAR)")}
      % 2001 - 1000 AS w
  FROM tok
)
SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(w) AS BIGINT) AS score_units,
  CAST(SUM(w) AS DOUBLE) / (1000.0 * COUNT(*)) AS score,
  SUM(w) > 0 AS kept
FROM wtok GROUP BY doc
""",
    doc="Model-based quality filtering (the fastText/LR quality "
    "classifier step between heuristic filters and dedup — CCNet, "
    "GPT-3's WebText-similarity LR): hashed bag-of-words features "
    "(md5 mod 256 slots, no vocabulary state) scored by a linear "
    "model whose weights are md5-derived integer units — the "
    "deterministic stand-in for trained weights; a fitted weight "
    "table broadcasts into the identical plan. ONE map-combined "
    "BIGINT sum per doc — no join, no Python, and integer weight "
    "units keep the score exact under any partition order (a double "
    "weight sum would be order-dependent); the single surface "
    "division is correctly rounded on both engines "
    "(operators/curation.py::linear_quality_scores).",
)
def corpus_quality_model_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.linear_quality_scores(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        n_slots=256, scale=1000,
    )
