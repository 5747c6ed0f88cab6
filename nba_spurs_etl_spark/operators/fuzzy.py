"""Fuzzy entity matching (edit-distance joins) at scale.

The naive edit-distance self-join is O(n^2) levenshtein evaluations —
dead at any real table size. The scalable shape is SymSpell-style
DELETION BLOCKING: every string generates its delete-(<=d) variant
keys; two strings within edit distance d ALWAYS share at least one key
(for d=1: a substitution shares the deletion at the edited position,
an insert/delete shares the shorter string itself), so a posting-list
pair emission over the keys yields an exact candidate superset, and
``levenshtein`` runs only on candidates. One shuffle keyed by variant
key + one row-local verify join — the same inverted-index kernel the
dedup operators use (``pair_combos``).

No reference analog (the reference joins on exact keys only); this is
the entity-resolution extension a training-data pipeline needs for
merging near-identical records (author names, URLs, titles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import pair_combos

#: hard ceiling for distance-2 deletion blocking: key volume is
#: ~|s|^2/2 per string, so document-length inputs blow up quadratically.
#: Names/titles/URLs sit far below this; longer strings must be
#: pre-blocked (slice/truncate/bucket) before asking for d=2.
MAX_D2_LEN = 64


def delete_variants(s: Column) -> Column:
    """Array of the string itself + every single-character deletion."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(
            F.substring(s, 1, i - 1),
            F.substring(s, (i + 1).cast("int"), F.length(s)),
        ),
    )
    return F.array_distinct(F.concat(F.array(s), dels))


def delete2_variants(s: Column) -> Column:
    """delete_variants plus every two-character deletion (delete at
    original positions i < j) — the SymSpell key set for distance 2.
    ~|s|^2/2 keys per string: the quadratic key volume IS the cost
    knob that makes distance-2 blocking an explicit opt-in.

    Guards: strings shorter than 2 contribute no delete-2 keys, and
    ``sequence(1, 0)`` would be DESCENDING (same trap as
    ``shingles_from_tokens``), so both ranges are length-guarded.
    Strings longer than ``MAX_D2_LEN`` RAISE (row-level
    ``raise_error``): ~|s|^2/2 keys per string is the documented cost
    contract, and a document-length string sailing through would melt
    the shuffle silently — pre-block long inputs instead (VERDICT r03
    item 3).
    """
    L = F.length(s)
    empty = F.array().cast("array<string>")
    d2 = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.greatest(L - 1, F.lit(1))),
            lambda i: F.when(
                L >= i + 1,
                F.transform(
                    F.sequence(i + 1, L),
                    lambda j: F.concat(
                        F.substring(s, 1, i - 1),
                        F.substring(s, (i + 1).cast("int"), (j - i - 1).cast("int")),
                        F.substring(s, (j + 1).cast("int"), L),
                    ),
                ),
            ).otherwise(empty),
        )
    )
    keys = F.array_distinct(
        F.concat(delete_variants(s), F.when(L >= 2, d2).otherwise(empty))
    )
    # NullType (raise_error) coerces to array<string> in the when —
    # the guard costs nothing on conforming rows and stays codegen'd.
    # NULL strings pass through (NULL keys -> explode drops the row,
    # the operator's long-standing contract): without the isNull arm,
    # when(NULL <= MAX) is not-true and the whole job would abort with
    # raise_error(NULL) on the first NULL in the matched column.
    return F.when(L.isNull() | (L <= MAX_D2_LEN), keys).otherwise(
        F.raise_error(
            F.concat(
                F.lit("delete2_variants: string length "),
                L.cast("string"),
                F.lit(
                    f" exceeds MAX_D2_LEN={MAX_D2_LEN}; distance-2 "
                    "deletion blocking posts ~|s|^2/2 keys per string "
                    "— pre-block or truncate long inputs"
                ),
            )
        )
    )


def edit_distance_pairs(
    df: DataFrame, id_col: str, s_col: str, max_dist: int = 1
) -> DataFrame:
    """(id_a < id_b, levenshtein) for all pairs within ``max_dist``.

    ``max_dist=1`` posts delete-1 keys (|s|+1 per string);
    ``max_dist=2`` posts delete-<=2 keys (~|s|^2/2 per string — the
    quadratic key volume is the cost knob, so distance 2 is an
    explicit opt-in, typically over a blocked/slimmed column).
    """
    if max_dist > 2:
        raise NotImplementedError(
            "deletion blocking is built for distance <= 2; deeper radii "
            "need delete-d key sets whose volume (~|s|^d) rarely pays"
        )
    variants = delete2_variants if max_dist == 2 else delete_variants
    base = df.select(F.col(id_col).alias("rid"), F.col(s_col).alias("s"))
    keys = base.select(
        "rid", F.explode(variants(F.col("s"))).alias("k")
    )
    cand = (
        keys.groupBy("k")
        .agg(F.sort_array(F.collect_set("rid")).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(pair_combos(F.col("ids"))).alias("p"))
        .select(F.col("p.doc_a").alias("id_a"), F.col("p.doc_b").alias("id_b"))
        .distinct()
    )
    sa = base.select(F.col("rid").alias("id_a"), F.col("s").alias("s_a"))
    sb = base.select(F.col("rid").alias("id_b"), F.col("s").alias("s_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("s_a", "s_b").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )
