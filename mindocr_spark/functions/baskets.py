"""baskets — A-priori frequent-itemset co-occurrence over event logs.

Market-basket analysis at crawl scale: which items (here the ``props``
``k`` payload of the events table) co-occur in the same (user, day)
basket more often than their marginals predict. The classic two-stage
A-priori discipline is what makes this survive 100 TB of events:

1. **Item-support pruning first.** Pair generation only ever sees items
   that individually clear the support floor — the long tail (the
   overwhelming majority of a power-law item vocabulary) never reaches
   the quadratic stage. One map-side-combinable groupBy on the item
   key.
2. **Bounded basket fan-out.** The per-basket pair join fans out
   quadratically in basket size; baskets above ``max_basket_items``
   distinct items are excluded from the WHOLE analysis (supports and
   pairs — one consistent population, mirrored exactly by the oracle)
   so a single bot user with 10^5 items can never emit 10^10 pair
   rows. The cap is an explicit parameter: the verified configuration
   is the production configuration (the ngram_jaccard df-cap lesson).
3. **Relative thresholds, integer arithmetic.** Support floors are
   fractions of the basket population evaluated by integer
   cross-multiplication (``support · den ≥ num · n_baskets``) — no
   float thresholds, so both engines decide every boundary case
   identically and the same query text is correct at every corpus
   scale.

Reference lineage: the reference prunes recognition candidates by a
confidence floor before the expensive alignment stage
(reference: mindocr/postprocess/rec_postprocess.py drop_score
filtering); A-priori is that gate-before-the-expensive-stage shape
lifted to pair mining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def frequent_pairs(
    events: DataFrame,
    min_item: tuple[int, int] = (2, 100),
    min_pair: tuple[int, int] = (1, 1000),
    max_basket_items: int = 64,
) -> DataFrame:
    """Frequent co-occurring item pairs over (user_id, day) baskets.

    Items are the integer ``$.k`` payloads of ``props``; a basket is
    the DISTINCT item set one user touches in one calendar day.
    ``min_item`` / ``min_pair`` are (num, den) support-floor fractions
    of the kept-basket population. Returns one row per surviving pair:
    (item_a, item_b, n_pair, n_a, n_b, n_baskets, lift) with
    item_a < item_b and lift = n_pair·n_baskets / (n_a·n_b) — > 1
    means the pair co-occurs above independence.

    100 TB plan: one distinct on the (basket, item) grain, one basket
    size agg, one item-support agg (all map-side combinable), frequent
    items broadcast back to prune the basket rows, then ONE self-join
    on the uniform basket key with fan-out bounded by
    ``max_basket_items``²; the 1-row basket-count relation rides a
    broadcast cross-join into the two threshold predicates (no eager
    count — the ivf_topk lazy-composition lesson)."""
    from mindocr_spark.cache import tracked_persist

    if max_basket_items < 2:
        raise ValueError(
            f"max_basket_items must be ≥ 2, got {max_basket_items}"
        )
    for name, (num, den) in (("min_item", min_item),
                             ("min_pair", min_pair)):
        if num < 0 or den < 1:
            raise ValueError(f"{name} must be (num ≥ 0, den ≥ 1)")

    # integer items only, decided on the RAW JSON string (regex guard)
    # so both engines drop a non-integer or overflowing payload the
    # same way — a bare cast would NULL in Spark but round in DuckDB
    raw_item = F.get_json_object("props", "$.k")
    b = tracked_persist(
        events.select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.when(
                raw_item.rlike(r"^-?[0-9]{1,18}$"),
                raw_item.cast("bigint"),
            ).alias("item"),
        )
        .where(F.col("item").isNotNull())
        .distinct()
    )
    bsz = b.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("bsz")
    )
    kept_keys = tracked_persist(
        bsz.where(F.col("bsz") <= max_basket_items).select(
            "user_id", "day"
        )
    )
    kept = tracked_persist(b.join(kept_keys, ["user_id", "day"]))
    # kept_keys IS the distinct kept-basket set — count it directly
    tot = kept_keys.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_baskets")
    )
    isup = kept.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_item")
    )
    fi = tracked_persist(
        isup.crossJoin(tot).where(
            F.col("n_item") * F.lit(min_item[1])
            >= F.lit(min_item[0]) * F.col("n_baskets")
        )
    )
    fb = tracked_persist(
        kept.join(F.broadcast(fi.select("item")), "item")
    )
    left = fb.select("user_id", "day", F.col("item").alias("item_a"))
    right = fb.select("user_id", "day", F.col("item").alias("item_b"))
    psup = (
        left.join(right, ["user_id", "day"])
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
    )
    lift = F.round(
        F.col("n_pair").cast("double")
        * F.col("n_baskets").cast("double")
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
        6,
    )
    return (
        psup.crossJoin(tot)
        .where(
            F.col("n_pair") * F.lit(min_pair[1])
            >= F.lit(min_pair[0]) * F.col("n_baskets")
        )
        .join(
            F.broadcast(
                fi.select(
                    F.col("item").alias("item_a"),
                    F.col("n_item").alias("n_a"),
                )
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                fi.select(
                    F.col("item").alias("item_b"),
                    F.col("n_item").alias("n_b"),
                )
            ),
            "item_b",
        )
        .select(
            "item_a", "item_b", "n_pair", "n_a", "n_b", "n_baskets",
            lift.alias("lift"),
        )
    )
