package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Item co-occurrence mining ("baskets containing X also contain Y") —
  * the association/related-items primitive behind market-basket analysis
  * and behavioral recommenders, and in a training-data pipeline the
  * "documents citing X also cite Y" linkage signal.
  *
  * Scale shape: the naive formulation self-joins the item table on the
  * basket key — a basket-keyed shuffle of the FULL item table on BOTH
  * sides plus a quadratic join. This one aggregates each basket's
  * distinct item set once (`collect_set` partials dedup map-side, so the
  * basket-keyed exchange carries distinct (basket, item) pairs), emits
  * the ordered pairs map-side from the set (two stacked generators — no
  * join, no second pass over the input), and counts by pair in one
  * pair-keyed shuffle. The per-item ranking uses the bounded TopK heap
  * aggregate: k rows per item per partition reach the final exchange, no
  * full-group sort anywhere.
  *
  * The quadratic term is per-basket (|basket|²), bounded by `maxBasket`:
  * a degenerate mega-basket (the crawler that "bought" everything, the
  * order with 10⁶ lines) is excluded rather than allowed to dominate the
  * pair space — co-occurrence inside such baskets carries no signal, the
  * standard practice in association mining. Baskets need ≥ 2 distinct
  * items to produce any pair.
  */
object Cooccurrence {

  /** Top-k co-items per item by shared-basket count. Returns
    * (`item`, `rank`, `co_item`, `n`) — rank 0-based within item, ties
    * broken deterministically by the TopK aggregate's (ord, tie) rule:
    * for numeric item columns the tie key is the co_item value itself
    * (ties break by co_item descending); for any other type (string
    * SKUs, doc ids) it is `xxhash64(co_item)` — an arbitrary but stable
    * total order, so the selection among equal counts is identical
    * across partitionings and reruns. (A plain bigint cast of a string
    * yields null — every tied pair would share one tie key and the
    * winner would be partition-dependent.) Null baskets/items are
    * dropped. */
  def relatedItems(df: DataFrame, basketCol: String, itemCol: String,
      k: Int = 5, maxBasket: Int = 256): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(maxBasket >= 2, s"maxBasket must be >= 2, got $maxBasket")
    val tieKey: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      df.schema(itemCol).dataType match {
        case _: NumericType => _.cast("bigint")
        case _ => xxhash64(_)
      }
    val sets = df
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull)
      .groupBy(col("__b"))
      .agg(collect_set(col("__i")).as("__is"))
      .where(size(col("__is")).between(2, maxBasket))
    val pairs = sets
      .select(explode(col("__is")).as("item"), col("__is"))
      .select(col("item"), explode(col("__is")).as("co_item"))
      .where(col("item") =!= col("co_item"))
    pairs
      .groupBy(col("item"), col("co_item"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("item"))
      .agg(graft.functions.TopK.topK(
        col("n").cast("double"), tieKey(col("co_item")),
        struct(col("co_item"), col("n")), k).as("__topk"))
      .select(col("item"), posexplode(col("__topk")).as(Seq("rank", "__it")))
      .select(col("item"), col("rank"),
        col("__it.co_item").as("co_item"), col("__it.n").as("n"))
      .orderBy(col("item"), col("rank"))
  }

  /** Pairwise association rules (Agrawal & Srikant 1994, the 2-itemset
    * slice): for item pairs co-occurring in at least `minSupport`
    * baskets, both directional rules a→b with
    *
    *   support    = n_ab / N          confidence = n_ab / n_a
    *   lift       = n_ab · N / (n_a · n_b)
    *
    * Scale shape: baskets dedupe to distinct (basket, item) rows; the
    * pair count is a basket-keyed self-join (bounded by basket size²,
    * the apriori candidate cost — cap basket width upstream for
    * pathological carts); item marginals and the basket total are one
    * aggregate each. Ratios derive from exact integer counts in
    * DOUBLE, rounded to 6 — the chiSquare playbook.
    */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val bi = df
      .where(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val pairCounts = bi.join(bi.select(col("__b"), col("__i").as("__j")), "__b")
      .where(col("__i") < col("__j"))
      .groupBy(col("__i"), col("__j"))
      .agg(count(lit(1)).as("__nab"))
      .where(col("__nab") >= minSupport)
    val itemCounts = bi.groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    val total = bi.agg(countDistinct(col("__b")).as("__nb"))
    val directed = pairCounts
      .select(col("__i").as("ante"), col("__j").as("cons"), col("__nab"))
      .union(pairCounts
        .select(col("__j").as("ante"), col("__i").as("cons"), col("__nab")))
    directed
      .join(itemCounts.select(col("__i").as("ante"), col("__ni").as("__na")), "ante")
      .join(itemCounts.select(col("__i").as("cons"), col("__ni").as("__nc")), "cons")
      .crossJoin(broadcast(total))
      .select(col("ante"), col("cons"),
        col("__nab").cast("bigint").as("n_ab"),
        round(col("__nab").cast("double") / col("__nb"), 6).as("support"),
        round(col("__nab").cast("double") / col("__na"), 6).as("confidence"),
        // marginal product in DOUBLE — two long marginals can overflow
        // int64 at corpus scale
        round(col("__nab").cast("double") * col("__nb") /
          (col("__na").cast("double") * col("__nc")), 6).as("lift"))
  }
}
