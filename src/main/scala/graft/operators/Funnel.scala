package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how far does each entity progress through a
  * required event sequence (step i+1 must occur STRICTLY after the
  * matched step i), and how long each transition took.
  *
  * Scale shape: the naive formulation is one self-join per step (k scans,
  * k shuffles of the full event table). This one is a single user-keyed
  * shuffle — non-step events are pruned map-side BEFORE the exchange (an
  * IN-list the scan can push), each entity's events fold in one pass of a
  * codegen'd HOF, and the per-step rollup is a 1-row global aggregate
  * unpivoted driver-free. Per-entity state is the event list, the same
  * bounded-per-entity assumption batch sessionization ([[q_w_sessionize]])
  * already makes.
  *
  * Matching is greedy-earliest (t1 = first step-1 event, t_{i+1} = first
  * step-(i+1) event after t_i), which is complete: if any strictly-ordered
  * chain exists, the greedy one exists. Equal timestamps do NOT satisfy
  * "after" — ties break conservatively, identically in the oracle.
  */
object Funnel {

  /** One row per entity: `hit` = array of the earliest timestamp
    * completing each step (null = stalled at that step). `tsCol` must be
    * a numeric (e.g. epoch-nanos long) or otherwise totally-ordered
    * orderable column. */
  def userSteps(events: DataFrame, entity: String, typeCol: String,
                tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepArr = array(steps.map(lit): _*)
    val nullTs = lit(null).cast("bigint")
    events
      .where(col(typeCol).isin(steps: _*))
      .select(col(entity), col(tsCol).cast("bigint").as("__ts"),
        col(typeCol).as("__tp"))
      .groupBy(col(entity))
      .agg(sort_array(collect_list(struct(col("__ts"), col("__tp")))).as("evts"))
      .select(col(entity),
        aggregate(col("evts"),
          expr(s"array_repeat(CAST(NULL AS BIGINT), ${steps.length})"),
          (acc, e) => {
            val ts = e.getField("__ts")
            val tp = e.getField("__tp")
            // each slot keeps its value once set; a new event may fill the
            // FIRST empty slot whose step type it matches, provided the
            // previous slot was already set strictly earlier. All slots
            // compare against the pre-event accumulator, so one event can
            // never satisfy two consecutive steps.
            transform(acc, (slot, i) =>
              when(slot.isNotNull, slot).otherwise(
                when(tp === element_at(stepArr, (i + 1).cast("int")),
                  when(i === 0, ts).otherwise(
                    // lazy CASE arm: element_at(acc, 0) is never evaluated
                    when(element_at(acc, i.cast("int")).isNotNull &&
                      ts > element_at(acc, i.cast("int")), ts)))))
          }).as("hit"))
  }

  /** Per-step rollup: (step, step_name, n_users, sum_delta_ns) — entities
    * reaching each step and the total transition time from the previous
    * step (0 for step 1). Steps nobody reaches still emit a row. */
  def summary(events: DataFrame, entity: String, typeCol: String,
              tsCol: String, steps: Seq[String]): DataFrame = {
    val per = userSteps(events, entity, typeCol, tsCol, steps)
    def hitAt(i: Int): Column = element_at(col("hit"), i + 1)
    val aggs = steps.indices.flatMap { i =>
      Seq(sum(when(hitAt(i).isNotNull, 1L).otherwise(0L)).as(s"__n$i")) ++
        (if (i > 0)
          Seq(sum(when(hitAt(i).isNotNull, hitAt(i) - hitAt(i - 1))
            .otherwise(0L)).as(s"__d$i"))
        else Nil)
    }
    val row = per.agg(aggs.head, aggs.tail: _*)
    steps.zipWithIndex.map { case (name, i) =>
      row.select(
        lit(i + 1).as("step"), lit(name).as("step_name"),
        coalesce(col(s"__n$i"), lit(0L)).cast("bigint").as("n_users"),
        (if (i > 0) coalesce(col(s"__d$i"), lit(0L)) else lit(0L))
          .cast("bigint").as("sum_delta_ns"))
    }.reduce(_ unionByName _).orderBy(col("step"))
  }

  /** First-order Markov transition matrix over per-user event sequences
    * — P(next event type | current event type), the product-analytics
    * companion to the funnel: where the funnel checks ONE prescribed
    * path, the matrix measures every observed step.
    *
    * Scale shape: one user-keyed window (the lag) — the same shuffle
    * sessionization needs — then a matrix-sized (from, to) count
    * aggregate; the row-normalizing window runs over the matrix, not the
    * data. Probabilities divide exact integer counts in DOUBLE.
    *
    * `tieCol` breaks equal-timestamp ordering deterministically.
    * Returns (`from_type`, `to_type`, `n`, `p`) — rows with no
    * predecessor (each user's first event) contribute nothing.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val counts = events
      .select(col(typeCol).as("to_type"),
        lag(col(typeCol), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val rowTot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("from_type"))
    counts.withColumn("p",
      round(col("n").cast("double") / sum(col("n")).over(rowTot), 6))
  }

  /** Top opening event paths: each user's first `depth` event types (by
    * time, `tieCol` breaking exact ties) joined into one `a>b>c` path
    * string, counted across users — the onboarding/drop-off "what do
    * people actually do first" query.
    *
    * Scale shape: one user-keyed rank window (the sessionization
    * shuffle), a per-user aggregate whose state is bounded by `depth`
    * (the rank filter runs BEFORE the collect — no unbounded per-user
    * array), then a path-cardinality-sized count. The final top-k is a
    * TakeOrderedAndProject, never a global sort.
    */
  /** Time-to-convert distribution: for users whose first `fromType`
    * event is later followed by a `toType` event, the delay from that
    * first exposure to the FIRST subsequent conversion — the latency
    * companion to the step-count funnel (how FAST do converters
    * convert, not just how many).
    *
    * Scale shape: one user-keyed aggregate pins each user's first
    * exposure; one semi-filtered join + aggregate finds the first
    * conversion at-or-after it; the result is a user-sized relation
    * reduced by one global stats aggregate (exact interpolated
    * percentiles over the converted-user panel — the
    * q_a_group_median percentile-parity regime; mean via decimal
    * sums). `tsCol` integral epoch-nanos; deltas convert to seconds
    * in double at the edge.
    *
    * Output: one row (n_converted, mean_s, med_s, p90_s). */
  def timeToConvert(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, fromType: String, toType: String): DataFrame = {
    val firstFrom = events.where(col(typeCol) === fromType)
      .groupBy(col(userCol).as("__u"))
      .agg(min(col(tsCol)).as("__t0"))
    val deltas = events.where(col(typeCol) === toType)
      .select(col(userCol).as("__u"), col(tsCol).as("__t1"))
      .join(firstFrom, "__u")
      .where(col("__t1") >= col("__t0"))
      .groupBy(col("__u"))
      .agg((min(col("__t1")) - first(col("__t0"))).as("__d"))
    deltas.agg(count(lit(1)).as("n_converted"),
      round(sum(col("__d").cast("decimal(38,0)")).cast("double") /
        count(lit(1)) / lit(1.0e9), 6).as("mean_s"),
      round(expr("percentile(__d, 0.5)") / lit(1.0e9), 6).as("med_s"),
      round(expr("percentile(__d, 0.9)") / lit(1.0e9), 6).as("p90_s"))
  }

  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCol: String, depth: Int, k: Int): DataFrame = {
    require(depth >= 1 && depth <= 32, s"need 1 <= depth <= 32, got $depth")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(userCol), col(typeCol),
        row_number().over(w).as("__rn"))
      .where(col("__rn") <= depth)
      .groupBy(col(userCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("__rn"),
          col(typeCol).as("t")))), s => s.getField("t")), ">").as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).cast("bigint").as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }
}
