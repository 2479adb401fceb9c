package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rendezvous (highest-random-weight) routing — the stateless consistent
  * assignment of keys to shards/workers/buckets (Thaler & Ravishankar
  * 1996): each key goes to the shard with the highest salted hash score.
  * When the shard set changes, ONLY the keys whose winner changed move
  * (~1/(n+1) of them on grow) — the property that makes stateful-shard
  * rebalancing, cache routing, and incremental-index assignment cheap,
  * with no ring metadata to store (vs consistent hashing).
  *
  * Pure map-side expression — no shuffle, no state, engine-portable
  * (md5 scores; fixed-length lowercase hex compares lexicographically ==
  * numerically, the repo's [[Sampling]] idiom). The shard list is a
  * driver-side constant folded into the plan — fine for the tens-to-
  * thousands of shards the technique targets.
  */
object Sharding {

  /** The winning shard for each key: argmax over `shards` of
    * `md5(key || '#' || shard)`, ties (practically impossible) to the
    * lexicographically larger shard id. */
  def rendezvousAssign(keyCol: Column, shards: Seq[String]): Column = {
    require(shards.nonEmpty, "rendezvousAssign needs at least one shard")
    require(shards.distinct.size == shards.size, s"duplicate shard ids: $shards")
    val scored = shards.map(sh =>
      struct(md5(concat(keyCol.cast("string"), lit("#" + sh))).as("h"),
        lit(sh).as("s")))
    (if (scored.sizeIs == 1) scored.head else greatest(scored: _*))
      .getField("s")
  }
}
