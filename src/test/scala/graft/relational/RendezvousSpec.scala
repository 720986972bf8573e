package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RendezvousSpec extends SparkSpec {
  import spark.implicits._

  test("growing the shard count only ever moves keys ONTO new shards") {
    // The HRW guarantee (vs mod-N's full reshuffle): a key's weight per
    // shard is independent of the shard count, so going 8 → 12 a key
    // either keeps its argmax or a NEW shard (8..11) overtakes it.
    val keys = (1 to 400).map(i => s"k$i").toDF("k")
    val m = Rendezvous.rebalanceMatrix(keys, "k", 8, 12).collect()
    val badMoves = m.filter(r => r.getBoolean(3) && r.getLong(1) < 8)
    assert(badMoves.isEmpty,
      s"moved keys landed on pre-existing shards: ${badMoves.mkString(",")}")
    // every key accounted for exactly once (duplicates collapse first)
    assert(m.map(_.getLong(2)).sum === 400L)
    // shard ids stay in range on both axes
    assert(m.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 8 &&
      r.getLong(1) >= 0 && r.getLong(1) < 12))
  }

  test("assignment is deterministic and balanced within reason") {
    val keys = (1 to 1000).map(i => s"user-$i").toDF("k")
    val a1 = keys.select(Rendezvous.shardOf(col("k"), 8).as("s"))
      .groupBy("s").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a2 = keys.select(Rendezvous.shardOf(col("k"), 8).as("s"))
      .groupBy("s").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a1 === a2)
    assert(a1.keySet === (0L until 8L).toSet)
    // md5 weights: each shard should get 125 ± a generous band
    assert(a1.values.forall(c => c > 60 && c < 200), a1.toString)
  }

  test("out-of-range shard counts fail loudly") {
    val e = intercept[IllegalArgumentException] {
      Rendezvous.shardOf(col("k"), 17)
    }
    assert(e.getMessage.contains("[2, 16]"))
    intercept[IllegalArgumentException] { Rendezvous.shardOf(col("k"), 1) }
  }
}
