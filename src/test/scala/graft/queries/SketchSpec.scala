package graft.queries

import graft.SparkSpec
import graft.functions.Skew
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("approx rollup tracks the exact rollup within sketch error") {
    val exact = EventQueries.dailyRollup(spark, sf)
      .select("day", "event_type", "n_users").as[(String, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val approx = EventQueries.dailyRollupApprox(spark, sf)
      .select("day", "event_type", "approx_users").as[(String, String, Double)]
      .collect()
    assert(approx.nonEmpty)
    approx.foreach { case (day, et, a) =>
      val e = exact((day, et))
      // 15% relative, with an absolute floor of 2 for tiny groups (a single
      // register collision at n=4 is a 25% relative error by arithmetic)
      assert(math.abs(a - e) <= math.max(0.15 * e, 2.0),
        s"($day,$et): approx=$a exact=$e")
    }
  }

  test("salted join equals plain join") {
    val fact = graft.Tables.events(spark, sf)
      .select(col("user_id").as("k"), col("value"))
    val dim = (0L until 150L).map(i => (i, s"u$i")).toDF("k", "name")
    val plain = fact.join(dim, "k").agg(count(lit(1)), sum("value")).collect()(0)
    val salted = Skew.saltedJoin(fact, dim, "k", 8).agg(count(lit(1)), sum("value")).collect()(0)
    assert(plain.getLong(0) === salted.getLong(0))
    assert(math.abs(plain.getDouble(1) - salted.getDouble(1)) < 1e-6)
  }
}
