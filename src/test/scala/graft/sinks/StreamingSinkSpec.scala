package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming source → Avro file sink: the reference's end-to-end spine in
  * micro-batch form (roll-per-trigger ≡ roll window). */
class StreamingSinkSpec extends SparkSpec {
  import spark.implicits._

  test("streaming events roll into avro container files per batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val dir = java.nio.file.Files.createTempDirectory("avrostream").toString
    val cp = java.nio.file.Files.createTempDirectory("avrostream-cp").toString
    val q = AvroFileSink.writeStreamTo(
      input.toDF.toDF("partyId", "ts"), dir, cp)
    input.addData(("p1", 1L), ("p2", 2L))
    q.processAllAvailable()
    input.addData(("p3", 3L))
    q.processAllAvailable()
    q.stop()
    val files = AvroFileSink.readBack(spark, dir)
    // one roll per non-empty batch; all records present exactly once
    assert(files.map(_._2).sum === 3)
    // the stamp is the batch id (deterministic replay names), tag follows
    assert(files.forall(_._1.matches("""b\d{12}-divolte-tracking-stream-\d{5}\.avro""")))
    // two distinct batches rolled distinct file sets
    assert(files.map(_._1.take(13)).distinct.size === 2)
  }
}
