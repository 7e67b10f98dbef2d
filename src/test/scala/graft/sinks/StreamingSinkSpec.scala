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

  // ---------------------------------------------------- Kafka topic sink

  test("kafka sink gate: no bootstrap conf -> nothing starts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Array[Byte], Array[Byte])]
    spark.conf.unset("spark.graft.kafka.bootstrap")
    assert(KafkaSink.start(input.toDF.toDF("key", "value"), "events",
      java.nio.file.Files.createTempDirectory("kcp").toString).isEmpty)
  }

  test("kafka sink gate: bootstrap conf routes the frames into the kafka source") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Array[Byte], Array[Byte])]
    spark.conf.set("spark.graft.kafka.bootstrap", "broker:9092")
    // this sandbox ships no spark-sql-kafka connector jar (and no broker),
    // so the wiring must get exactly as far as Spark's data-source
    // resolution of "kafka" — proving the stream START path is real, not
    // short-circuited by the gate
    val err = intercept[Exception] {
      KafkaSink.start(input.toDF.toDF("key", "value"), "events",
        java.nio.file.Files.createTempDirectory("kcp").toString)
        .get.processAllAvailable()
    }
    try {
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(err).exists(_.toLowerCase.contains("kafka")),
        s"expected the kafka source resolution in: ${msgs(err)}")
    } finally spark.conf.unset("spark.graft.kafka.bootstrap")
  }

  test("retrying publisher partitions outcomes like the reference flusher") {
    import KafkaSink._
    // scripted transport: r2 is transiently failing twice, r4 is fatal,
    // the rest complete first try
    var attempts = Map.empty[String, Int].withDefaultValue(0)
    val sent = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val pub = new RetryingPublisher[String](batch => {
      sent += batch
      batch.map { r =>
        attempts += r -> (attempts(r) + 1)
        r match {
          case "r4"                       => Fatal("bad record")
          case "r2" if attempts("r2") <= 2 => Retriable("timeout")
          case _                          => Completed
        }
      }
    })
    val continue = pub.publish(Seq("r1", "r2", "r3", "r4", "r5"))
    assert(!continue, "retriable failures must report backpressure (PAUSE)")
    assert(pub.hasPending)
    assert(pub.abandoned === Seq("r4"), "fatal records are abandoned, not retried")
    assert(pub.delivered === 3)
    // heartbeat re-sends ONLY the failed record, not the whole batch
    assert(!pub.heartbeat())
    assert(sent.last === Seq("r2"))
    assert(pub.heartbeat(), "second retry succeeds -> CONTINUE")
    assert(!pub.hasPending)
    assert(pub.delivered === 4)
    assert(attempts("r1") === 1 && attempts("r2") === 3 && attempts("r4") === 1,
      "completed records are sent exactly once; fatal records never retry")
    // an idle heartbeat with nothing pending is a no-op CONTINUE
    val flushes = sent.size
    assert(pub.heartbeat() && sent.size === flushes)
  }
}
