package graft.sinks

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.io.File
import java.nio.file.{Files, Paths}

/** Avro container-file sink with the reference's file conventions
  * (`filesinks/FileFlusher.java:45-296`, `hdfs/HdfsFileManager.java:44-137`):
  *
  *  - one container file per (partition, roll window) named
  *    `<yyyyMMddHHmmss>-divolte-tracking-<tag>-<n>.avro`
  *    (reference filename pattern, `HdfsFileManager.java:62-68`);
  *  - files are written to a working name and atomically renamed into place
  *    on close — on real HDFS/object stores Spark's commit protocol plays
  *    this role; here the semantic is preserved per-file;
  *  - EMPTY partitions produce no file (reference discards empty files,
  *    `FileFlusher.java:183-208`);
  *  - the stream variant appends batches via `foreachBatch`, giving the
  *    roll-per-interval behavior (trigger interval ≡ roll window).
  *
  * Distribution: each executor partition writes its own file — no driver
  * collect. The file API here is java.io, i.e. a shared POSIX filesystem
  * (local mode, NFS); for HDFS/object stores the production path is
  * Spark's own `format("avro")` writer, whose commit protocol supersedes
  * the `.partial`+rename contract (SURVEY §2E) — this sink exists to keep
  * the reference's container-file conventions testable.
  *
  * Retry safety: the working file carries the task ATTEMPT id (two
  * speculative attempts never write the same partial), and the final name
  * is attempt-independent, so a retry's rename overwrites with identical
  * content instead of duplicating.
  */
object AvroFileSink {

  /** Write a DataFrame as Avro container files; returns the target dir.
    * `stamp` defaults to wall-clock; pass a deterministic one (e.g. a
    * batch id) when replays must overwrite rather than duplicate. */
  def write(df: DataFrame, dir: String, tag: String = "spark",
            syncInterval: Int = 1000, stamp: Option[String] = None): String = {
    val schemaJson = AvroConversions.toAvroSchema(df.schema).toString
    val stampStr = stamp.getOrElse(new java.text.SimpleDateFormat("yyyyMMddHHmmss")
      .format(new java.util.Date()))
    Files.createDirectories(Paths.get(dir))
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      if (!rows.hasNext) Iterator.empty // no empty files
      else {
        val schema = new Schema.Parser().parse(schemaJson)
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val file = new File(dir, f"$stampStr-divolte-tracking-$tag-$pid%05d.avro")
        file.getParentFile.mkdirs() // executor-side: dir may not exist here
        val working = new File(dir, file.getName + s".partial-$attempt")
        val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        writer.setSyncInterval(syncInterval * 64) // bytes-ish analog of record sync policy
        writer.create(schema, working)
        var n = 0L
        try {
          rows.foreach { row => writer.append(AvroConversions.toRecord(row, schema)); n += 1 }
        } finally writer.close()
        if (!working.renameTo(file) && !file.exists())
          throw new java.io.IOException(s"atomic publish failed for $file")
        Iterator.single(file.getPath -> n)
      }
    }.collect()
    dir
  }

  /** Read back every container file in a dir (AvroFileLocator pattern,
    * reference `ServerSinkSourceConfigurationTest.java:126-158`): count and
    * schema come from the container headers. */
  def readBack(spark: SparkSession, dir: String): Seq[(String, Long, String)] = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    files.toSeq.map { f =>
      val reader = new DataFileReader[GenericRecord](f, new GenericDatumReader[GenericRecord]())
      try {
        var n = 0L
        while (reader.hasNext) { reader.next(); n += 1 }
        (f.getName, n, reader.getSchema.getFullName)
      } finally reader.close()
    }
  }

  /** Distributed read-back of a container-file dir into a typed DataFrame
    * (the consume side of [[write]]; no spark-avro module on the unmanaged
    * classpath, so the container decode is explicit). One input file per
    * task — files stream record-by-record through the shared Avro→Row
    * converter; nothing collects to the driver. */
  def readBackDf(spark: SparkSession, dir: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val files = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).map(_.getPath).sorted.toSeq
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { path =>
        val reader = new DataFileReader[GenericRecord](
          new File(path), new GenericDatumReader[GenericRecord]())
        // close on TASK COMPLETION, not just clean exhaustion: a limit()/
        // take() that stops early, or a failure mid-read, would otherwise
        // leak the file handle for the executor's lifetime
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            try reader.close() catch { case _: Exception => () }))
        new Iterator[Row] {
          def hasNext: Boolean = { val h = reader.hasNext; if (!h) reader.close(); h }
          def next(): Row =
            graft.sources.TopicSources.fromRecord(reader.next(), schema)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Streaming variant: roll one batch of files per micro-batch (trigger
    * interval = roll window; `query.trigger(ProcessingTime(...))`). The
    * file stamp is the batch id, not wall-clock: foreachBatch is
    * at-least-once, and a deterministic name makes a replayed batch
    * overwrite its own files instead of duplicating them. */
  def writeStreamTo(df: DataFrame, dir: String, checkpoint: String,
                    tag: String = "stream"): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        write(batch, dir, tag, stamp = Some(f"b$batchId%012d")); ()
      }
      .start()
}
