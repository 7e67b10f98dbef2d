package graft.streaming

import graft.SparkSpec
import graft.queries.DocQueries

/** Streaming tokenize-at-ingest: WordPiece and BPE encoding per micro-batch
  * against a hot-reloaded published model — cross-batch parity with the
  * batch appliers over the same publication, a mid-stream vocabulary
  * refresh picked up at the next micro-batch, and planted segmentations
  * checked against hand-computed expectations (so the parity check is not
  * circular). */
class TokenizeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def publishVocab(dir: String, pieces: Seq[(String, Int)]): Unit =
    pieces.toDF("p", "cont").repartition(1).write.mode("overwrite").parquet(dir)

  test("wordpiece stream == batch applier per batch; republished vocab " +
       "applies from the next micro-batch; planted segmentations exact") {
    val vocabDir = java.nio.file.Files
      .createTempDirectory("graft-wp-dim").toString + "/vocab"
    // start pieces: un, a..z singles; continuation pieces: happ, y + singles
    val singles = ('a' to 'z').map(_.toString)
    publishVocab(vocabDir,
      singles.map(_ -> 0) ++ singles.map(_ -> 1) ++
        Seq("un" -> 0, "happ" -> 1, "ness" -> 1))
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int, String)]
    val q = input.toDF.toDF("doc_id", "text").writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= Streams.wordpieceBatch(batch, vocabDir)
          .select("doc_id", "n_words", "n_pieces", "wp_md5")
          .as[(Long, Int, Int, String)].collect().sortBy(_._1)
        ()
    }.start()
    try {
      val batch1 = Seq(1L -> "unhappy cat", 2L -> "unhappyness", 3L -> "dog")
      input.addData(batch1: _*)
      q.processAllAvailable()
      // parity: identical rows through the BATCH path (same function over a
      // non-streaming frame, same publication)
      val batchOut = Streams.wordpieceBatch(
          batch1.toDF("doc_id", "text"), vocabDir)
        .select("doc_id", "n_words", "n_pieces", "wp_md5")
        .as[(Long, Int, Int, String)].collect().sortBy(_._1)
      assert(seen.toSeq === batchOut.toSeq)
      // planted, hand-computed: "unhappy" -> un ##happ ##y (3 pieces),
      // "cat" -> c ##a ##t (3: no multi-char start piece covers it),
      // "unhappyness" -> un ##happ ##y ##ness (4), "dog" -> 3 singles
      assert(seen.find(_._1 == 1L).get._3 === 6)
      assert(seen.find(_._1 == 2L).get._3 === 4)
      assert(seen.find(_._1 == 3L).get._3 === 3)

      // republish mid-stream: "unhapp" becomes a start piece, "yness" a
      // continuation — segmentation of the same word must change
      publishVocab(vocabDir,
        singles.map(_ -> 0) ++ singles.map(_ -> 1) ++
          Seq("unhapp" -> 0, "yness" -> 1, "y" -> 1))
      seen.clear()
      input.addData(Seq(11L -> "unhappyness"): _*)
      q.processAllAvailable()
      // unhapp ##yness = 2 pieces (was 4 under the old vocabulary)
      assert(seen.find(_._1 == 11L).get._3 === 2,
        s"republished vocab must apply from the next micro-batch: $seen")
    } finally {
      q.stop()
      graft.functions.RefreshableDim.invalidate(spark, vocabDir)
    }
  }

  test("wordpieceVocab publication + stream agree with the oracled batch " +
       "operator's segmentation on the corpus it was trained on") {
    val d = "/root/testdata/sf0.001"
    val vocabDir = java.nio.file.Files
      .createTempDirectory("graft-wp-pub").toString + "/vocab"
    DocQueries.wordpieceVocab(spark, d).repartition(1)
      .write.mode("overwrite").parquet(vocabDir)
    // word-grain truth from the oracled batch operator
    val expect = DocQueries.wordpieceTok(spark, d)
      .select("word", "seg").as[(String, String)].collect().toMap
    // stream the corpus' distinct words through the published vocabulary
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    val q = input.toDF.toDF("text").writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= Streams.wordpieceBatch(batch, vocabDir)
          .select("text", "n_pieces").as[(String, Int)].collect()
        ()
    }.start()
    try {
      val words = expect.keySet.toSeq.sorted.take(200)
      input.addData(words: _*)
      q.processAllAvailable()
      seen.foreach { case (w, n) =>
        val expPieces = expect(w).split(" ").length
        assert(n === expPieces, s"word '$w': stream=$n batch seg='${expect(w)}'")
      }
      assert(seen.size === words.size)
    } finally {
      q.stop()
      graft.functions.RefreshableDim.invalidate(spark, vocabDir)
    }
  }

  test("bpe stream == batch applier; republished merges apply next batch") {
    val mergesDir = java.nio.file.Files
      .createTempDirectory("graft-bpe-dim").toString + "/merges"
    val d = "/root/testdata/sf0.001"
    // publish the CORPUS-trained merge table, stream corpus docs through it
    DocQueries.bpeTrain(spark, d).select("rank", "left", "right")
      .repartition(1).write.mode("overwrite").parquet(mergesDir)
    val docs = graft.Tables.documents(spark, d)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq.take(40)
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String)]
    val q = input.toDF.toDF("doc_id", "text").writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= Streams.bpeEncodeBatch(batch, mergesDir)
          .select("doc_id", "n_bpe_tokens", "bpe_md5")
          .as[(Long, Int, String)].collect().sortBy(_._1)
        ()
    }.start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      // parity with the ORACLED batch query (trained on the same corpus)
      val batchOut = DocQueries.bpeEncode(spark, d)
        .select("doc_id", "n_bpe_tokens", "bpe_md5")
        .as[(Long, Int, String)].collect()
        .filter(r => docs.exists(_._1 == r._1)).sortBy(_._1)
      assert(seen.toSeq === batchOut.toSeq)

      // republish an EMPTY merge table: every word degrades to chars+</w>
      Seq.empty[(Int, String, String)].toDF("rank", "left", "right")
        .repartition(1).write.mode("overwrite").parquet(mergesDir)
      seen.clear()
      input.addData(Seq(9001L -> "ab"): _*)
      q.processAllAvailable()
      // "ab" with no merges -> symbols [a, b</w>] = 2 tokens
      assert(seen.find(_._1 == 9001L).get._2 === 2,
        s"republished merge table must apply from the next micro-batch: $seen")
    } finally {
      q.stop()
      graft.functions.RefreshableDim.invalidate(spark, mergesDir)
    }
  }
}
