package graft.sinks

/** GCS-style object-store file lifecycle — the semantics of the reference's
  * `filesinks/gcs/GoogleCloudStorageFileManager.java` (468 LoC), which the
  * plain `gs://`-path claim of the Spark writer does not exercise:
  *
  *  - objects are IMMUTABLE: "appending" means uploading a fresh `.part`
  *    object and COMPOSING `[inflight, part] -> inflight` (the 2-source
  *    compose of `writeBufferAndComposeParts`, `:231-275`);
  *  - publishing is a compose to the publish-directory name followed by
  *    deleting the inflight + part objects (`closeAndPublish`, `:211-220`)
  *    — atomic from a reader's perspective because compose creates the
  *    destination in one operation;
  *  - every store call runs under a retry policy that retries ONLY
  *    transient I/O failures (`RetriableIOException`, `:112-113`).
  *
  * The store itself is a seam ([[ObjectStoreSink.ObjectStore]]): production
  * backs it with the JSON API the reference calls (upload / compose /
  * delete); the in-memory implementation pins the lifecycle contract in a
  * zero-egress sandbox. The Spark batch/streaming writers keep using the
  * committer-based [[AvroFileSink]] — this manager exists for the
  * single-writer roll-and-publish path the reference runs per sink thread,
  * e.g. inside `foreachBatch` on a driver/executor that owns one file. */
object ObjectStoreSink {

  /** Transient failure: the retry policy's ONLY retriable class. */
  final class RetriableIOException(msg: String)
    extends java.io.IOException(msg)

  /** Minimal object-store surface (the three verbs the reference calls). */
  trait ObjectStore {
    def upload(name: String, bytes: Array[Byte]): Unit
    /** Concatenate `sources` (in order, <=32 per GCS) into `dest`. */
    def compose(sources: Seq[String], dest: String): Unit
    def delete(name: String): Unit
    def get(name: String): Option[Array[Byte]]
  }

  /** JVM-local store for tests/dry-runs; compose enforces the 32-source
    * cap and source existence like the real API. Non-final so tests can
    * wrap verbs with failure injection. */
  class InMemoryStore extends ObjectStore {
    val objects = scala.collection.concurrent.TrieMap.empty[String, Array[Byte]]
    def upload(name: String, bytes: Array[Byte]): Unit = objects.put(name, bytes)
    def compose(sources: Seq[String], dest: String): Unit = {
      require(sources.nonEmpty && sources.size <= 32, "compose takes 1..32 sources")
      val parts = sources.map(s => objects.getOrElse(s,
        throw new java.io.IOException(s"compose source missing: $s")))
      objects.put(dest, parts.toArray.flatten)
    }
    def delete(name: String): Unit = objects.remove(name)
    def get(name: String): Option[Array[Byte]] = objects.get(name)
  }

  /** Bounded retry of transient failures with linear backoff; anything
    * else propagates immediately (the reference's policy `.handle(
    * RetriableIOException.class)`). */
  def withRetries[T](maxAttempts: Int = 5, backoffMs: Long = 20)(op: => T): T = {
    var attempt = 1
    while (true) {
      try return op
      catch {
        case e: RetriableIOException =>
          if (attempt >= maxAttempts) throw e
          Thread.sleep(backoffMs * attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One inflight file's lifecycle (the reference's
    * `GoogleCloudStorageDivolteFile`). Not thread-safe — one owner per
    * file, like the reference's per-sink-thread instance. */
  final class RollingFile(store: ObjectStore, inflightDir: String,
      publishDir: String, name: String, maxAttempts: Int = 5,
      backoffMs: Long = 20) {
    private val inflight = s"$inflightDir/$name"
    private val part = s"$inflightDir/$name.part" // PART_CLASSIFIER
    private val publish = s"$publishDir/$name"
    private val buffer = new java.io.ByteArrayOutputStream()
    private var partEverWritten = false
    private var closed = false

    // createFile uploads the empty inflight object up front so compose
    // always has a destination-typed first source
    withRetries(maxAttempts, backoffMs)(store.upload(inflight, Array.empty))

    def append(bytes: Array[Byte]): Unit = {
      require(!closed, "file already closed")
      buffer.write(bytes)
    }

    /** Durability point: upload the buffered bytes as the part object and
      * fold it into the inflight object via compose. */
    def sync(): Unit = {
      require(!closed, "file already closed")
      if (buffer.size() > 0) {
        partEverWritten = true
        val bytes = buffer.toByteArray
        withRetries(maxAttempts, backoffMs)(store.upload(part, bytes))
        withRetries(maxAttempts, backoffMs)(store.compose(Seq(inflight, part), inflight))
        // reset only after BOTH steps durably succeeded: resetting first
        // meant exhausted retries discarded the window's bytes — a caller
        // recovering from the thrown error would later publish a file
        // silently missing them. (Compose retry caveat: a failure that
        // MASKS a server-side success would re-append the part; the real
        // GCS API guards this with generation preconditions, which the
        // ObjectStore seam does not model — documented, not solved.)
        buffer.reset()
      }
    }

    /** Final compose lands directly on the PUBLISH name (one-shot create =
      * the atomic rename of the posix sink), then inflight + part clean
      * up. An empty tail composes the inflight with itself onto the new
      * destination (`:272`). */
    def closeAndPublish(): Unit = {
      require(!closed, "file already closed")
      closed = true
      if (buffer.size() > 0) {
        partEverWritten = true
        val bytes = buffer.toByteArray
        withRetries(maxAttempts, backoffMs)(store.upload(part, bytes))
        withRetries(maxAttempts, backoffMs)(store.compose(Seq(inflight, part), publish))
        buffer.reset() // after durable success, as in sync()
      } else {
        withRetries(maxAttempts, backoffMs)(store.compose(Seq(inflight), publish))
      }
      if (partEverWritten) withRetries(maxAttempts, backoffMs)(store.delete(part))
      withRetries(maxAttempts, backoffMs)(store.delete(inflight))
    }

    /** Abandon: delete whatever inflight state exists, publish nothing. */
    def discard(): Unit = {
      closed = true
      if (partEverWritten) withRetries(maxAttempts, backoffMs)(store.delete(part))
      withRetries(maxAttempts, backoffMs)(store.delete(inflight))
    }
  }
}
