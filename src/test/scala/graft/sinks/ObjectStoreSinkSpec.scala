package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import ObjectStoreSink._

/** Contract tests for the GCS-style immutable-object file lifecycle
  * (`filesinks/gcs/GoogleCloudStorageFileManager.java` semantics): part
  * upload + 2-source compose per sync, compose-to-publish on close,
  * transient-only retries, discard cleanup. */
class ObjectStoreSinkSpec extends AnyFunSuite {

  private def bytes(s: String) = s.getBytes("UTF-8")

  test("append/sync folds parts into the inflight object via compose") {
    val store = new InMemoryStore
    val f = new RollingFile(store, "inflight", "publish", "f1.avro")
    assert(store.get("inflight/f1.avro").exists(_.isEmpty), "empty inflight created up front")
    f.append(bytes("r1|")); f.append(bytes("r2|"))
    f.sync()
    assert(store.get("inflight/f1.avro").map(new String(_)) === Some("r1|r2|"))
    f.append(bytes("r3|"))
    f.sync()
    assert(store.get("inflight/f1.avro").map(new String(_)) === Some("r1|r2|r3|"))
    // an empty sync is a no-op (no fresh part, no compose)
    f.sync()
    assert(store.get("inflight/f1.avro").map(new String(_)) === Some("r1|r2|r3|"))
  }

  test("closeAndPublish composes onto the publish name and cleans up") {
    val store = new InMemoryStore
    val f = new RollingFile(store, "inflight", "publish", "f2.avro")
    f.append(bytes("a|")); f.sync()
    f.append(bytes("b|"))
    f.closeAndPublish() // buffered tail becomes the final part
    assert(store.get("publish/f2.avro").map(new String(_)) === Some("a|b|"))
    assert(store.get("inflight/f2.avro").isEmpty, "inflight deleted")
    assert(store.get("inflight/f2.avro.part").isEmpty, "part deleted")
    intercept[IllegalArgumentException](f.append(bytes("x")))
  }

  test("empty-tail close composes the inflight with itself onto publish") {
    val store = new InMemoryStore
    val f = new RollingFile(store, "inflight", "publish", "f3.avro")
    f.append(bytes("only|")); f.sync()
    f.closeAndPublish()
    assert(store.get("publish/f3.avro").map(new String(_)) === Some("only|"))
  }

  test("discard deletes inflight state and publishes nothing") {
    val store = new InMemoryStore
    val f = new RollingFile(store, "inflight", "publish", "f4.avro")
    f.append(bytes("x|")); f.sync()
    f.discard()
    assert(store.objects.keySet.forall(!_.contains("f4.avro")))
  }

  test("transient store failures retry; permanent failures propagate") {
    var failuresLeft = 3
    val store = new InMemoryStore {
      override def upload(name: String, b: Array[Byte]): Unit = {
        if (name.endsWith(".part") && failuresLeft > 0) {
          failuresLeft -= 1
          throw new RetriableIOException("503 backend error")
        }
        super.upload(name, b)
      }
    }
    val f = new RollingFile(store, "i", "p", "f5.avro", maxAttempts = 5, backoffMs = 1)
    f.append(bytes("data|"))
    f.sync() // survives the three 503s
    assert(store.get("i/f5.avro").map(new String(_)) === Some("data|"))
    assert(failuresLeft === 0)

    // exhausted retries surface the transient error
    failuresLeft = 99
    val g = new RollingFile(store, "i", "p", "f6.avro", maxAttempts = 3, backoffMs = 1)
    g.append(bytes("x"))
    intercept[RetriableIOException](g.sync())

    // a non-retriable failure is NOT retried
    var calls = 0
    val fatal = new InMemoryStore {
      override def compose(s: Seq[String], d: String): Unit = {
        calls += 1
        throw new java.io.IOException("403 forbidden")
      }
    }
    val h = new RollingFile(fatal, "i", "p", "f7.avro", maxAttempts = 5, backoffMs = 1)
    h.append(bytes("x"))
    intercept[java.io.IOException](h.sync())
    assert(calls === 1, "permanent errors must not burn retry attempts")
  }

  test("compose enforces the 32-source cap and source existence") {
    val store = new InMemoryStore
    (1 to 33).foreach(i => store.upload(s"o$i", bytes("x")))
    intercept[IllegalArgumentException](
      store.compose((1 to 33).map(i => s"o$i"), "dest"))
    intercept[java.io.IOException](store.compose(Seq("missing"), "dest"))
    store.compose((1 to 32).map(i => s"o$i"), "dest")
    assert(store.get("dest").map(_.length) === Some(32))
  }
}
