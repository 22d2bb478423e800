package graft

import graft.pipeline.Extract
import org.scalatest.funsuite.AnyFunSuite

/** R1–R3 semantics: monotone [since, until) windows, watermark committed
  * only after the durable write (the reference's at-most-once ordering,
  * /root/reference/etl/extract.py:72-73, deliberately inverted).
  */
class ExtractSpec extends AnyFunSuite {

  private def tempDir = java.nio.file.Files.createTempDirectory("extract")

  test("watermark advances across runs and windows are contiguous") {
    val state = tempDir
    val ex = new Extract(state)
    var windows = Vector.empty[(Option[Long], Long)]
    def fetch(since: Option[Long], until: Long): Iterator[String] = {
      windows :+= (since, until)
      Iterator.single(s"""{"id":"g$until"}""")
    }
    ex.run(fetch, state.resolve("raw"), until = 100L)
    ex.run(fetch, state.resolve("raw"), until = 200L)
    assert(windows === Vector((None, 100L), (Some(100L), 200L)))
  }

  test("fetch failure leaves the watermark untouched (at-least-once)") {
    val state = tempDir
    val ex = new Extract(state)
    ex.run((_, _) => Iterator.single("""{"id":"a"}"""), state.resolve("raw"), 100L)
    intercept[RuntimeException] {
      ex.run((_, _) => throw new RuntimeException("boom"), state.resolve("raw"), 200L)
    }
    assert(ex.loadWatermark() === Some(100L)) // not advanced past failure
  }

  test("retried window overwrites the same file (idempotent names)") {
    val state = tempDir
    val raw = state.resolve("raw")
    val ex = new Extract(state)
    val f1 = ex.run((_, _) => Iterator.single("""{"id":"a"}"""), raw, 100L).get
    // simulate a retry of the same window after losing the watermark
    new Extract(state) { }
    java.nio.file.Files.delete(state.resolve("last_timestamp.txt"))
    val f2 = new Extract(state)
      .run((_, _) => Iterator.single("""{"id":"a"}"""), raw, 100L).get
    assert(f1 === f2)
    assert(java.nio.file.Files.list(raw).count() === 1)
  }
}
