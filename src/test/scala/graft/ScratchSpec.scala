package graft

import org.scalatest.funspec.AnyFunSpec

/** Scratch lifecycle bracket semantics — no Spark needed. */
class ScratchSpec extends AnyFunSpec {
  import graft.util.Scratch

  private def exists(p: String): Boolean = new java.io.File(p).exists()

  it("releaseSince is id-based: releasing a pre-mark dir mid-bracket cannot shift it") {
    val before1 = Scratch.dir("scrpre1")
    val before2 = Scratch.dir("scrpre2")
    val mark = Scratch.marker()
    val in1 = Scratch.dir("scrin1")
    // a PRE-mark dir released while the bracket is open — with a
    // positional marker this would shift the bracket and leak in1 /
    // delete the wrong entry
    Scratch.release(before1)
    val in2 = Scratch.dir("scrin2")
    Scratch.releaseSince(mark)
    assert(!exists(in1) && !exists(in2), "bracket dirs must be gone")
    assert(exists(before2), "pre-mark dir must survive the bracket")
    Scratch.release(before2)
    assert(!exists(before2))
  }

  it("release is by path and idempotent; releaseSince on an empty bracket is a no-op") {
    val mark = Scratch.marker()
    Scratch.releaseSince(mark) // nothing created: no-op
    val d = Scratch.dir("scrrel")
    Scratch.release(d)
    assert(!exists(d))
    Scratch.release(d) // unknown path now: no-op
    Scratch.release("/definitely/not/registered")
  }
}
