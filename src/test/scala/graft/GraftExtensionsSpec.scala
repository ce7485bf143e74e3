package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The full end-to-end proof lives at the session surface (a fresh JVM
  * with spark.sql.extensions=graft.GraftExtensions resolves graft_dot /
  * graft_sorted_overlap from SQL, plans BandJoinExec from the natural
  * join syntax, and rewrites abs-band filters — extensions only apply at
  * session creation, which a shared-session suite cannot exercise).
  * This spec guards that the installer applies cleanly and twice. */
class GraftExtensionsSpec extends AnyFunSuite {
  test("extension installer applies cleanly and is re-entrant") {
    val ext = new GraftExtensions
    ext(new SparkSessionExtensions)
    ext(new SparkSessionExtensions)
  }

  test("totalCores parses the master topologies the contract session accepts") {
    assert(GraftSession.totalCores("local[4]") == Some(4))
    assert(GraftSession.totalCores("local[32]") == Some(32))
    assert(GraftSession.totalCores("local-cluster[2,4,4096]") == Some(8))
    assert(GraftSession.totalCores("local-cluster[ 3 , 8 , 2048 ]") == Some(24))
    // unparseable topologies fall back to the caller's default
    assert(GraftSession.totalCores("local[*]").isEmpty)
    assert(GraftSession.totalCores("spark://host:7077").isEmpty)
    assert(GraftSession.totalCores("yarn").isEmpty)
  }

  test("absolutizeClasspath prefixes EVERY entry, not just the first") {
    val sep = java.io.File.pathSeparator
    val cwd = new java.io.File(".").getAbsoluteFile.getParentFile.getPath
    val got = GraftSession.absolutizeClasspath(
      s"target/scala-2.13/classes${sep}target/scala-2.13/test-classes$sep")
    val parts = got.split(sep)
    assert(parts.length == 2, "empty trailing segment must be dropped")
    parts.foreach(p => assert(p.startsWith(cwd), s"not absolutized: $p"))
    // an already-absolute entry passes through unchanged
    assert(GraftSession.absolutizeClasspath("/opt/x.jar") == "/opt/x.jar")
  }
}
