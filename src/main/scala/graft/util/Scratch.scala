package graft.util

import java.io.File

import org.apache.spark.sql.SparkSession

/** Scratch-path factory for fixture writes (layout round trips, the DPP
  * partitioned fact, streaming sink landings). Two isolation guarantees
  * the ad-hoc `java.io.tmpdir` + `d.hashCode` naming could not give:
  *
  *  1. '''Per-JVM ownership''' — every path embeds this JVM's PID, so two
  *     JVMs sweeping the same data dir never share (or delete) each
  *     other's fixtures, and the shutdown hook removes only what this
  *     JVM built.
  *  2. '''Per-session ownership''' (via [[sessionDir]]) — fixtures that
  *     are REWRITTEN on every call additionally embed the session token,
  *     so two SparkSessions in one JVM running the same query
  *     concurrently cannot race `mode(overwrite)` on one path (Spark's
  *     commit protocol shares a `_temporary` dir — concurrent overwrites
  *     of the same path delete each other's in-flight task output).
  *
  * Deletion is crash-safe against concurrent cleanup: `listFiles` is
  * null-guarded (the dir may vanish under us) and each registered root is
  * removed inside its own try, so one failure cannot leak the rest.
  */
object Scratch {

  /** Hex PID — the per-JVM namespace token. */
  val jvmTag: String = java.lang.Long.toHexString(ProcessHandle.current().pid())

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[File]()

  sys.addShutdownHook {
    registered.forEach { f =>
      try deleteRecursively(f)
      catch { case _: Exception => () }
    }
  }

  /** Recursive delete tolerant of concurrent removal: a dir that vanishes
    * mid-walk yields a null `listFiles`, treated as already-gone. */
  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[File])
        .foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** tmpfs when available (fixture IO off the bench's critical path),
    * else the JVM tmpdir. */
  def base: String =
    if (new File("/dev/shm").isDirectory) "/dev/shm"
    else System.getProperty("java.io.tmpdir")

  /** Session token: identity hash, the stable in-JVM discriminator for a
    * SparkSession (sessions sharing one JVM share one SparkContext, so
    * the PID alone cannot tell them apart). */
  def sessionTag(s: SparkSession): String =
    Integer.toHexString(System.identityHashCode(s))

  private def make(name: String): String = {
    val f = new File(base, name)
    registered.add(f)
    f.getPath
  }

  /** JVM-scoped path for build-once fixtures whose content is a pure
    * function of the data dir (the DPP fact, compacted layouts): all
    * sessions in this JVM share it; other JVMs get their own. */
  def jvmDir(tag: String, d: String): String =
    make(s"graft_${tag}_${Integer.toHexString(d.hashCode)}_p$jvmTag")

  /** Session-scoped path for per-run rewrite fixtures (the source
    * round trips, streaming sink landings): no two sessions — let alone
    * two JVMs — ever share one. */
  def sessionDir(s: SparkSession, tag: String, d: String): String =
    make(s"graft_${tag}_${Integer.toHexString(d.hashCode)}" +
      s"_p${jvmTag}_s${sessionTag(s)}")
}
