package graft

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** Test-only Hadoop FileSystem modeling the two object-store behaviors a
  * real `file:` FS cannot produce (VERDICT r12 ask #4):
  *
  *  - eventually-consistent LIST: a path registered via [[LaggedListFileSystem.hide]]
  *    exists (GET/open/getFileStatus all work — modern stores are
  *    read-after-write consistent on GET) but is OMITTED from
  *    `listStatus` until [[LaggedListFileSystem.reveal]] — the classic
  *    list-after-put lag;
  *  - non-atomic create visibility: inherited from [[RawLocalFileSystem]],
  *    whose create() genuinely exposes partial bytes to concurrent
  *    readers (no temp-file + rename), i.e. a reader can list AND read a
  *    file that is still mid-write.
  *
  * Registered under the `lagfs:` scheme
  * (`conf.set("fs.lagfs.impl", classOf[LaggedListFileSystem].getName)`).
  * Visibility state is JVM-global (companion object) because Hadoop may
  * cache or re-instantiate FileSystem objects per scheme.
  */
class LaggedListFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "lagfs"
  override def getUri: URI = URI.create("lagfs:///")

  override def listStatus(p: Path): Array[FileStatus] =
    super.listStatus(p).filter(st =>
      !LaggedListFileSystem.isHidden(st.getPath))
}

object LaggedListFileSystem {
  private val hidden =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def key(p: Path): String = p.toUri.getPath

  /** Omit `p` from every listStatus until [[reveal]]. */
  def hide(p: Path): Unit = hidden.add(key(p))

  /** Make `p` listable again (the LIST index caught up). */
  def reveal(p: Path): Unit = hidden.remove(key(p))

  def isHidden(p: Path): Boolean = hidden.contains(key(p))

  def clear(): Unit = hidden.clear()
}
