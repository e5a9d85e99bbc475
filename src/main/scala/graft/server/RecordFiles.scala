package graft.server

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** The one-JSON-record-per-file idiom shared by every `_admin` store
  * (retention/CQ/tiering/MQTT policies, auth tokens, RBAC records,
  * governance policies): tmp+rename writes so a record is visible only
  * when complete, and reads that retry once across another writer's
  * rename window (the local FS swaps the file and its .crc sidecar
  * non-atomically, so a concurrent read can see a transient
  * ChecksumException). Extracted because four hand-rolled copies had
  * already drifted — only one of them carried the read retry. */
object RecordFiles {

  def write(hconf: Configuration, dir: Path, name: String,
      bytes: Array[Byte]): Unit = {
    val fs = dir.getFileSystem(hconf)
    fs.mkdirs(dir)
    val p = new Path(dir, name)
    val tmp = new Path(dir, s".$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, hconf)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** None when absent; transient read failures retry once. */
  def read(hconf: Configuration, p: Path): Option[Array[Byte]] = {
    def once(): Option[Array[Byte]] = {
      val fs = p.getFileSystem(hconf)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(in.readAllBytes()) finally in.close()
      }
    }
    try once()
    catch { case _: java.io.IOException => Thread.sleep(10); once() }
  }

  def delete(hconf: Configuration, p: Path): Boolean = {
    val fs = p.getFileSystem(hconf)
    fs.exists(p) && fs.delete(p, false)
  }

  /** Record files under `dir` with the given suffix, name-sorted. */
  def list(hconf: Configuration, dir: Path, suffix: String): Seq[Path] = {
    val fs = dir.getFileSystem(hconf)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).filter(_.isFile).map(_.getPath)
      .filter(p => p.getName.endsWith(suffix) && !p.getName.startsWith("."))
      .sortBy(_.getName).toSeq
  }
}
