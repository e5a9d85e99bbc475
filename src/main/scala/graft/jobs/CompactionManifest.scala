package graft.jobs

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.nio.charset.StandardCharsets

/** In-flight compaction manifest — the durable record that makes the
  * tmp-write → rename → delete-sources swap recoverable after a crash
  * (reference: internal/compaction/manifest.go — it journals each job's
  * input files and output name, and the watcher completes or rolls back
  * on startup).
  *
  * Protocol (both hourly and daily tiers):
  *   1. `begin(entry)`   — durably record inputs + planned output names
  *   2. write the tmp dir
  *   3. rename tmp files to the final output names
  *   4. delete the input files
  *   5. `complete(id)`   — drop the entry
  *
  * [[recoverEntry]] then has a deterministic decision: if every planned
  * output exists, the swap had committed — finish step 4/5; otherwise
  * roll back (delete partial outputs + tmp; inputs are untouched because
  * deletion only starts after all renames).
  *
  * The manifest is one small JSON file per table, rewritten atomically
  * (tmp + rename). Entries are keyed by partition path so concurrent
  * schedulers on different tables never contend.
  */
object CompactionManifest {

  final case class Entry(
      id: String,
      tier: String, // "hourly" | "daily"
      partition: String, // partition dir being compacted
      tmpDir: String,
      inputs: Seq[String], // absolute input file paths
      outputs: Seq[String]) // absolute FINAL output file paths

  def manifestPath(tablePath: String): Path =
    new Path(tablePath, "_graft_compact_manifest.json")

  // per-table intra-JVM lock: partitions of one measurement compact
  // concurrently (runHourly/runDaily fan out), and every swap does a
  // read-modify-write of the same manifest file. One scheduler per
  // driver is the deployment model, so a JVM lock suffices (cross-driver
  // coordination would shard by table anyway).
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(tablePath: String): Object =
    locks.computeIfAbsent(tablePath, _ => new Object)

  def load(tablePath: String, conf: Configuration): Seq[Entry] = {
    val p = manifestPath(tablePath)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Nil
    val in = fs.open(p)
    val text =
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, StandardCharsets.UTF_8)
      } finally in.close()
    try {
      val JArray(items) = JsonMethods.parse(text): @unchecked
      items.collect { case o: JObject =>
        implicit val fmt: Formats = DefaultFormats
        o.extract[Entry]
      }
    } catch {
      // unreachable with the overwriting-rename write below (the visible
      // manifest is always a complete file); kept as a defensive fallback
      // for a manifest corrupted by external means
      case _: Exception => Nil
    }
  }

  def begin(tablePath: String, conf: Configuration, entry: Entry): Unit =
    lockFor(tablePath).synchronized {
      write(tablePath, conf, load(tablePath, conf).filterNot(_.id == entry.id) :+ entry)
    }

  def complete(tablePath: String, conf: Configuration, id: String): Unit =
    lockFor(tablePath).synchronized {
      write(tablePath, conf, load(tablePath, conf).filterNot(_.id == id))
    }

  private def write(tablePath: String, conf: Configuration, entries: Seq[Entry]): Unit = {
    val p = manifestPath(tablePath)
    val fs = p.getFileSystem(conf)
    if (entries.isEmpty) { fs.delete(p, false); return }
    val json = JArray(entries.toList.map { e =>
      JObject(
        "id" -> JString(e.id), "tier" -> JString(e.tier),
        "partition" -> JString(e.partition), "tmpDir" -> JString(e.tmpDir),
        "inputs" -> JArray(e.inputs.toList.map(JString(_))),
        "outputs" -> JArray(e.outputs.toList.map(JString(_))))
    })
    val tmp = new Path(tablePath, s"._graft_compact_manifest.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(JsonMethods.compact(JsonMethods.render(json))
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // overwriting rename: the old manifest stays intact until the new one
    // is in place — delete-then-rename would lose every in-flight entry
    // (some mid-swap, at protocol steps 2-4) on a crash in the gap
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
    fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Complete or roll back one in-flight entry; returns what it did. */
  def recoverEntry(conf: Configuration, e: Entry): String = {
    val part = new Path(e.partition)
    val fs = part.getFileSystem(conf)
    val allOutputsExist = e.outputs.nonEmpty &&
      e.outputs.forall(o => fs.exists(new Path(o)))
    if (allOutputsExist) {
      // swap committed — finish deleting sources
      e.inputs.foreach(i => fs.delete(new Path(i), false))
      fs.delete(new Path(e.tmpDir), true)
      "completed"
    } else {
      // swap not committed — roll back partial renames; inputs are intact
      e.outputs.foreach(o => fs.delete(new Path(o), false))
      fs.delete(new Path(e.tmpDir), true)
      "rolled_back"
    }
  }
}
