package graft.server

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.Instant
import scala.collection.concurrent.TrieMap

/** Token metadata returned by verify (reference:
  * internal/auth/auth.go:61-73 TokenInfo). The token VALUE is never
  * stored — only its SHA-256, so a leaked metadata store can't mint
  * credentials. */
final case class TokenInfo(
    id: Long,
    name: String,
    description: String,
    permissions: Seq[String],
    enabled: Boolean,
    createdAt: String,
    expiresAt: Option[String],
    lastUsedAt: Option[String]) {

  /** OSS coarse check (reference: auth.go:945 HasPermission): the
    * permission list grants `perm` directly or via `admin`. */
  def has(perm: String): Boolean =
    permissions.contains("admin") || permissions.contains(perm)

  def json: String = {
    def q(s: String) = graft.query.QueryFacade.jsonStr(s)
    val perms = permissions.map(q).mkString("[", ",", "]")
    val exp = expiresAt.map(q).getOrElse("null")
    val last = lastUsedAt.map(e => s""","last_used_at":${q(e)}""").getOrElse("")
    s"""{"id":$id,"name":${q(name)},"description":${q(description)},""" +
      s""""permissions":$perms,"created_at":${q(createdAt)}$last,""" +
      s""""enabled":$enabled,"expires_at":$exp}"""
  }
}

object Auth {
  /** reference: internal/auth/auth.go IsValidPermission. */
  val ValidPermissions: Set[String] = Set("read", "write", "delete", "admin")

  /** A synthetic full-admin identity for the static single-token mode
    * (the pre-RBAC deployment shape) — id 0 never collides with store
    * ids, which start at 1. */
  val StaticAdmin: TokenInfo = TokenInfo(0L, "static-root", "static bearer",
    Seq("admin"), enabled = true, createdAt = "1970-01-01T00:00:00Z",
    expiresAt = None, lastUsedAt = None)

  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes(UTF_8))
      .map("%02x".format(_)).mkString

  def newTokenValue(): String = {
    val b = new Array[Byte](32)
    new java.security.SecureRandom().nextBytes(b)
    b.map("%02x".format(_)).mkString
  }
}

/** Multi-token store — the reference's AuthManager
  * (internal/auth/auth.go) re-expressed over the `_admin` JSON-record
  * layout the rest of the admin plane uses (one file per token under
  * `{root}/_admin/auth/tokens/`, tmp+rename writes). Records hold the
  * token's SHA-256, never the value; verify is a hash lookup through an
  * in-memory index (the reference's token cache, auth.go:75-79, minus
  * the TTL machinery a single-process store doesn't need — CRUD mutates
  * the index directly). */
final class AuthStore(root: String, hconf: Configuration) {
  private val mapper = new ObjectMapper()
  private val dir = new Path(root, "_admin/auth/tokens")
  private val lock = new Object
  // hash -> id index + id -> info cache, rebuilt from disk at startup
  private val byHash = TrieMap.empty[String, Long]
  private val byId = TrieMap.empty[Long, TokenInfo]

  locally {
    RecordFiles.list(hconf, dir, ".json").foreach { p =>
      RecordFiles.read(hconf, p).foreach { bytes =>
        val node = mapper.readTree(bytes)
        val info = fromNode(node.asInstanceOf[ObjectNode])
        byId(info.id) = info
        byHash(node.get("token_hash").asText) = info.id
      }
    }
  }

  private def fromNode(n: ObjectNode): TokenInfo = TokenInfo(
    n.get("id").asLong,
    n.get("name").asText,
    Option(n.get("description")).filterNot(_.isNull).map(_.asText).getOrElse(""),
    Option(n.get("permissions")).toSeq.flatMap(a =>
      (0 until a.size()).map(a.get(_).asText)),
    Option(n.get("enabled")).forall(_.asBoolean),
    n.get("created_at").asText,
    Option(n.get("expires_at")).filterNot(_.isNull).map(_.asText),
    Option(n.get("last_used_at")).filterNot(_.isNull).map(_.asText))

  private def persist(info: TokenInfo, hash: String): Unit = {
    val n = mapper.createObjectNode()
    n.put("id", info.id); n.put("name", info.name)
    n.put("description", info.description)
    val arr = n.putArray("permissions")
    info.permissions.foreach(arr.add)
    n.put("token_hash", hash)
    n.put("enabled", info.enabled)
    n.put("created_at", info.createdAt)
    info.expiresAt.fold { n.putNull("expires_at"); () } { e => n.put("expires_at", e); () }
    info.lastUsedAt.foreach(n.put("last_used_at", _))
    RecordFiles.write(hconf, dir, s"${info.id}.json", mapper.writeValueAsBytes(n))
  }

  private def hashOf(id: Long): Option[String] =
    byHash.collectFirst { case (h, i) if i == id => h }

  private val highWaterPath = new Path(dir, "_next_id")
  private def readHighWater(): Long =
    try RecordFiles.read(hconf, highWaterPath)
      .map(b => new String(b, UTF_8).trim.toLong).getOrElse(0L)
    catch { case _: Throwable => 0L }
  private def writeHighWater(id: Long): Unit =
    RecordFiles.write(hconf, dir, "_next_id", id.toString.getBytes(UTF_8))

  def hasTokens: Boolean = byId.nonEmpty

  /** Create with a fresh random value; returns (value, info). The value
    * is shown once and never recoverable (reference createToken's
    * "store this token securely" contract). Permissions semantics match
    * auth.go storePermissions: None = default read,write; Some(Nil) =
    * deliberately empty (RBAC-only token). */
  def create(name: String, description: String,
      permissions: Option[Seq[String]],
      expiresAt: Option[String]): (String, TokenInfo) = lock.synchronized {
    require(name.nonEmpty, "Token name is required")
    val perms = permissions match {
      case None => Seq("read", "write")
      case Some(ps) =>
        ps.foreach(p => require(Auth.ValidPermissions.contains(p),
          s"Invalid permission: $p. Valid permissions are: read, write, delete, admin"))
        ps
    }
    val value = Auth.newTokenValue()
    // monotonic across deletes AND restarts (persisted high-water mark):
    // reusing a deleted token's id would hand its RBAC memberships and
    // governance policy — keyed by token id — to an unrelated new token
    val id = math.max((byId.keys ++ Seq(0L)).max, readHighWater()) + 1
    writeHighWater(id)
    val info = TokenInfo(id, name, description, perms, enabled = true,
      createdAt = Instant.now().toString, expiresAt = expiresAt,
      lastUsedAt = None)
    val hash = Auth.sha256Hex(value)
    persist(info, hash)
    byId(id) = info; byHash(hash) = id
    (value, info)
  }

  /** Hash-lookup verification: enabled and unexpired, else None
    * (reference VerifyToken). Stamps last_used_at in the index (memory
    * only — the reference batches these updates off the hot path too,
    * auth.go lastUsedUpdate). The stamp happens under the store lock,
    * re-reading the current record: an unlocked read-modify-write here
    * raced revoke/update and could write a stale enabled=true copy back
    * over a concurrent revocation, resurrecting the token in memory. */
  def verify(value: String): Option[TokenInfo] =
    byHash.get(Auth.sha256Hex(value)).flatMap(verifyId)

  private def verifyId(id: Long): Option[TokenInfo] = lock.synchronized {
    byId.get(id).filter(_.enabled).filter { t =>
      // unparseable expires_at fails CLOSED: a corrupt record must not
      // become a never-expiring credential
      t.expiresAt.forall(e =>
        try Instant.parse(e).isAfter(Instant.now())
        catch { case _: Throwable => false })
    }.map { t =>
      val used = t.copy(lastUsedAt = Some(Instant.now().toString))
      byId(id) = used
      used
    }
  }

  def list(): Seq[TokenInfo] = byId.values.toSeq.sortBy(_.id)
  def get(id: Long): Option[TokenInfo] = byId.get(id)

  /** Patch name/description/permissions/enabled (reference updateToken). */
  def update(id: Long, name: Option[String], description: Option[String],
      permissions: Option[Seq[String]],
      enabled: Option[Boolean]): Option[TokenInfo] = lock.synchronized {
    byId.get(id).map { t =>
      permissions.foreach(_.foreach(p =>
        require(Auth.ValidPermissions.contains(p), s"Invalid permission: $p")))
      val nt = t.copy(
        name = name.getOrElse(t.name),
        description = description.getOrElse(t.description),
        permissions = permissions.getOrElse(t.permissions),
        enabled = enabled.getOrElse(t.enabled))
      // fail loudly if the byHash index has no entry for this id: a
      // silent getOrElse("") would persist an empty token_hash and
      // permanently brick the credential on the next restart
      val hash = hashOf(id).getOrElse(throw new IllegalStateException(
        s"token $id has no hash index entry; refusing to persist an empty token_hash"))
      persist(nt, hash)
      byId(id) = nt
      nt
    }
  }

  /** Replace the secret, keep the metadata (reference rotateToken). */
  def rotate(id: Long): Option[String] = lock.synchronized {
    byId.get(id).map { t =>
      val value = Auth.newTokenValue()
      val hash = Auth.sha256Hex(value)
      hashOf(id).foreach(byHash.remove)
      persist(t, hash)
      byHash(hash) = id
      value
    }
  }

  /** Disable without deleting (reference revokeToken). */
  def revoke(id: Long): Boolean =
    update(id, None, None, None, Some(false)).isDefined

  def delete(id: Long): Boolean = lock.synchronized {
    byId.remove(id) match {
      case Some(_) =>
        hashOf(id).foreach(byHash.remove)
        RecordFiles.delete(hconf, new Path(dir, s"$id.json"))
        true
      case None => false
    }
  }
}
