package graft.server

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import java.time.Instant
import scala.collection.concurrent.TrieMap

/** Scoped permission check outcome (reference:
  * internal/auth/rbac_models.go PermissionCheckResult). */
final case class PermissionResult(allowed: Boolean, source: String,
    reason: String = "")

/** Role-based access control — the reference's RBACManager
  * (internal/auth/rbac_manager.go) re-expressed over the `_admin`
  * JSON-record layout: organizations → teams → roles (database pattern
  * + permission set, optionally narrowed per measurement pattern), with
  * token→team memberships. Persistence is one JSON file per record
  * under `{root}/_admin/auth/{kind}/`; the working set lives in memory
  * and CRUD mutates it under a lock (the reference fronts SQLite with
  * the same shape of cache, rbac_manager.go:1643-1676 — a single
  * process needs no TTL).
  *
  * Check semantics are byte-faithful to checkPermissionUncached
  * (rbac_manager.go:1607-1639):
  *  - RBAC disabled → OSS coarse check (token permission list);
  *  - no team memberships → OSS check (backward compat);
  *  - memberships → team/role walk (checkRBACPermissionCached
  *    :1775-1817): enabled teams only; role's database_pattern must
  *    match; if the role carries measurement permissions they decide
  *    measurement-scoped requests EXCLUSIVELY (no fall-through to
  *    role-level perms); else role-level permissions decide;
  *  - RBAC deny falls back to the OSS grant (OSS perms are a floor,
  *    never narrowed by RBAC — least-privilege tokens are created with
  *    an EMPTY permission list, auth.go PermissionsNone).
  *
  * Pattern syntax matches rbac_manager.go matchPattern: `*`, `pfx_*`,
  * `*_sfx`, `pfx*`, else exact. */
final class Rbac(root: String, hconf: Configuration) {
  private val mapper = new ObjectMapper()
  private val lock = new Object

  /** The reference gates RBAC behind an enterprise license
    * (rbac_manager.go:285 IsRBACEnabled); this build has no license
    * plane, so enablement is an operator switch (ServeMain flag /
    * embedder field). Off = OSS coarse permissions only. */
  @volatile var enabled: Boolean = false

  final case class Org(id: Long, name: String, description: String,
      enabled: Boolean, createdAt: String)
  final case class Team(id: Long, orgId: Long, name: String,
      description: String, enabled: Boolean, createdAt: String)
  final case class Role(id: Long, teamId: Long, databasePattern: String,
      permissions: Seq[String], createdAt: String)
  final case class MeasPerm(id: Long, roleId: Long,
      measurementPattern: String, permissions: Seq[String], createdAt: String)
  final case class Membership(id: Long, tokenId: Long, teamId: Long,
      createdAt: String)

  private val orgs = TrieMap.empty[Long, Org]
  private val teams = TrieMap.empty[Long, Team]
  private val roles = TrieMap.empty[Long, Role]
  private val measPerms = TrieMap.empty[Long, MeasPerm]
  private val memberships = TrieMap.empty[Long, Membership]

  // ---- persistence ------------------------------------------------------

  private def dirOf(kind: String) = new Path(root, s"_admin/auth/$kind")

  private def writeRec(kind: String, id: Long, fill: ObjectNode => Unit): Unit = {
    val n = mapper.createObjectNode()
    n.put("id", id)
    fill(n)
    RecordFiles.write(hconf, dirOf(kind), s"$id.json", mapper.writeValueAsBytes(n))
  }

  private def dropRec(kind: String, id: Long): Unit = {
    RecordFiles.delete(hconf, new Path(dirOf(kind), s"$id.json")); ()
  }

  private def loadAll(kind: String)(f: ObjectNode => Unit): Unit =
    RecordFiles.list(hconf, dirOf(kind), ".json").foreach { p =>
      RecordFiles.read(hconf, p).foreach(bytes =>
        f(mapper.readTree(bytes).asInstanceOf[ObjectNode]))
    }

  private def strs(n: ObjectNode, field: String): Seq[String] =
    Option(n.get(field)).toSeq.flatMap(a => (0 until a.size()).map(a.get(_).asText))

  locally {
    loadAll("organizations")(n => orgs(n.get("id").asLong) = Org(
      n.get("id").asLong, n.get("name").asText,
      Option(n.get("description")).filterNot(_.isNull).map(_.asText).getOrElse(""),
      Option(n.get("enabled")).forall(_.asBoolean), n.get("created_at").asText))
    loadAll("teams")(n => teams(n.get("id").asLong) = Team(
      n.get("id").asLong, n.get("organization_id").asLong, n.get("name").asText,
      Option(n.get("description")).filterNot(_.isNull).map(_.asText).getOrElse(""),
      Option(n.get("enabled")).forall(_.asBoolean), n.get("created_at").asText))
    loadAll("roles")(n => roles(n.get("id").asLong) = Role(
      n.get("id").asLong, n.get("team_id").asLong,
      n.get("database_pattern").asText, strs(n, "permissions"),
      n.get("created_at").asText))
    loadAll("meas_perms")(n => measPerms(n.get("id").asLong) = MeasPerm(
      n.get("id").asLong, n.get("role_id").asLong,
      n.get("measurement_pattern").asText, strs(n, "permissions"),
      n.get("created_at").asText))
    loadAll("memberships")(n => memberships(n.get("id").asLong) = Membership(
      n.get("id").asLong, n.get("token_id").asLong, n.get("team_id").asLong,
      n.get("created_at").asText))
  }

  private def nextId(ids: Iterable[Long]): Long = (ids ++ Seq(0L)).max + 1
  private def now(): String = Instant.now().toString

  private def validPerms(ps: Seq[String]): Unit = {
    require(ps.nonEmpty, "permissions must not be empty")
    ps.foreach(p => require(Auth.ValidPermissions.contains(p),
      s"Invalid permission: $p"))
  }

  /** reference rbac_manager.go:26 validatePattern + :37 validateName. */
  private def validPattern(p: String): Unit = {
    require(p.nonEmpty, "pattern must not be empty")
    require(p.length <= 256, "pattern too long")
  }

  // ---- CRUD (reference rbac_manager.go Organizations/Teams/Roles) -------

  def createOrg(name: String, description: String): Org = lock.synchronized {
    require(name.nonEmpty, "organization name is required")
    require(!orgs.values.exists(_.name == name), s"organization '$name' already exists")
    val o = Org(nextId(orgs.keys), name, description, enabled = true, now())
    persistOrg(o); orgs(o.id) = o; o
  }
  private def persistOrg(o: Org): Unit =
    writeRec("organizations", o.id, { n =>
      n.put("name", o.name); n.put("description", o.description)
      n.put("enabled", o.enabled); n.put("created_at", o.createdAt); ()
    })
  def getOrg(id: Long): Option[Org] = orgs.get(id)
  def listOrgs(): Seq[Org] = orgs.values.toSeq.sortBy(_.id)
  def updateOrg(id: Long, name: Option[String], description: Option[String],
      enabled: Option[Boolean]): Option[Org] = lock.synchronized {
    orgs.get(id).map { o =>
      val no = o.copy(name = name.getOrElse(o.name),
        description = description.getOrElse(o.description),
        enabled = enabled.getOrElse(o.enabled))
      persistOrg(no); orgs(id) = no; no
    }
  }
  /** Cascade: teams → roles → measurement perms → memberships
    * (reference DeleteOrganization). */
  def deleteOrg(id: Long): Boolean = lock.synchronized {
    orgs.remove(id) match {
      case Some(_) =>
        dropRec("organizations", id)
        teams.values.filter(_.orgId == id).map(_.id).foreach(deleteTeamLocked)
        true
      case None => false
    }
  }

  def createTeam(orgId: Long, name: String, description: String): Team =
    lock.synchronized {
      require(orgs.contains(orgId), s"organization $orgId not found")
      require(name.nonEmpty, "team name is required")
      val t = Team(nextId(teams.keys), orgId, name, description,
        enabled = true, now())
      persistTeam(t); teams(t.id) = t; t
    }
  private def persistTeam(t: Team): Unit =
    writeRec("teams", t.id, { n =>
      n.put("organization_id", t.orgId); n.put("name", t.name)
      n.put("description", t.description); n.put("enabled", t.enabled)
      n.put("created_at", t.createdAt); ()
    })
  def getTeam(id: Long): Option[Team] = teams.get(id)
  def listTeams(orgId: Long): Seq[Team] =
    teams.values.filter(_.orgId == orgId).toSeq.sortBy(_.id)
  def updateTeam(id: Long, name: Option[String], description: Option[String],
      enabled: Option[Boolean]): Option[Team] = lock.synchronized {
    teams.get(id).map { t =>
      val nt = t.copy(name = name.getOrElse(t.name),
        description = description.getOrElse(t.description),
        enabled = enabled.getOrElse(t.enabled))
      persistTeam(nt); teams(id) = nt; nt
    }
  }
  def deleteTeam(id: Long): Boolean = lock.synchronized {
    if (teams.contains(id)) { deleteTeamLocked(id); true } else false
  }
  private def deleteTeamLocked(id: Long): Unit = {
    teams.remove(id); dropRec("teams", id)
    roles.values.filter(_.teamId == id).map(_.id).foreach(deleteRoleLocked)
    memberships.values.filter(_.teamId == id).map(_.id).foreach { mid =>
      memberships.remove(mid); dropRec("memberships", mid)
    }
  }

  def createRole(teamId: Long, databasePattern: String,
      permissions: Seq[String]): Role = lock.synchronized {
    require(teams.contains(teamId), s"team $teamId not found")
    validPattern(databasePattern); validPerms(permissions)
    val r = Role(nextId(roles.keys), teamId, databasePattern, permissions, now())
    persistRole(r); roles(r.id) = r; r
  }
  private def persistRole(r: Role): Unit =
    writeRec("roles", r.id, { n =>
      n.put("team_id", r.teamId); n.put("database_pattern", r.databasePattern)
      val a = n.putArray("permissions"); r.permissions.foreach(a.add)
      n.put("created_at", r.createdAt); ()
    })
  def getRole(id: Long): Option[Role] = roles.get(id)
  def listRoles(teamId: Long): Seq[Role] =
    roles.values.filter(_.teamId == teamId).toSeq.sortBy(_.id)
  def updateRole(id: Long, databasePattern: Option[String],
      permissions: Option[Seq[String]]): Option[Role] = lock.synchronized {
    roles.get(id).map { r =>
      databasePattern.foreach(validPattern)
      permissions.foreach(validPerms)
      val nr = r.copy(databasePattern = databasePattern.getOrElse(r.databasePattern),
        permissions = permissions.getOrElse(r.permissions))
      persistRole(nr); roles(id) = nr; nr
    }
  }
  def deleteRole(id: Long): Boolean = lock.synchronized {
    if (roles.contains(id)) { deleteRoleLocked(id); true } else false
  }
  private def deleteRoleLocked(id: Long): Unit = {
    roles.remove(id); dropRec("roles", id)
    measPerms.values.filter(_.roleId == id).map(_.id).foreach { mid =>
      measPerms.remove(mid); dropRec("meas_perms", mid)
    }
  }

  def createMeasPerm(roleId: Long, pattern: String,
      permissions: Seq[String]): MeasPerm = lock.synchronized {
    require(roles.contains(roleId), s"role $roleId not found")
    validPattern(pattern); validPerms(permissions)
    val m = MeasPerm(nextId(measPerms.keys), roleId, pattern, permissions, now())
    writeRec("meas_perms", m.id, { n =>
      n.put("role_id", m.roleId); n.put("measurement_pattern", m.measurementPattern)
      val a = n.putArray("permissions"); m.permissions.foreach(a.add)
      n.put("created_at", m.createdAt); ()
    })
    measPerms(m.id) = m; m
  }
  def listMeasPerms(roleId: Long): Seq[MeasPerm] =
    measPerms.values.filter(_.roleId == roleId).toSeq.sortBy(_.id)
  def deleteMeasPerm(id: Long): Boolean = lock.synchronized {
    measPerms.remove(id) match {
      case Some(_) => dropRec("meas_perms", id); true
      case None => false
    }
  }

  def addMembership(tokenId: Long, teamId: Long): Membership =
    lock.synchronized {
      require(teams.contains(teamId), s"team $teamId not found")
      require(!memberships.values.exists(m =>
        m.tokenId == tokenId && m.teamId == teamId),
        "token is already a member of this team")
      val m = Membership(nextId(memberships.keys), tokenId, teamId, now())
      writeRec("memberships", m.id, { n =>
        n.put("token_id", m.tokenId); n.put("team_id", m.teamId)
        n.put("created_at", m.createdAt); ()
      })
      memberships(m.id) = m; m
    }
  def removeMembership(tokenId: Long, teamId: Long): Boolean =
    lock.synchronized {
      memberships.values.find(m => m.tokenId == tokenId && m.teamId == teamId) match {
        case Some(m) =>
          memberships.remove(m.id); dropRec("memberships", m.id); true
        case None => false
      }
    }
  /** Cascade for token deletion: a removed token must not leave grants
    * behind for a future holder of its id. */
  def removeAllMemberships(tokenId: Long): Int = lock.synchronized {
    val mine = memberships.values.filter(_.tokenId == tokenId).toSeq
    mine.foreach { m =>
      memberships.remove(m.id); dropRec("memberships", m.id)
    }
    mine.size
  }

  def tokenTeams(tokenId: Long): Seq[Team] =
    memberships.values.filter(_.tokenId == tokenId).toSeq
      .flatMap(m => teams.get(m.teamId)).sortBy(_.id)

  // ---- permission checks --------------------------------------------------

  /** reference rbac_manager.go matchPattern (exact, `*`, `pfx_*`,
    * `*_sfx`, `pfx*`). */
  def matchPattern(pattern: String, value: String): Boolean =
    if (pattern == "*") true
    else if (pattern.endsWith("_*"))
      value.startsWith(pattern.dropRight(2) + "_")
    else if (pattern.startsWith("*_"))
      value.endsWith("_" + pattern.drop(2))
    else if (pattern.endsWith("*")) value.startsWith(pattern.dropRight(1))
    else pattern == value

  private def ossCheck(t: TokenInfo, perm: String): PermissionResult =
    if (t.has(perm)) PermissionResult(allowed = true, "token")
    else PermissionResult(allowed = false, "denied",
      s"token does not have '$perm' permission")

  /** reference checkRBACPermissionCached (rbac_manager.go:1775). */
  private def rbacWalk(t: TokenInfo, database: String, measurement: String,
      perm: String): Boolean = {
    if (!t.enabled) return false
    tokenTeams(t.id).filter(_.enabled).exists { team =>
      roles.values.filter(_.teamId == team.id).exists { role =>
        if (!matchPattern(role.databasePattern, database)) false
        else {
          val mps = listMeasPerms(role.id)
          if (measurement.nonEmpty && mps.nonEmpty)
            // measurement perms decide exclusively for this role
            mps.exists(mp => matchPattern(mp.measurementPattern, measurement) &&
              mp.permissions.contains(perm))
          else role.permissions.contains(perm)
        }
      }
    }
  }

  /** reference CheckPermission → checkPermissionUncached. */
  def check(token: Option[TokenInfo], database: String, measurement: String,
      permission: String): PermissionResult = token match {
    case None =>
      PermissionResult(allowed = false, "denied", "no token provided")
    case Some(t) if !enabled => ossCheck(t, permission)
    case Some(t) =>
      val ts = tokenTeams(t.id)
      if (ts.isEmpty) ossCheck(t, permission) // backward compat
      else if (rbacWalk(t, database, measurement, permission))
        PermissionResult(allowed = true, "rbac")
      else {
        val oss = ossCheck(t, permission) // OSS perms are a floor
        if (oss.allowed) oss
        else PermissionResult(allowed = false, "denied",
          s"no permission for $permission on database '$database'")
      }
  }

  /** reference CheckPermissionsBatch: same-token refs share one
    * membership load — in-memory here, so just a map. */
  def checkBatch(token: Option[TokenInfo],
      refs: Seq[(String, String)], permission: String): Seq[PermissionResult] =
    refs.map { case (db, meas) => check(token, db, meas, permission) }

  /** True when the token can pass a coarse route gate for `perm`.
    * Deliberate divergence from the reference's RequireRead/Write
    * (middleware.go:193-207, OSS-only): an RBAC-only token (empty OSS
    * permission list + team memberships, auth.go PermissionsNone) would
    * be 403'd at the route gate before its scoped grants were ever
    * consulted. Here such a token passes the coarse gate and is
    * enforced by the per-resource check — never weaker (the resource
    * check includes the OSS floor), but scoped tokens actually work. */
  def passesCoarse(t: TokenInfo, perm: String): Boolean =
    t.has(perm) ||
      // only read/write defer to a downstream resource check; the admin
      // plane has none, so admin stays OSS-only (reference RequireAdmin)
      ((perm == "read" || perm == "write") &&
        enabled && tokenTeams(t.id).exists(_.enabled))

  /** reference GetEffectivePermissions (rbac_manager.go:1880). */
  def effectivePermissions(t: TokenInfo): Seq[(String, String, Seq[String], String)] = {
    val oss = if (t.permissions.nonEmpty)
      Seq(("*", "", t.permissions, "token")) else Nil
    if (!enabled) oss
    else oss ++ tokenTeams(t.id).filter(_.enabled).flatMap { team =>
      roles.values.filter(_.teamId == team.id).toSeq.sortBy(_.id).flatMap { role =>
        val mps = listMeasPerms(role.id)
        if (mps.isEmpty) Seq((role.databasePattern, "", role.permissions, "rbac"))
        else mps.map(mp =>
          (role.databasePattern, mp.measurementPattern, mp.permissions, "rbac"))
      }
    }
  }
}
