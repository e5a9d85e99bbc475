package graft.server

import com.fasterxml.jackson.databind.JsonNode
import com.sun.net.httpserver.HttpExchange

import scala.util.matching.Regex

/** Token + RBAC HTTP plane — the reference's auth_routes.go /
  * rbac_routes.go surface over [[AuthStore]]/[[Rbac]]:
  *
  *  - `GET /api/v1/auth/verify` — self-check for any valid token;
  *  - `/api/v1/auth/tokens` CRUD + rotate/revoke (admin-gated, like
  *    auth_routes.go:41-47);
  *  - `/api/v1/auth/tokens/{id}/teams` membership CRUD +
  *    `/{id}/permissions` effective view (auth_routes.go:446-458);
  *  - `/api/v1/rbac/...` organizations/teams/roles/measurement
  *    permissions CRUD (rbac_routes.go:79-116), 403 when RBAC is off
  *    (the reference's license gate).
  *
  * Envelope shapes mirror the reference handlers (`{"success":…}`,
  * created = 201, missing = 404, validation = 400). */
final class AuthApi(srv: HttpServer) {

  private def q(s: String) = graft.query.QueryFacade.jsonStr(s)
  private def ok(ex: HttpExchange, status: Int, json: String): Unit =
    srv.sendJson(ex, status, json)
  private def fail(ex: HttpExchange, status: Int, m: String): Unit =
    srv.sendJson(ex, status, s"""{"success":false,"error":${q(m)}}""")

  private def body(ex: HttpExchange): JsonNode = {
    val raw = srv.readBody(ex)
    if (raw.isEmpty) srv.mapper.createObjectNode() else srv.mapper.readTree(raw)
  }
  private def oText(n: JsonNode, f: String): Option[String] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asText).filter(_.nonEmpty)
  private def oBool(n: JsonNode, f: String): Option[Boolean] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asBoolean)
  private def oLong(n: JsonNode, f: String): Option[Long] =
    Option(n.get(f)).filterNot(_.isNull).map(_.asLong)
  private def oArr(n: JsonNode, f: String): Option[Seq[String]] =
    Option(n.get(f)).filterNot(_.isNull).filter(_.isArray)
      .map(a => (0 until a.size()).map(a.get(_).asText))

  /** Admin coarse gate (reference auth.RequireAdmin): OSS admin
    * permission only — RBAC grants never confer admin-plane access. */
  private def adminGate(ex: HttpExchange): Boolean =
    if (srv.authDisabled || srv.tokenOf(ex).exists(_.has("admin"))) true
    else { fail(ex, 403, "Permission denied: admin required"); false }

  /** RBAC feature gate (reference rbac_routes.go requireRBACLicense). */
  private def rbacGate(ex: HttpExchange): Boolean =
    if (srv.rbac.enabled) true
    else { fail(ex, 403, "RBAC is not enabled"); false }

  // ---- JSON renderers -----------------------------------------------------

  private def orgJson(o: srv.rbac.Org): String =
    s"""{"id":${o.id},"name":${q(o.name)},"description":${q(o.description)},""" +
      s""""enabled":${o.enabled},"created_at":${q(o.createdAt)}}"""
  private def teamJson(t: srv.rbac.Team): String =
    s"""{"id":${t.id},"organization_id":${t.orgId},"name":${q(t.name)},""" +
      s""""description":${q(t.description)},"enabled":${t.enabled},""" +
      s""""created_at":${q(t.createdAt)}}"""
  private def roleJson(r: srv.rbac.Role): String =
    s"""{"id":${r.id},"team_id":${r.teamId},""" +
      s""""database_pattern":${q(r.databasePattern)},""" +
      s""""permissions":${r.permissions.map(q).mkString("[", ",", "]")},""" +
      s""""created_at":${q(r.createdAt)}}"""
  private def measJson(m: srv.rbac.MeasPerm): String =
    s"""{"id":${m.id},"role_id":${m.roleId},""" +
      s""""measurement_pattern":${q(m.measurementPattern)},""" +
      s""""permissions":${m.permissions.map(q).mkString("[", ",", "]")},""" +
      s""""created_at":${q(m.createdAt)}}"""

  // ---- routing --------------------------------------------------------------

  private val TokId: Regex = "/api/v1/auth/tokens/([0-9]+)".r
  private val TokAct: Regex = "/api/v1/auth/tokens/([0-9]+)/(rotate|revoke|teams|permissions)".r
  private val TokTeam: Regex = "/api/v1/auth/tokens/([0-9]+)/teams/([0-9]+)".r
  private val OrgId: Regex = "/api/v1/rbac/organizations/([0-9]+)".r
  private val OrgTeams: Regex = "/api/v1/rbac/organizations/([0-9]+)/teams".r
  private val TeamId: Regex = "/api/v1/rbac/teams/([0-9]+)".r
  private val TeamRoles: Regex = "/api/v1/rbac/teams/([0-9]+)/roles".r
  private val RoleId: Regex = "/api/v1/rbac/roles/([0-9]+)".r
  private val RoleMeas: Regex = "/api/v1/rbac/roles/([0-9]+)/measurements".r
  private val MeasId: Regex = "/api/v1/rbac/measurement-permissions/([0-9]+)".r

  /** Dispatch; false = not an auth/rbac path. */
  private val GovTok: Regex = "/api/v1/governance/policies/([0-9]+)".r
  private val GovUse: Regex = "/api/v1/governance/usage/([0-9]+)".r

  private[server] def route(method: String, path: String,
      ex: HttpExchange): Boolean = {
    if (!path.startsWith("/api/v1/auth") && !path.startsWith("/api/v1/rbac") &&
      !path.startsWith("/api/v1/governance") && !path.startsWith("/api/v1/audit"))
      return false
    (method, path) match {
      case ("GET", "/api/v1/auth/verify") => handleVerify(ex)

      // ---- governance (internal/api/governance.go) -----------------------
      case ("GET", "/api/v1/governance/policies") => if (adminGate(ex)) {
        val ps = srv.governance.list().map(_.json)
        ok(ex, 200, s"""{"success":true,"policies":${ps.mkString("[", ",", "]")},"count":${ps.size}}""")
      }
      case ("POST", "/api/v1/governance/policies") => if (adminGate(ex))
        handleGovSet(ex, None)
      case ("PUT", GovTok(id)) => if (adminGate(ex))
        handleGovSet(ex, Some(id.toLong))
      case ("GET", GovTok(id)) => if (adminGate(ex)) {
        srv.governance.get(id.toLong) match {
          case Some(p) => ok(ex, 200, s"""{"success":true,"policy":${p.json}}""")
          case None => fail(ex, 404, "Policy not found")
        }
      }
      case ("DELETE", GovTok(id)) => if (adminGate(ex)) {
        if (srv.governance.delete(id.toLong))
          ok(ex, 200, """{"success":true,"message":"Policy deleted"}""")
        else fail(ex, 404, "Policy not found")
      }
      case ("GET", GovUse(id)) => if (adminGate(ex))
        ok(ex, 200, s"""{"success":true,"usage":${srv.governance.usageJson(id.toLong)}}""")

      // ---- audit (internal/api/audit_routes.go) --------------------------
      case ("GET", "/api/v1/audit/logs") => if (adminGate(ex)) {
        val params = srv.queryParams(ex)
        val logs = srv.audit.query(
          eventType = params.get("event_type"),
          actor = params.get("actor"),
          database = params.get("database"),
          limit = params.get("limit").flatMap(_.toIntOption).getOrElse(100))
        ok(ex, 200,
          s"""{"success":true,"logs":${logs.mkString("[", ",", "]")},"count":${logs.size}}""")
      }
      case ("GET", "/api/v1/audit/stats") => if (adminGate(ex)) {
        val st = srv.audit.stats().toSeq.sortBy(_._1)
          .map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
        ok(ex, 200, s"""{"success":true,"stats":$st}""")
      }

      case ("GET", "/api/v1/auth/tokens") => if (adminGate(ex)) {
        val ts = srv.tokens.list().map(_.json)
        ok(ex, 200, s"""{"success":true,"tokens":${ts.mkString("[", ",", "]")},"count":${ts.size}}""")
      }
      case ("POST", "/api/v1/auth/tokens") => if (adminGate(ex)) handleCreate(ex)
      case ("GET", TokId(id)) => if (adminGate(ex)) {
        srv.tokens.get(id.toLong) match {
          case Some(t) => ok(ex, 200, s"""{"success":true,"token":${t.json}}""")
          case None => fail(ex, 404, "Token not found")
        }
      }
      case ("PATCH", TokId(id)) => if (adminGate(ex)) handleUpdate(ex, id.toLong)
      case ("DELETE", TokId(id)) => if (adminGate(ex)) {
        if (srv.tokens.delete(id.toLong)) {
          // cascade: RBAC memberships and the governance policy are
          // keyed by token id — left behind they'd transfer to any
          // future token reusing the id
          srv.rbac.removeAllMemberships(id.toLong)
          srv.governance.delete(id.toLong)
          ok(ex, 200, """{"success":true,"message":"Token deleted"}""")
        } else fail(ex, 404, "Token not found")
      }
      case ("POST", TokAct(id, "rotate")) => if (adminGate(ex)) {
        srv.tokens.rotate(id.toLong) match {
          case Some(v) => ok(ex, 200,
            s"""{"success":true,"token":${q(v)},"message":"Token rotated successfully. Store this token securely - it cannot be retrieved again."}""")
          case None => fail(ex, 404, "Token not found")
        }
      }
      case ("POST", TokAct(id, "revoke")) => if (adminGate(ex)) {
        if (srv.tokens.revoke(id.toLong))
          ok(ex, 200, """{"success":true,"message":"Token revoked"}""")
        else fail(ex, 404, "Token not found")
      }
      case ("GET", TokAct(id, "teams")) => if (adminGate(ex)) {
        val ts = srv.rbac.tokenTeams(id.toLong).map(teamJson)
        ok(ex, 200, s"""{"success":true,"teams":${ts.mkString("[", ",", "]")},"count":${ts.size}}""")
      }
      case ("POST", TokAct(id, "teams")) => if (adminGate(ex) && rbacGate(ex)) {
        val n = body(ex)
        oLong(n, "team_id") match {
          case None => fail(ex, 400, "team_id is required")
          case Some(teamId) =>
            if (srv.tokens.get(id.toLong).isEmpty) fail(ex, 404, "Token not found")
            else {
              val m = srv.rbac.addMembership(id.toLong, teamId)
              ok(ex, 201,
                s"""{"success":true,"membership":{"id":${m.id},"token_id":${m.tokenId},"team_id":${m.teamId},"created_at":${q(m.createdAt)}}}""")
            }
        }
      }
      case ("DELETE", TokTeam(id, teamId)) => if (adminGate(ex) && rbacGate(ex)) {
        if (srv.rbac.removeMembership(id.toLong, teamId.toLong))
          ok(ex, 200, """{"success":true,"message":"Token removed from team"}""")
        else fail(ex, 404, "Membership not found")
      }
      case ("GET", TokAct(id, "permissions")) => if (adminGate(ex)) {
        srv.tokens.get(id.toLong) match {
          case None => fail(ex, 404, "Token not found")
          case Some(t) =>
            val ps = srv.rbac.effectivePermissions(t).map {
              case (db, meas, perms, source) =>
                val m = if (meas.isEmpty) "" else s""""measurement":${q(meas)},"""
                s"""{"database":${q(db)},$m"permissions":${perms.map(q).mkString("[", ",", "]")},"source":${q(source)}}"""
            }
            ok(ex, 200,
              s"""{"success":true,"permissions":${ps.mkString("[", ",", "]")},"rbac_enabled":${srv.rbac.enabled}}""")
        }
      }

      // ---- RBAC resources (rbac_routes.go) --------------------------------
      case ("GET", "/api/v1/rbac/organizations") => if (adminGate(ex) && rbacGate(ex)) {
        val os = srv.rbac.listOrgs().map(orgJson)
        ok(ex, 200, s"""{"success":true,"organizations":${os.mkString("[", ",", "]")},"count":${os.size}}""")
      }
      case ("POST", "/api/v1/rbac/organizations") => if (adminGate(ex) && rbacGate(ex)) {
        val n = body(ex)
        oText(n, "name") match {
          case None => fail(ex, 400, "Organization name is required")
          case Some(name) =>
            val o = srv.rbac.createOrg(name, oText(n, "description").getOrElse(""))
            ok(ex, 201, s"""{"success":true,"organization":${orgJson(o)}}""")
        }
      }
      case ("GET", OrgId(id)) => if (adminGate(ex) && rbacGate(ex)) {
        srv.rbac.getOrg(id.toLong) match {
          case Some(o) => ok(ex, 200, s"""{"success":true,"organization":${orgJson(o)}}""")
          case None => fail(ex, 404, "Organization not found")
        }
      }
      case ("PATCH", OrgId(id)) => if (adminGate(ex) && rbacGate(ex)) {
        val n = body(ex)
        srv.rbac.updateOrg(id.toLong, oText(n, "name"),
          oText(n, "description"), oBool(n, "enabled")) match {
          case Some(o) => ok(ex, 200, s"""{"success":true,"organization":${orgJson(o)}}""")
          case None => fail(ex, 404, "Organization not found")
        }
      }
      case ("DELETE", OrgId(id)) => if (adminGate(ex) && rbacGate(ex)) {
        if (srv.rbac.deleteOrg(id.toLong))
          ok(ex, 200, """{"success":true,"message":"Organization deleted"}""")
        else fail(ex, 404, "Organization not found")
      }

      case ("GET", OrgTeams(orgId)) => if (adminGate(ex) && rbacGate(ex)) {
        val ts = srv.rbac.listTeams(orgId.toLong).map(teamJson)
        ok(ex, 200, s"""{"success":true,"teams":${ts.mkString("[", ",", "]")},"count":${ts.size}}""")
      }
      case ("POST", OrgTeams(orgId)) => if (adminGate(ex) && rbacGate(ex)) {
        val n = body(ex)
        oText(n, "name") match {
          case None => fail(ex, 400, "Team name is required")
          case Some(name) =>
            val t = srv.rbac.createTeam(orgId.toLong, name,
              oText(n, "description").getOrElse(""))
            ok(ex, 201, s"""{"success":true,"team":${teamJson(t)}}""")
        }
      }
      case ("GET", TeamId(id)) => if (adminGate(ex) && rbacGate(ex)) {
        srv.rbac.getTeam(id.toLong) match {
          case Some(t) => ok(ex, 200, s"""{"success":true,"team":${teamJson(t)}}""")
          case None => fail(ex, 404, "Team not found")
        }
      }
      case ("PATCH", TeamId(id)) => if (adminGate(ex) && rbacGate(ex)) {
        val n = body(ex)
        srv.rbac.updateTeam(id.toLong, oText(n, "name"),
          oText(n, "description"), oBool(n, "enabled")) match {
          case Some(t) => ok(ex, 200, s"""{"success":true,"team":${teamJson(t)}}""")
          case None => fail(ex, 404, "Team not found")
        }
      }
      case ("DELETE", TeamId(id)) => if (adminGate(ex) && rbacGate(ex)) {
        if (srv.rbac.deleteTeam(id.toLong))
          ok(ex, 200, """{"success":true,"message":"Team deleted"}""")
        else fail(ex, 404, "Team not found")
      }

      case ("GET", TeamRoles(teamId)) => if (adminGate(ex) && rbacGate(ex)) {
        val rs = srv.rbac.listRoles(teamId.toLong).map(roleJson)
        ok(ex, 200, s"""{"success":true,"roles":${rs.mkString("[", ",", "]")},"count":${rs.size}}""")
      }
      case ("POST", TeamRoles(teamId)) => if (adminGate(ex) && rbacGate(ex)) {
        val n = body(ex)
        (oText(n, "database_pattern"), oArr(n, "permissions")) match {
          case (Some(pat), Some(perms)) =>
            val r = srv.rbac.createRole(teamId.toLong, pat, perms)
            ok(ex, 201, s"""{"success":true,"role":${roleJson(r)}}""")
          case _ => fail(ex, 400, "database_pattern and permissions are required")
        }
      }
      case ("GET", RoleId(id)) => if (adminGate(ex) && rbacGate(ex)) {
        srv.rbac.getRole(id.toLong) match {
          case Some(r) => ok(ex, 200, s"""{"success":true,"role":${roleJson(r)}}""")
          case None => fail(ex, 404, "Role not found")
        }
      }
      case ("PATCH", RoleId(id)) => if (adminGate(ex) && rbacGate(ex)) {
        val n = body(ex)
        srv.rbac.updateRole(id.toLong, oText(n, "database_pattern"),
          oArr(n, "permissions")) match {
          case Some(r) => ok(ex, 200, s"""{"success":true,"role":${roleJson(r)}}""")
          case None => fail(ex, 404, "Role not found")
        }
      }
      case ("DELETE", RoleId(id)) => if (adminGate(ex) && rbacGate(ex)) {
        if (srv.rbac.deleteRole(id.toLong))
          ok(ex, 200, """{"success":true,"message":"Role deleted"}""")
        else fail(ex, 404, "Role not found")
      }

      case ("GET", RoleMeas(roleId)) => if (adminGate(ex) && rbacGate(ex)) {
        val ms = srv.rbac.listMeasPerms(roleId.toLong).map(measJson)
        ok(ex, 200, s"""{"success":true,"measurement_permissions":${ms.mkString("[", ",", "]")},"count":${ms.size}}""")
      }
      case ("POST", RoleMeas(roleId)) => if (adminGate(ex) && rbacGate(ex)) {
        val n = body(ex)
        (oText(n, "measurement_pattern"), oArr(n, "permissions")) match {
          case (Some(pat), Some(perms)) =>
            val m = srv.rbac.createMeasPerm(roleId.toLong, pat, perms)
            ok(ex, 201, s"""{"success":true,"measurement_permission":${measJson(m)}}""")
          case _ => fail(ex, 400, "measurement_pattern and permissions are required")
        }
      }
      case ("DELETE", MeasId(id)) => if (adminGate(ex) && rbacGate(ex)) {
        if (srv.rbac.deleteMeasPerm(id.toLong))
          ok(ex, 200, """{"success":true,"message":"Measurement permission deleted"}""")
        else fail(ex, 404, "Measurement permission not found")
      }

      case _ => fail(ex, 404, s"no route: $method $path")
    }
    true
  }

  /** reference auth_routes.go:55 verifyToken: identity echo for the
    * presented credential. */
  private def handleVerify(ex: HttpExchange): Unit =
    srv.tokenOf(ex) match {
      case Some(t) =>
        ok(ex, 200, s"""{"valid":true,"token_info":${t.json},""" +
          s""""permissions":${t.permissions.map(q).mkString("[", ",", "]")}}""")
      case None if srv.authDisabled =>
        ok(ex, 200, """{"valid":true,"token_info":null,"permissions":[]}""")
      case None =>
        srv.sendJson(ex, 401, """{"valid":false,"error":"No token provided"}""")
    }

  /** reference auth_routes.go:91 createToken, incl. the permissions
    * overload (absent = default read,write; explicit [] = RBAC-only)
    * and `expires_in` durations ("24h", "7d"). */
  private def handleCreate(ex: HttpExchange): Unit = {
    val n = body(ex)
    oText(n, "name") match {
      case None => fail(ex, 400, "Token name is required")
      case Some(name) =>
        val expiresAt = oText(n, "expires_in") match {
          case None => None
          case Some(s) =>
            val m = "^([0-9]+)([smhd])$".r.findFirstMatchIn(s)
            m match {
              case None =>
                fail(ex, 400, "Invalid expires_in format. Use duration like '24h' or '7d'")
                return
              case Some(g) =>
                val unit = g.group(2) match {
                  case "s" => 1L case "m" => 60L case "h" => 3600L
                  case _ => 86400L
                }
                Some(java.time.Instant.now()
                  .plusSeconds(g.group(1).toLong * unit).toString)
            }
        }
        try {
          val (value, _) = srv.tokens.create(name,
            oText(n, "description").getOrElse(""), oArr(n, "permissions"),
            expiresAt)
          ok(ex, 201, s"""{"success":true,"token":${q(value)},""" +
            """"message":"Token created successfully. Store this token securely - it cannot be retrieved again."}""")
        } catch {
          case e: IllegalArgumentException => fail(ex, 400, e.getMessage)
        }
    }
  }

  /** Create (POST, token_id in the body) or update (PUT /:token_id) a
    * governance policy — same upsert semantics as the reference's
    * keyed-by-token store. */
  private def handleGovSet(ex: HttpExchange, pathId: Option[Long]): Unit = {
    val n = body(ex)
    val tokenId = pathId.orElse(oLong(n, "token_id")).getOrElse {
      fail(ex, 400, "token_id is required"); return
    }
    // PUT merges over the existing policy (reference UpdatePolicy reads
    // the existing record first, governance.go:178): an omitted field
    // keeps its current value — defaulting it to 0 (= unlimited) would
    // let a partial update silently wipe every other cap
    val existing = srv.governance.get(tokenId)
    def i(f: String, cur: Governance.Policy => Int): Int =
      Option(n.get(f)).filterNot(_.isNull).map(_.asInt)
        .orElse(existing.map(cur)).getOrElse(0)
    try {
      val p = srv.governance.set(tokenId,
        oText(n, "token_name").orElse(existing.map(_.tokenName).filter(_.nonEmpty))
          .orElse(srv.tokens.get(tokenId).map(_.name)).getOrElse(""),
        i("rate_limit_per_minute", _.rateLimitPerMinute),
        i("rate_limit_per_hour", _.rateLimitPerHour),
        i("max_queries_per_hour", _.maxQueriesPerHour),
        i("max_queries_per_day", _.maxQueriesPerDay),
        i("max_rows_per_query", _.maxRowsPerQuery),
        i("max_scan_duration_sec", _.maxScanDurationSec))
      ok(ex, if (pathId.isEmpty) 201 else 200,
        s"""{"success":true,"policy":${p.json}}""")
    } catch {
      case e: IllegalArgumentException => fail(ex, 400, e.getMessage)
    }
  }

  private def handleUpdate(ex: HttpExchange, id: Long): Unit = {
    val n = body(ex)
    try srv.tokens.update(id, oText(n, "name"), oText(n, "description"),
      oArr(n, "permissions"), oBool(n, "enabled")) match {
      case Some(t) => ok(ex, 200, s"""{"success":true,"token":${t.json}}""")
      case None => fail(ex, 404, "Token not found")
    } catch {
      case e: IllegalArgumentException => fail(ex, 400, e.getMessage)
    }
  }
}
