package graft.server

import graft.SparkSpec

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

/** RBAC end-to-end over a live socket: scoped tokens read/write only
  * their granted database/measurements, admin routes stay admin-only,
  * the static bearer keeps working, and the stores survive a restart.
  * (r8 verdict "What's missing" #1.) */
class AuthRbacSpec extends SparkSpec {

  private lazy val root = tmpDir("graft_rbac")
  private lazy val server = {
    val s = new HttpServer(spark, root, authToken = Some("rootsekrit"))
    s.rbac.enabled = true
    s
  }
  private lazy val base: String = s"http://127.0.0.1:${server.start()}"
  private val client = HttpClient.newHttpClient()
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def req(method: String, path: String, token: Option[String],
      body: Array[Byte] = Array.emptyByteArray,
      headers: Map[String, String] = Map.empty): HttpResponse[String] = {
    var b = HttpRequest.newBuilder(URI.create(base + path))
    b = method match {
      case "GET" => b.GET()
      case "DELETE" => b.DELETE()
      case m => b.method(m, HttpRequest.BodyPublishers.ofByteArray(body))
    }
    token.foreach(t => b = b.header("Authorization", s"Bearer $t"))
    headers.foreach { case (k, v) => b = b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }
  private def jsonOf(r: HttpResponse[String]) = mapper.readTree(r.body())
  private def jb(kv: (String, Any)*): Array[Byte] = {
    val n = mapper.createObjectNode()
    kv.foreach {
      case (k, v: String) => n.put(k, v)
      case (k, v: Long) => n.put(k, v)
      case (k, v: Int) => n.put(k, v.toLong)
      case (k, v: Seq[_]) =>
        val a = n.putArray(k); v.foreach(x => a.add(x.toString))
      case (k, v) => n.put(k, v.toString)
    }
    mapper.writeValueAsBytes(n)
  }
  private def sqlBody(sql: String): Array[Byte] = jb("sql" -> sql)
  private val Root = Some("rootsekrit")

  // fixture: db1/db2 each with measurement cpu (+ mem in db1), four
  // RBAC-only tokens scoped via teams, one OSS read token
  private lazy val fixture: Map[String, String] = {
    assert(req("POST", "/api/v1/databases", Root,
      jb("name" -> "db1")).statusCode() == 201)
    assert(req("POST", "/api/v1/databases", Root,
      jb("name" -> "db2")).statusCode() == 201)
    for (db <- Seq("db1", "db2"); m <- Seq("cpu", "mem")) {
      val lp = s"$m,host=a usage=1 1700000000000000000"
      assert(req("POST", s"/write?db=$db", Root,
        lp.getBytes(UTF_8)).statusCode() == 204)
    }
    def newToken(name: String): String = {
      val r = req("POST", "/api/v1/auth/tokens", Root,
        jb("name" -> name, "permissions" -> Seq.empty[String]))
      assert(r.statusCode() == 201, r.body())
      jsonOf(r).get("token").asText()
    }
    def tokenId(name: String): Long = {
      val all = jsonOf(req("GET", "/api/v1/auth/tokens", Root)).get("tokens")
      (0 until all.size()).map(all.get)
        .find(_.get("name").asText() == name).get.get("id").asLong()
    }
    val org = jsonOf(req("POST", "/api/v1/rbac/organizations", Root,
      jb("name" -> "acme"))).get("organization").get("id").asLong()
    def team(name: String): Long =
      jsonOf(req("POST", s"/api/v1/rbac/organizations/$org/teams", Root,
        jb("name" -> name))).get("team").get("id").asLong()
    def role(teamId: Long, db: String, perms: Seq[String]): Long =
      jsonOf(req("POST", s"/api/v1/rbac/teams/$teamId/roles", Root,
        jb("database_pattern" -> db, "permissions" -> perms)))
        .get("role").get("id").asLong()
    def member(tok: String, teamId: Long): Unit =
      assert(req("POST", s"/api/v1/auth/tokens/${tokenId(tok)}/teams", Root,
        jb("team_id" -> teamId)).statusCode() == 201)

    val a = newToken("reader-db1"); val ta = team("team-db1")
    role(ta, "db1", Seq("read")); member("reader-db1", ta)
    val b = newToken("reader-db2"); val tb = team("team-db2")
    role(tb, "db2", Seq("read")); member("reader-db2", tb)
    val w = newToken("writer-db1"); val tw = team("team-db1-write")
    role(tw, "db1", Seq("read", "write")); member("writer-db1", tw)
    // measurement-scoped: read ONLY db1.cpu
    val c = newToken("reader-db1-cpu"); val tc = team("team-db1-cpu")
    val rc = role(tc, "db1", Seq("read"))
    assert(req("POST", s"/api/v1/rbac/roles/$rc/measurements", Root,
      jb("measurement_pattern" -> "cpu", "permissions" -> Seq("read")))
      .statusCode() == 201)
    member("reader-db1-cpu", tc)
    // OSS floor: plain read everywhere, no memberships
    val o = jsonOf(req("POST", "/api/v1/auth/tokens", Root,
      jb("name" -> "oss-read", "permissions" -> Seq("read"))))
      .get("token").asText()
    Map("a" -> a, "b" -> b, "w" -> w, "c" -> c, "oss" -> o)
  }

  private def query(tok: String, db: String, sql: String): HttpResponse[String] =
    req("POST", "/api/v1/query", Some(tok), sqlBody(sql),
      Map("x-arc-database" -> db))

  test("no token is 401; static root token reads everything") {
    fixture
    assert(req("POST", "/api/v1/query", None,
      sqlBody("SELECT 1 AS one")).statusCode() == 401)
    assert(query("rootsekrit", "db1", "SELECT count(*) AS n FROM cpu")
      .statusCode() == 200)
  }

  test("scoped token reads its database; foreign database is 403") {
    val a = fixture("a"); val b = fixture("b")
    val ra = query(a, "db1", "SELECT count(*) AS n FROM cpu")
    assert(ra.statusCode() == 200, ra.body())
    assert(jsonOf(ra).get("data").get(0).get(0).asLong() == 1L)
    val rb = query(b, "db1", "SELECT count(*) AS n FROM cpu")
    assert(rb.statusCode() == 403, rb.body())
    assert(jsonOf(rb).get("error").asText()
      .contains("no read permission for db1.cpu"))
    assert(query(b, "db2", "SELECT count(*) AS n FROM cpu").statusCode() == 200)
    // the RBAC gate sits above the wire-format fork: arrow and msgpack
    // deny identically
    assert(req("POST", "/api/v1/query/arrow", Some(b),
      sqlBody("SELECT count(*) AS n FROM cpu"),
      Map("x-arc-database" -> "db1")).statusCode() == 403)
    assert(req("POST", "/api/v1/query/msgpack", Some(b),
      sqlBody("SELECT count(*) AS n FROM cpu"),
      Map("x-arc-database" -> "db1")).statusCode() == 403)
  }

  test("measurement-scoped role: cpu readable, mem denied, join denied") {
    val c = fixture("c")
    assert(query(c, "db1", "SELECT count(*) AS n FROM cpu").statusCode() == 200)
    val mem = query(c, "db1", "SELECT count(*) AS n FROM mem")
    assert(mem.statusCode() == 403, mem.body())
    // a join that touches one denied table is denied outright
    assert(query(c, "db1",
      "SELECT count(*) AS n FROM cpu JOIN mem ON cpu.host = mem.host")
      .statusCode() == 403)
    // ...including refs hidden in subqueries
    assert(query(c, "db1",
      "SELECT count(*) AS n FROM cpu WHERE host IN (SELECT host FROM mem)")
      .statusCode() == 403)
    // ...and CTE names are NOT treated as table refs
    assert(query(c, "db1",
      "WITH x AS (SELECT host FROM cpu) SELECT count(*) AS n FROM x")
      .statusCode() == 200)
  }

  test("simple-read where clause cannot smuggle a denied table past RBAC") {
    val c = fixture("c") // read db1.cpu only — db1.mem is denied
    // baseline: the plain simple-read on the granted measurement works
    val ok = req("GET", "/api/v1/query/cpu?database=db1&limit=5", Some(c))
    assert(ok.statusCode() == 200, ok.body())
    // the denylist (reference-parity) does not block SELECT/EXISTS —
    // without the parsed-plan re-check an EXISTS subquery is a boolean
    // oracle over db1.mem for a token that only holds db1.cpu
    val probe = req("GET",
      "/api/v1/query/cpu?database=db1&limit=5&where=" +
        java.net.URLEncoder.encode("EXISTS(SELECT host FROM mem)", "UTF-8"),
      Some(c))
    assert(probe.statusCode() == 403, probe.body())
    assert(jsonOf(probe).get("error").asText()
      .contains("no read permission for db1.mem"))
    // a where clause touching only the granted table still works
    val fine = req("GET",
      "/api/v1/query/cpu?database=db1&limit=5&where=" +
        java.net.URLEncoder.encode("host IS NOT NULL", "UTF-8"),
      Some(c))
    assert(fine.statusCode() == 200, fine.body())
  }

  test("CTE shadowing cannot hide a real table ref from the RBAC check") {
    val c = fixture("c") // read db1.cpu only
    // the OUTER mem ref is a real table read even though a same-named
    // CTE exists in a sibling subtree — global name subtraction would
    // wave it through (review finding: scope-insensitive bypass)
    val bypass = query(c, "db1",
      "SELECT count(*) AS n FROM mem UNION ALL " +
        "(WITH mem AS (SELECT 1 AS host) SELECT count(*) FROM mem)")
    assert(bypass.statusCode() == 403, bypass.body())
    // chained CTEs referencing earlier CTEs still resolve as virtual
    assert(query(c, "db1",
      "WITH x AS (SELECT host FROM cpu), y AS (SELECT * FROM x) " +
        "SELECT count(*) AS n FROM y").statusCode() == 200)
    // a CTE body referencing the real denied table is still caught
    assert(query(c, "db1",
      "WITH x AS (SELECT host FROM mem) SELECT count(*) AS n FROM x")
      .statusCode() == 403)
  }

  test("deleting a token cascades its memberships; new tokens never reuse the id") {
    fixture
    val r = req("POST", "/api/v1/auth/tokens", Root,
      jb("name" -> "doomed", "permissions" -> Seq.empty[String]))
    val all = jsonOf(req("GET", "/api/v1/auth/tokens", Root)).get("tokens")
    val id = (0 until all.size()).map(all.get)
      .find(_.get("name").asText() == "doomed").get.get("id").asLong()
    // give it a team grant, then delete it
    val org2 = jsonOf(req("POST", "/api/v1/rbac/organizations", Root,
      jb("name" -> "cascade-org"))).get("organization").get("id").asLong()
    val team2 = jsonOf(req("POST", s"/api/v1/rbac/organizations/$org2/teams",
      Root, jb("name" -> "cascade-team"))).get("team").get("id").asLong()
    assert(req("POST", s"/api/v1/auth/tokens/$id/teams", Root,
      jb("team_id" -> team2)).statusCode() == 201)
    assert(req("DELETE", s"/api/v1/auth/tokens/$id", Root).statusCode() == 200)
    assert(server.rbac.tokenTeams(id).isEmpty,
      "memberships must cascade with the token")
    // a fresh token takes a HIGHER id — reuse would inherit any grant
    // a stale record left behind
    val r2 = req("POST", "/api/v1/auth/tokens", Root, jb("name" -> "successor"))
    assert(r2.statusCode() == 201)
    val all2 = jsonOf(req("GET", "/api/v1/auth/tokens", Root)).get("tokens")
    val id2 = (0 until all2.size()).map(all2.get)
      .find(_.get("name").asText() == "successor").get.get("id").asLong()
    assert(id2 > id, s"id $id2 must not reuse deleted id $id")
    assert(r.statusCode() == 201)
  }

  test("query cancel, registry listing, history, and the log ring are admin-only") {
    val a = fixture("a")
    assert(req("POST", "/api/v1/query/12345/cancel", Some(a)).statusCode() == 403)
    assert(req("GET", "/api/v1/queries", Some(a)).statusCode() == 403)
    assert(req("GET", "/api/v1/queries", Root).statusCode() == 200)
    // history exposes other tenants' SQL text — same gate as the
    // active list (reference query_management.go:36 RequireAdmin)
    assert(req("GET", "/api/v1/queries/history", Some(a)).statusCode() == 403)
    assert(req("GET", "/api/v1/queries/history", Root).statusCode() == 200)
    assert(req("GET", "/api/v1/logs", Some(a)).statusCode() == 403)
    assert(req("GET", "/api/v1/logs", Root).statusCode() == 200)
  }

  test("writes: scoped writer 204 in its database, 403 elsewhere; readers cannot write") {
    val w = fixture("w"); val a = fixture("a")
    val lp = "cpu,host=b usage=2 1700000001000000000".getBytes(UTF_8)
    assert(req("POST", "/write?db=db1", Some(w), lp).statusCode() == 204)
    val denied = req("POST", "/write?db=db2", Some(w), lp)
    assert(denied.statusCode() == 403, denied.body())
    // read-only scoped token: coarse gate passes (membership), resource
    // check denies the write
    assert(req("POST", "/write?db=db1", Some(a), lp).statusCode() == 403)
  }

  test("OSS permission floor: plain read token reads every database but cannot write or admin") {
    val o = fixture("oss")
    assert(query(o, "db1", "SELECT count(*) AS n FROM cpu").statusCode() == 200)
    assert(query(o, "db2", "SELECT count(*) AS n FROM mem").statusCode() == 200)
    val lp = "cpu,host=c usage=3 1700000002000000000".getBytes(UTF_8)
    assert(req("POST", "/write?db=db1", Some(o), lp).statusCode() == 403)
    assert(req("GET", "/api/v1/auth/tokens", Some(o)).statusCode() == 403)
  }

  test("admin plane is admin-gated: token CRUD, rbac CRUD, retention, databases") {
    val a = fixture("a")
    assert(req("GET", "/api/v1/auth/tokens", Some(a)).statusCode() == 403)
    assert(req("GET", "/api/v1/rbac/organizations", Some(a)).statusCode() == 403)
    assert(req("GET", "/api/v1/retention", Some(a)).statusCode() == 403)
    assert(req("POST", "/api/v1/databases", Some(a),
      jb("name" -> "db3")).statusCode() == 403)
    assert(req("GET", "/api/v1/retention", Root).statusCode() == 200)
  }

  test("verify endpoint echoes the token; simple-read endpoint is measurement-gated") {
    val c = fixture("c")
    val v = jsonOf(req("GET", "/api/v1/auth/verify", Some(c)))
    assert(v.get("valid").asBoolean() &&
      v.get("token_info").get("name").asText() == "reader-db1-cpu")
    assert(req("GET", "/api/v1/query/cpu?database=db1&limit=10", Some(c))
      .statusCode() == 200)
    assert(req("GET", "/api/v1/query/mem?database=db1&limit=10", Some(c))
      .statusCode() == 403)
  }

  test("revoke kills a token; rotate swaps the secret") {
    fixture
    val r = req("POST", "/api/v1/auth/tokens", Root, jb("name" -> "victim"))
    val tok = jsonOf(r).get("token").asText()
    val all = jsonOf(req("GET", "/api/v1/auth/tokens", Root)).get("tokens")
    val id = (0 until all.size()).map(all.get)
      .find(_.get("name").asText() == "victim").get.get("id").asLong()
    assert(query(tok, "db1", "SELECT 1 AS one").statusCode() == 200)
    assert(req("POST", s"/api/v1/auth/tokens/$id/revoke", Root).statusCode() == 200)
    assert(query(tok, "db1", "SELECT 1 AS one").statusCode() == 401)
    assert(req("PATCH", s"/api/v1/auth/tokens/$id", Root,
      jb("enabled" -> true)).statusCode() == 200)
    val rot = req("POST", s"/api/v1/auth/tokens/$id/rotate", Root)
    val tok2 = jsonOf(rot).get("token").asText()
    assert(query(tok, "db1", "SELECT 1 AS one").statusCode() == 401)
    assert(query(tok2, "db1", "SELECT 1 AS one").statusCode() == 200)
  }

  test("stores persist: a second server instance on the same root sees tokens and grants") {
    val a = fixture("a")
    val s2 = new HttpServer(spark, root, authToken = Some("rootsekrit"))
    s2.rbac.enabled = true
    val port2 = s2.start()
    try {
      val b2 = s"http://127.0.0.1:$port2"
      def q2(tok: String, db: String, sql: String) = {
        val b = HttpRequest.newBuilder(URI.create(b2 + "/api/v1/query"))
          .header("Authorization", s"Bearer $tok")
          .header("x-arc-database", db)
          .POST(HttpRequest.BodyPublishers.ofByteArray(sqlBody(sql)))
        client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      }
      assert(q2(a, "db1", "SELECT count(*) AS n FROM cpu").statusCode() == 200)
      assert(q2(a, "db2", "SELECT count(*) AS n FROM cpu").statusCode() == 403)
      assert(q2(fixture("b"), "db2",
        "SELECT count(*) AS n FROM cpu").statusCode() == 200)
    } finally s2.stop()
  }

  test("pattern matching mirrors the reference: *, pfx_*, *_sfx, pfx*") {
    val rb = server.rbac
    assert(rb.matchPattern("*", "anything"))
    assert(rb.matchPattern("prod_*", "prod_us") && !rb.matchPattern("prod_*", "production"))
    assert(rb.matchPattern("*_metrics", "cpu_metrics") && !rb.matchPattern("*_metrics", "metrics"))
    assert(rb.matchPattern("prod*", "production") && !rb.matchPattern("prod*", "staging"))
    assert(rb.matchPattern("cpu", "cpu") && !rb.matchPattern("cpu", "cpu2"))
  }

  test("rbac disabled falls back to OSS coarse permissions only") {
    val a = fixture("a")
    server.rbac.enabled = false
    try {
      // RBAC-only token has no OSS read — coarse gate denies now
      assert(query(a, "db1", "SELECT count(*) AS n FROM cpu").statusCode() == 403)
      // OSS token unaffected
      assert(query(fixture("oss"), "db1",
        "SELECT count(*) AS n FROM cpu").statusCode() == 200)
    } finally server.rbac.enabled = true
  }
}
