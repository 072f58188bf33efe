package graft

import graft.avro.{AvroSubjects, CachingSchemaRepoClient, HttpSchemaRepo,
  SchemaRegistry, SchemaRepoHttp}
import org.scalatest.funsuite.AnyFunSuite

/** The reference's repository contract driven over a real (loopback)
  * HTTP wire — the suite mirrors `mypipe-avro/src/test/scala/mypipe/
  * avro/AvroSchemaSpec.scala:34-94` (register / fetch / latest / id-of
  * across three schema versions) with the HTTP client standing where
  * the in-memory repository stood, plus the flush-on-miss consumer
  * retry running end-to-end over the wire. */
class HttpSchemaRepoSpec extends AnyFunSuite {

  private def v(fields: String*) = {
    val fs = fields.map(f =>
      s"""{"name":"$f","type":["null","string"],"default":null}""")
    s"""{"type":"record","name":"user_insert","fields":[${fs.mkString(",")}]}"""
  }

  test("register/fetch/latest/idOf across three versions over HTTP") {
    val server = SchemaRepoHttp.serve(new SchemaRegistry)
    try {
      val repo = new HttpSchemaRepo(SchemaRepoHttp.baseUrl(server))
      val subj = AvroSubjects.specific("testdb", "user", "insert")
      val (s1, s2, s3) = (v("a"), v("a", "b"), v("a", "b", "c"))

      val id1 = repo.register(subj, s1)
      assert(repo.register(subj, s1) === id1, "register is idempotent")
      val id2 = repo.register(subj, s2)
      val id3 = repo.register(subj, s3)
      assert(Set(id1, id2, id3).size === 3, "distinct versions, distinct ids")

      assert(repo.schemaById(id1) === Some(s1))
      assert(repo.schemaById(id2) === Some(s2))
      assert(repo.schemaById(id3) === Some(s3))
      assert(repo.schemaById(9999) === None, "unknown id is a 404, not a throw")

      assert(repo.latest(subj) === Some((id3, s3)))
      assert(repo.latest("no_such_subject") === None)

      assert(repo.idOf(subj, s2) === Some(id2))
      assert(repo.idOf(subj, v("zzz")) === None)

      // a second, independent client sees the same state (server-side
      // truth, not client caches)
      val repo2 = new HttpSchemaRepo(SchemaRepoHttp.baseUrl(server))
      assert(repo2.latest(subj).map(_._1) === Some(id3))
    } finally server.stop(0)
  }

  test("flush-on-miss retry heals a stale cache over the wire") {
    val backing = new SchemaRegistry
    val server = SchemaRepoHttp.serve(backing)
    try {
      val subj = AvroSubjects.specific("testdb", "user", "insert")
      val id1 = backing.register(subj, v("a"))
      val client = new CachingSchemaRepoClient(
        new HttpSchemaRepo(SchemaRepoHttp.baseUrl(server)))
      assert(client.schemaById(id1) === Some(v("a"))) // primes the snapshot

      // ALTER lands out-of-band on the server; this client's snapshot
      // cannot know the new id
      val id2 = backing.register(subj, v("a", "email"))
      assert(client.cachedSchemaById(id2) === None, "stale snapshot misses")

      val resolved = CachingSchemaRepoClient.resolveWithRetry(client, id2)
      assert(resolved === Some(v("a", "email")),
        "flush + one HTTP re-fetch resolves the new writer schema")
      assert(client.flushes === 1)
      assert(client.cachedSchemaById(id2) === Some(v("a", "email")))

      // genuinely unknown ids stay None after the retry — one flush per
      // miss, never a loop
      assert(CachingSchemaRepoClient.resolveWithRetry(client, 777) === None)
    } finally server.stop(0)
  }

  test("special characters in subjects survive URL encoding") {
    val server = SchemaRepoHttp.serve(new SchemaRegistry)
    try {
      val repo = new HttpSchemaRepo(SchemaRepoHttp.baseUrl(server))
      val subj = "db/with strange+chars_table_insert"
      val id = repo.register(subj, v("a"))
      assert(repo.latest(subj) === Some((id, v("a"))))
    } finally server.stop(0)
  }
}
