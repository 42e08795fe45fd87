package graft

/** Database-qualified table names (ref src/Interpreters/DatabaseCatalog
  * — CH tests stage per-test databases with `CREATE DATABASE x` and
  * address tables as `x.y`). Spark temp views are single-part, so a
  * known database prefix folds into the view name: `x.y` → `x__y`.
  * DdlEmu registers/unregisters names; ChSql.translate applies the
  * rewrite to queries. Seeded with `test` — the classic pre-created
  * database the reference's CI provides without a CREATE statement.
  */
object ChDatabases {
  private val dbs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  dbs.add("test")

  def register(name: String): Unit = dbs.add(name.toLowerCase)
  def unregister(name: String): Unit =
    if (name.toLowerCase != "test") dbs.remove(name.toLowerCase)
  def known: Seq[String] = {
    val it = dbs.iterator()
    val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  def fold(db: String, table: String): String = s"${db.toLowerCase}__$table"

  /** Rewrite `db.tbl` → `db__tbl` for every known db (string-aware via
    * the caller using replaceOutsideStrings). */
  def foldQualified(sql: String,
      replace: (String, String, String) => String): String = {
    var s = sql
    known.foreach { db =>
      s = replace(s, s"(?i)\\b$db\\s*\\.\\s*(\\w+)", db + "__$1")
    }
    s
  }
}
