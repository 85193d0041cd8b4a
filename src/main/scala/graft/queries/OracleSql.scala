package graft.queries

/** Shared DuckDB-SQL renderings used across the oracle maps. Lives in its
  * own object so query objects can share it without referencing each
  * other (cross-references during object init deadlock into nulls). */
object OracleSql {

  /** The portable polynomial hash (functions.PolyHash) as DuckDB SQL. */
  def pHash(e: String): String =
    "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(CAST($e AS VARCHAR), ''), " +
      "ch -> CAST(ord(ch) AS BIGINT))), " +
      "(acc, cp) -> (acc * 31 + cp) % 2147483647)"
}
