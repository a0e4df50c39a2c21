package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable vector math over `array<float>` embedding columns.
  *
  * Per-element float→double casts followed by an in-order left fold: the
  * identical IEEE op sequence in Spark's `aggregate` and DuckDB's
  * `list_sum(list_transform(...))`, so cosine values match bitwise.
  */
object Vec {
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Native-Expression fast paths (identical IEEE op order — the hash
    * gate proves interchangeability); prefer these in hot loops: the
    * portable higher-order forms above have no codegen and interpret a
    * lambda per element.
    */
  def cosineFast(a: Column, b: Column): Column = CosineSimilarity(a, b)
  def dotFast(a: Column, b: Column): Column = DotProduct(a, b)
  def l2sqFast(a: Column, b: Column): Column = L2Squared(a, b)
  def l2ArgMin(cents: Array[Array[Double]], emb: Column): Column =
    L2ArgMin(cents, emb)
}

/** DuckDB twins of [[Vec]] (dim is the fixed embedding width). */
object VecSql {
  def dot(a: String, b: String, dim: Int): String =
    s"list_sum(list_transform(range(1, ${dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  def norm(a: String, dim: Int): String =
    s"sqrt(list_sum(list_transform(range(1, ${dim + 1}), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))"

  def cosine(a: String, b: String, dim: Int): String =
    s"(${dot(a, b, dim)} / (${norm(a, dim)} * ${norm(b, dim)}))"
}
