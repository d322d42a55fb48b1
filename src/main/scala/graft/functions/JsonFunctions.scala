package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** JSON scalar functions — reference common/function/src/scalars/json
  * (SURVEY.md §2.8). The reference stores JSONB; query semantics are
  * path-get + type tests, which map onto Spark 4's VARIANT type
  * (`parse_json` / `variant_get` / `schema_of_variant`) — all native
  * expressions, no UDF.
  */
object JsonFunctions {

  /** reference parse_json -> binary JSONB; here VARIANT. */
  def parseJson(c: Column): Column = try_parse_json(c)

  def jsonToString(c: Column): Column = to_json(parseJson(c))

  private def get(c: Column, path: String): Column =
    try_variant_get(parseJson(c), path, "variant")

  def jsonGet(c: Column, path: String): Column = get(c, path)
  def jsonGetString(c: Column, path: String): Column =
    try_variant_get(parseJson(c), path, "string")
  def jsonGetInt(c: Column, path: String): Column =
    try_variant_get(parseJson(c), path, "bigint")
  def jsonGetFloat(c: Column, path: String): Column =
    try_variant_get(parseJson(c), path, "double")
  def jsonGetBool(c: Column, path: String): Column =
    try_variant_get(parseJson(c), path, "boolean")

  private def typeOf(c: Column, path: String): Column =
    schema_of_variant(get(c, path))

  def jsonIsNull(c: Column, path: String = "$"): Column = typeOf(c, path) === "VOID"
  def jsonIsBool(c: Column, path: String = "$"): Column = typeOf(c, path) === "BOOLEAN"
  def jsonIsInt(c: Column, path: String = "$"): Column = typeOf(c, path) === "BIGINT"
  def jsonIsFloat(c: Column, path: String = "$"): Column =
    typeOf(c, path).isin("DOUBLE", "DECIMAL", "FLOAT")
  def jsonIsString(c: Column, path: String = "$"): Column = typeOf(c, path) === "STRING"
  def jsonIsArray(c: Column, path: String = "$"): Column =
    typeOf(c, path).startsWith("ARRAY")
  def jsonIsObject(c: Column, path: String = "$"): Column =
    typeOf(c, path).startsWith("OBJECT") || typeOf(c, path).startsWith("STRUCT")

  def jsonPathExists(c: Column, path: String): Column = get(c, path).isNotNull

  /** Object keys at the root (reference json_object_keys). */
  def jsonObjectKeys(c: Column): Column = json_object_keys(c)
}
