package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash / numeric helpers that produce IDENTICAL values in Spark and in
  * DuckDB (the driver's oracle engine), so hash-sensitive operators
  * (minhash, simhash, LSH, fingerprints) can be verified exactly.
  *
  * The base hash is the first 15 hex chars of md5 (60 bits, always
  * non-negative in an i64):
  *   Spark : conv(substr(md5(x),1,15),16,10)::bigint
  *   DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT
  */
object Portable {
  /** 60-bit md5-derived hash of a string column — native codegen
    * expression (see [[HexHash60]]); equals
    * `conv(substr(md5(x),1,15),16,10)::bigint`.
    */
  def hexHash60(c: Column): Column = HexHash60.hash60(c)

  /** 20-bit variant — small enough that (a*h+b) never overflows i64
    * for multipliers below 2^40 (DuckDB errors on i64 overflow rather
    * than wrapping, so all portable arithmetic must stay in range).
    */
  def hexHash20(c: Column): Column = hexHash60(c) % 1048576L

  /** DuckDB SQL fragment computing the same 60-bit hash. */
  def sqlHexHash60(expr: String): String =
    s"(('0x' || substr(md5($expr),1,15))::BIGINT)"

  def sqlHexHash20(expr: String): String =
    s"(${sqlHexHash60(expr)} % 1048576)"

  /** Same 60-bit hash on the JVM, for non-columnar code paths
    * (e.g. the multimodal stub codec) that must agree with the oracle.
    */
  def jvmHexHash60(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Text normalization shared by the text/dedup operators:
    * lowercase, strip everything but [a-z0-9 ], squeeze spaces, trim.
    */
  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** DuckDB equivalent of [[normText]]. */
  def sqlNormText(expr: String): String =
    s"trim(regexp_replace(regexp_replace(lower($expr), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"
}
