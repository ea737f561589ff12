package graft.queries

/**
 * Inline DuckDB-SQL generators for 64-bit wrapping integer arithmetic
 * (the driver runs each oracle as a single statement — no CREATE
 * MACRO), used to mirror the engine's deterministic hash streams
 * (splitmix64 finalizer, FNV-1a 64) in pure SQL so signature-based
 * operators get full value oracles instead of rows-only checks.
 *
 * DuckDB BIGINT arithmetic errors on overflow, so products are taken
 * in HUGEINT with an explicit split-limb reduction mod 2^64 and
 * mapped back to two's complement. All generators take SQL EXPRESSION
 * STRINGS; pass short column/lambda variable names — `mix64` expands
 * its argument ~32 times textually.
 */
object DuckMacros {
  private val P64 = "18446744073709551616" // 2^64
  private val S63 = "9223372036854775808" // 2^63

  /** two's-complement BIGINT -> unsigned HUGEINT */
  def u64(a: String): String =
    s"(CASE WHEN ($a) < 0 THEN CAST(($a) AS HUGEINT) + $P64 ELSE CAST(($a) AS HUGEINT) END)"

  /** unsigned HUGEINT (< 2^64) -> two's-complement BIGINT */
  def s64(u: String): String =
    s"(CAST(CASE WHEN ($u) >= $S63 THEN ($u) - $P64 ELSE ($u) END AS BIGINT))"

  /** (a * b) mod 2^64, signed in/out, split-limb to stay in HUGEINT */
  def mul64(a: String, b: String): String =
    s64(s"((${u64(a)} // 4294967296 * ${u64(b)}) % 4294967296 * 4294967296 + " +
      s"(${u64(a)} % 4294967296) * ${u64(b)}) % $P64")

  /** logical (unsigned) right shift by a small constant */
  def shr64(a: String, n: Int): String =
    s64(s"${u64(a)} // CAST(power(2, $n) AS HUGEINT)")

  def xor64(a: String, b: String): String = s"xor(($a), ($b))"

  /** splitmix64 finalizer (Dedup.mix64) as one inline expression —
    * keep `z` a short variable name (expanded ~32x). */
  def mix64(z: String): String = {
    val y = mul64(xor64(z, shr64(z, 30)), "-4658895280553007687")
    val x = mul64(xor64(y, shr64(y, 27)), "-7723592293110705685")
    xor64(x, shr64(x, 31))
  }

  /** FNV-1a 64 over the ASCII bytes of string expr `s` (unmixed) —
    * matches Dedup.hashString's fold for ASCII input (the synthetic
    * corpora are ASCII; asserted by the n_bytes==length oracle). */
  def fnv64(s: String): String =
    s"list_reduce(list_prepend(CAST(-3750763034362895579 AS BIGINT), " +
      s"list_transform(range(1, length($s) + 1), i -> ascii(($s)[i]))), " +
      s"(h, b) -> ${mul64(xor64("h", "b"), "1099511628211")})"

  /** Chained single-column CTE stages computing mix64 cheaply at ROW
    * level: returns the SQL of nested sub-selects turning column
    * `in` of `src` into column `out`, carrying `keep` columns. */
  def mix64Stages(src: String, in: String, out: String, keep: Seq[String]): String = {
    val ks = keep.mkString(", ")
    val kc = if (keep.isEmpty) "" else s"$ks, "
    val y = mul64(xor64(in, shr64(in, 30)), "-4658895280553007687")
    val x = mul64(xor64("_my", shr64("_my", 27)), "-7723592293110705685")
    val f = xor64("_mx", shr64("_mx", 31))
    s"(SELECT $kc$f AS $out FROM (SELECT $kc$x AS _mx FROM " +
      s"(SELECT $kc$y AS _my FROM $src)))"
  }

  /** (a + b) mod 2^64, signed in/out */
  def add64(a: String, b: String): String =
    s64(s"(${u64(a)} + ${u64(b)}) % $P64")

  /** unsigned min over grouped signed column `v` */
  def minU64(v: String): String = s64(s"min(${u64(v)})")

  /** bit `b` (0-based) of signed 64-bit expr `h`, as 0/1 */
  def bit64(h: String, b: String): String =
    s"CAST((${u64(h)} // CAST(power(2, $b) AS HUGEINT)) % 2 AS INT)"
}
