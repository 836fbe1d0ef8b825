package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DoubleType, LongType}

/** The reference's scalar-function ("macro expression") library, D1-D13 in
  * SURVEY §2.D, re-expressed as Spark `Column` combinators so every function
  * stays inside whole-stage codegen (no UDFs). Each function cites the
  * reference macro it reproduces (file:line in /root/reference).
  *
  * Scale note: all of these are per-row projections — embarrassingly
  * parallel, no shuffle, no state — so they hold unchanged at 100 TB.
  */
object GraftFunctions {

  private val HexChars = "0123456789abcdef".map(_.toString)
  private val B64Chars =
    ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/").map(_.toString)

  /** Ordinal (0-based) of a single character within an alphabet, via
    * array_position (codegen'd); returns -1 when absent, matching the
    * reference's STRPOS(alphabet, ch) - 1. */
  private def ordinalIn(alphabet: Seq[String], ch: Column): Column =
    array_position(typedLit(alphabet), ch) - 1

  /** D1 — read a 4-byte BYTES value as signed two's-complement int32,
    * returned as LongType. Ref: macros/utils/binary_conversions.sql:1-14.
    * u32 = hex -> unsigned; subtract 2^32 when the sign bit is set. */
  def bytes4ToInt32(bytes: Column): Column = {
    val u32 = conv(hex(bytes), 16, 10).cast(LongType)
    when(u32 > lit(0x7FFFFFFFL), u32 - lit(0x100000000L)).otherwise(u32)
  }

  /** D2 — ordinal (0-63) of the base64 character at a 1-based (or 0-based)
    * index; NULL when the position is past the end or the char is not in the
    * alphabet. Ref: binary_conversions.sql:17-37. */
  def base64Map(b64: Column, index: Column, zeroBased: Boolean = false): Column = {
    val pos1 = if (zeroBased) index + 1 else index
    val ch = b64.substr(pos1, lit(1))
    val ord = when(ch === lit(""), lit(-1L)).otherwise(ordinalIn(B64Chars, ch))
    nullif(ord, lit(-1L))
  }

  /** D3 — ordinal (0-15) of the (lowercased) hex character at an index.
    * Ref: binary_conversions.sql:40-59. */
  def hexMap(hexStr: Column, index: Column, zeroBased: Boolean = false): Column = {
    val pos1 = if (zeroBased) index + 1 else index
    val ch = lower(hexStr.substr(pos1, lit(1)))
    val ord = when(ch === lit(""), lit(-1L)).otherwise(ordinalIn(HexChars, ch))
    nullif(ord, lit(-1L))
  }

  /** D4 — reverse the byte order of a hex string (optionally re-prefixing
    * '0x'). The reference's ordered STRING_AGG over UNNEST WITH OFFSET
    * collapses to reverse + array_join (deterministic, no aggregation).
    * Ref: binary_conversions.sql:62-78. */
  def reverseHexBytes(hexExpr: Column, add0x: Boolean = false): Column = {
    val stripped = regexp_replace(hexExpr, "^0x", "")
    val reversed = array_join(reverse(regexp_extract_all(stripped, lit(".."), lit(0))), "")
    if (add0x) concat(lit("0x"), reversed) else reversed
  }

  /** D5 — hex string (optional case-insensitive 0x prefix) to INT64; NULL on
    * malformed input or overflow past Long.MaxValue, matching BigQuery
    * SAFE_CAST('0x…' AS INT64). Spark's `conv` would silently wrap on
    * overflow, so guard: <=16 hex digits and, at exactly 16, a leading
    * nibble of 0-7. Ref: binary_conversions.sql:81-90. */
  def hexToInt(hexVal: Column): Column = {
    val stripped = regexp_replace(hexVal, "(?i)^0x", "")
    val wellFormed = stripped.rlike("^[0-9a-fA-F]{1,16}$")
    val noOverflow = length(stripped) < 16 || lower(stripped.substr(1, 1)) <= lit("7")
    when(wellFormed && noOverflow, conv(stripped, 16, 10).cast(LongType))
      .otherwise(lit(null).cast(LongType))
  }

  /** Fixed-width MSB-first bitstring of `value` — shared core of D6/D7.
    * (v >> i) & 1 extracts bit i identically under arithmetic or logical
    * shift, so two's-complement patterns of negative values survive. */
  private def toBitstring(value: Column, width: Int): Column = {
    val v = value.cast(LongType)
    val bits = transform(
      sequence(lit(width - 1), lit(0), lit(-1)),
      i => call_function("shiftright", v, i).bitwiseAND(lit(1L)).cast("string"))
    // STRING_AGG over an all-NULL input is NULL; array_join would drop nulls.
    when(v.isNull, lit(null).cast("string")).otherwise(array_join(bits, ""))
  }

  /** D6 — one radix-`base` digit to its binary representation, width =
    * ceil(log2(base)). Ref: binary_conversions.sql:93-105. */
  def digitToBitstring(digit: Column, base: Int): Column = {
    val width = math.ceil(math.log(base.toDouble) / math.log(2.0)).toInt
    toBitstring(digit, width)
  }

  /** D7 — integer to fixed-width binary string (two's-complement bits for
    * negatives). Ref: binary_conversions.sql:108-119. */
  def valueToBitstring(value: Column, width: Int): Column = toBitstring(value, width)

  /** D8 — binary string to integer: SUM(bit << (len-1-idx)). NULL for
    * empty/NULL input (BigQuery SUM over zero rows). 64-bit wrap semantics
    * match BigQuery's << on INT64. Ref: binary_conversions.sql:122-130. */
  def bitstringToInt(bitstr: Column): Column = {
    val n = length(bitstr)
    // SAFE_CAST(char AS INT64): NULL on a non-digit; BigQuery SUM skips the
    // NULL terms and returns NULL only when every term is NULL. (ANSI-safe:
    // no string->number cast that can throw.)
    def digit(ch: Column): Column =
      when(ch === "1", lit(1L)).when(ch === "0", lit(0L))
        .otherwise(lit(null).cast(LongType))
    val summed = aggregate(
      sequence(lit(0), n - 1),
      lit(0L),
      (acc, i) => acc + coalesce(
        call_function("shiftleft", digit(bitstr.substr(i + 1, lit(1))), n - 1 - i),
        lit(0L)))
    val anyDigit = exists(split(bitstr, ""), c => c === "0" || c === "1")
    when(bitstr.isNull || n === 0 || !anyDigit, lit(null).cast(LongType))
      .otherwise(summed)
  }

  /** D9 — decode the 11-bit exponent field of an IEEE-754 double and return
    * the unbiased exponent (bias 1023). Ref: binary_conversions.sql:133-141. */
  def doubleUnbiasedExponent(expBits: Column): Column =
    bitstringToInt(expBits) - lit(1023L)

  /** D10 — fractional bit-field of an IEEE-754 double to the normalised
    * mantissa: 1 + Σ bit_i · 2^-(i+1) over 52 bits; absent bits count as 0.
    * Ref: binary_conversions.sql:144-156. */
  def doubleMantissa(fracBits: Column): Column = {
    // SAFE_CAST: past-the-end/'' or non-digit chars contribute 0
    def bit(ch: Column): Column =
      when(ch === "1", lit(1.0)).when(ch === "0", lit(0.0)).otherwise(lit(0.0))
    aggregate(
      sequence(lit(0), lit(51)),
      lit(1.0),
      (acc, i) => acc +
        bit(fracBits.substr(i + 1, lit(1))) *
          pow(lit(2.0), (i + 1).cast(DoubleType) * lit(-1.0)))
  }

  /** D11 — reassemble a double from decoded components:
    * ROUND((-1)^sign * mantissa * 2^exp, 5) — the round-to-5 is part of the
    * reference contract. Ref: binary_conversions.sql:159-166. */
  def doubleFromComponents(sign: Column, mantissa: Column, unbiasedExponent: Column): Column =
    round(
      pow(lit(-1.0), sign.cast(LongType).cast(DoubleType)) * mantissa *
        pow(lit(2.0), unbiasedExponent.cast(DoubleType)),
      5)

  /** D12 — RFC-4122 v5 (SHA-1, name-based) UUID:
    * sha1(namespace_bytes || utf8(name)) -> first 32 hex chars, force
    * hex[13]='5' (version), map hex[17] to the variant nibble {8,9,a,b}
    * (top two bits -> 10), hyphenate 8-4-4-4-12, lowercase.
    * The namespace is a compile-time constant (dashes stripped, lowercased).
    * Ref: macros/utils/uuid_generation.sql:1-46. */
  def uuidV5(nameExpr: Column, namespaceUuid: String): Column = {
    val nsHex = namespaceUuid.replace("-", "").toLowerCase
    require(nsHex.length == 32 && nsHex.forall(c => "0123456789abcdef".contains(c)),
      s"uuidV5: namespace must be a UUID, got '$namespaceUuid'")
    val h = substring(
      sha1(concat(unhex(lit(nsHex)), nameExpr.cast(BinaryType))), 1, 32)
    val hxV = concat(substring(h, 1, 12), lit("5"), substring(h, 14, 19))
    // variant nibble: n -> 8 + (n & 3), i.e. '0','4','8','c'->'8'; '1','5','9','d'->'9'; …
    val n = ordinalIn(HexChars, lower(substring(hxV, 17, 1)))
    val variantCh = element_at(typedLit(Seq("8", "9", "a", "b")), (pmod(n, lit(4L)) + 1).cast("int"))
    val hxVr = concat(substring(hxV, 1, 16), variantCh, substring(hxV, 18, 15))
    lower(concat_ws("-",
      substring(hxVr, 1, 8), substring(hxVr, 9, 4), substring(hxVr, 13, 4),
      substring(hxVr, 17, 4), substring(hxVr, 21, 12)))
  }
}
