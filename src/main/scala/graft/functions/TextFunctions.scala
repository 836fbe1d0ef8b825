package graft.functions

import org.apache.spark.sql.Column

/** Public forwarder for the native text kernels (see
  * org.apache.spark.sql.graft.TextExpressions for the Catalyst side). */
object TextFunctions {
  /** Unicode normalization; `form` is one of NFC/NFD/NFKC/NFKD. */
  def unicodeNormalize(text: Column, form: String): Column =
    org.apache.spark.sql.graft.TextExpressions.unicodeNormalize(text, form)
}
