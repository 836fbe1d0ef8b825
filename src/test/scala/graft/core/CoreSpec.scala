package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CoreSpec extends AnyFunSuite {
  private val ref = ModelRef("sales", "orders", "dataproduct", "daily_orders")

  test("B1 schemaFor: ci/dev/prod policies (generate_schema_name.sql)") {
    assert(Naming.schemaFor(Env.Ci, ref, "ci_schema") == "ci_schema")
    assert(Naming.schemaFor(Env.Dev, ref, "x", userId = "42") == "dbt_cloud_user_42")
    assert(Naming.schemaFor(Env.Prod, ref, "x") == "sales_orders")
    assert(Naming.schemaFor(Env.Prod, ref.copy(layer = "curated"), "x")
      == "sales_orders_curated")
    assert(Naming.schemaFor(Env.Prod, ref.copy(layer = "staging"), "x")
      == "sales_orders_curated")
  }

  test("B2 aliasFor: trim('.0') quirks (generate_alias_name.sql:5-9)") {
    def alias(v: String) = Naming.aliasFor(ref, dataproductVersion = Some(v))
    assert(alias("1.0") == "daily_orders")     // trim -> "1" -> suppressed
    assert(alias("1") == "daily_orders")
    assert(alias("10.0") == "daily_orders")    // trim strips '0','.','0' -> "1" -> suppressed
    assert(alias("2.0") == "daily_orders_v2")
    assert(alias("1.1") == "daily_orders_v1-1")
    assert(alias("2.1.3") == "daily_orders_v2-1-3")
    assert(alias("0.2") == "daily_orders_v2")  // leading '0.' stripped by trim
    // node.version fallback is used verbatim (no trim)
    assert(Naming.aliasFor(ref.copy(version = Some("3")), None) == "daily_orders_v3")
    assert(Naming.aliasFor(ref, None) == "daily_orders")
    // custom alias wins, whitespace-trimmed
    assert(Naming.aliasFor(ref, Some("2.0"), Some("  my_alias ")) == "my_alias")
  }

  test("B3 deployedRelation rewrites schema only in dev/ci") {
    val rel = TableId("proj", "dbt_cloud_user_42", "daily_orders")
    assert(Naming.deployedRelation(Env.Prod, rel, ref) == rel)
    assert(Naming.deployedRelation(Env.Dev, rel, ref).schema == "sales_orders")
    assert(Naming.deployedRelation(Env.Ci, rel, ref.copy(layer = "curated")).schema
      == "sales_orders_curated")
    assert(Naming.deployedRelation(Env.Dev, rel, ref.copy(layer = "other")).schema
      == rel.schema)
  }

  test("A5 logTableFor derives <project>.<domain>_dbt_raw.<domain>_dbt_event_log") {
    val rel = TableId("proj", "sales_orders", "daily_orders")
    assert(Naming.logTableFor(rel, "sales")
      == TableId("proj", "sales_dbt_raw", "sales_dbt_event_log"))
  }

  test("B4 ModelConfig: meta wins over top-level (config_helpers.sql)") {
    val c = ModelConfig(top = Map("k" -> "top", "only_top" -> "t"),
      meta = Map("k" -> "meta", "nullk" -> null))
    assert(c.getOrMeta("k") == "meta")
    assert(c.getOrMeta("only_top") == "t")
    assert(c.getOrMeta("nullk", "d") == "d")
    assert(c.getOrMeta("absent", "d") == "d")
  }

  test("A12 Ts: format contract and min/max") {
    val s = "2024-03-01 12:34:56.789012 UTC"
    assert(Ts.format(Ts.parse(s)) == s)
    assert(Ts.parse(Ts.Default).toString == "1900-01-01T00:00:00Z")
    assert(Ts.lowest(Seq(s, "2024-03-01 12:34:56.789013 UTC", "", null, "None"))
      .contains(s))
    assert(Ts.highest(Seq(s, "2023-01-01 00:00:00.000000 UTC")).contains(s))
    assert(Ts.lowest(Seq("", null)) == None)
    assert(Ts.minusMicros("2024-01-02 00:00:00.000000 UTC", 1)
      == "2024-01-01 23:59:59.999999 UTC")
  }

  test("A10/A11 HistoryLimit: caps, dev/ci default, table_window_end") {
    val start = "2024-01-01 00:00:00.000000 UTC"
    val end = "2024-03-01 00:00:00.000000 UTC"
    // no limits configured -> end unchanged
    assert(HistoryLimit(None, Some(start), end, Env.Prod) == end)
    // prod: cap at start + maxDays
    assert(HistoryLimit(Some(10), Some(start), end, Env.Prod)
      == "2024-01-11 00:00:00.000000 UTC")
    // cap beyond end -> unchanged
    assert(HistoryLimit(Some(90), Some(start), end, Env.Prod) == end)
    // dev/ci default cap: 1 day
    assert(HistoryLimit(Some(30), Some(start), end, Env.Dev)
      == "2024-01-02 00:00:00.000000 UTC")
    assert(HistoryLimit(Some(30), Some(start), end, Env.Ci, Some(5))
      == "2024-01-06 00:00:00.000000 UTC")
    // no window start -> unchanged
    assert(HistoryLimit(Some(10), None, end, Env.Prod) == end)
    // adjusted: additionally capped at table_window_end
    assert(HistoryLimit.adjusted(Some(90), Some(start), end, Env.Prod,
      Some("2024-02-01 00:00:00.000000 UTC")) == "2024-02-01 00:00:00.000000 UTC")
    assert(HistoryLimit.adjusted(Some(5), Some(start), end, Env.Prod,
      Some("2024-02-01 00:00:00.000000 UTC")) == "2024-01-06 00:00:00.000000 UTC")
  }

  test("D13 QuoteReplace escapes quotes (quote_replace.sql)") {
    assert(QuoteReplace("it's") == "it\\'s")
    assert(QuoteReplace("say \"hi\"") == "say \\\"hi\\\"")
    assert(QuoteReplace("plain") == "plain")
  }

  test("Env.fromContext matches reference parse") {
    assert(Env.fromContext("") == Env.Prod)
    assert(Env.fromContext("DEV") == Env.Dev)
    assert(Env.fromContext("ci") == Env.Ci)
    assert(Env.fromContext("prod") == Env.Prod)
  }
}
