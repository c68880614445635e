package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.filters._

/** Gate-layer mutation audit, round 8 (mop-up): the TPC-H classics, the
  * template/variant/enrich operator chains, and the remaining text
  * scorers. Same contract as rounds 1-7. */
class OracleMutation6Spec extends SparkSpec with MutationAudit {
  import spark.implicits._

  private val Dec = DecimalType(18, 4)

  private def docs: DataFrame = Tables.load(spark, dir, "documents")
  private def events: DataFrame = Tables.load(spark, dir, "events")

  test("q1_pricing: a flipped discount sign corrupts sum_disc_price") {
    assertCaught("q1_pricing") {
      Tables.load(spark, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast(Dec)).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast(Dec)).cast("double").as("sum_base_price"),
          // bug: price * (1 + disc) instead of (1 - disc)
          sum(($"l_extendedprice".cast(Dec) * ($"l_discount".cast(Dec) + lit(1))))
            .cast("double").as("sum_disc_price"),
          (sum($"l_quantity".cast(Dec)).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }
  }

  test("q5_region_revenue: dropping the local-supplier condition inflates " +
      "revenue") {
    assertCaught("q5_region_revenue") {
      val li = Tables.load(spark, dir, "lineitem")
      val o = Tables.load(spark, dir, "orders")
      val c = Tables.load(spark, dir, "customer")
      val su = Tables.load(spark, dir, "supplier")
      val n = Tables.load(spark, dir, "nation")
      val r = Tables.load(spark, dir, "region")
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(c), $"o_custkey" === $"c_custkey")
        // bug: supplier joined by key alone — the customer-nation ==
        // supplier-nation (local supplier) condition is lost
        .join(broadcast(su), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(n), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
        .where($"r_name" === "ASIA" &&
          $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        .groupBy($"n_name")
        .agg(sum(($"l_extendedprice".cast(Dec) * ($"l_discount".cast(Dec) * lit(-1) + lit(1))))
          .cast("double").as("revenue"))
    }
  }

  test("q_enrich: a dictionary missing an entry nulls its translations") {
    assertCaught("q_enrich") {
      val chain = Seq(
        FilterBox(AddFilter(Map("combo" -> "{{.event_type}}-{{.user_id}}"))).stage,
        FilterBox(TranslateFilter("event_type", "code", Map(
          "error" -> "E", "purchase" -> "P"))).stage, // bug: signup lost
        FilterBox(RenameFilter(Map("user_id" -> "uid"))).stage,
        FilterBox(RemoveFilter(Seq("props", "value", "ts", "event_type"))).stage)
      chain.foldLeft(events.toDF())((d, f) => f(d))
    }
  }

  test("q_template_cond: a drifted numeric bound re-filters the events") {
    assertCaught("q_template_cond") {
      val tpl = """{{if and (or (eq .event_type "error") """ +
        """(hasprefix .event_type "sign")) (not (lt .value 20))}}y{{end}}"""
      events.filter(graft.conditions.ConditionFilter.compile(tpl, events))
        .select("event_id", "event_type", "value", "user_id")
    }
  }

  test("q_variant_props: a wrong variant path nulls the extraction") {
    assertCaught("q_variant_props") {
      events.withColumn("v", parse_json($"props"))
        .select($"event_id",
          try_variant_get($"v", "$.kk", "bigint").as("k"), // bug: $.k → $.kk
          try_variant_get($"v", "$.source", "string").as("source_tag"))
    }
  }

  test("q_tfidf_log: a shrunken per-doc term budget truncates the ranking") {
    assertCaught("q_tfidf_log") {
      graft.ml.TextAnalysis.topTfidfTermsLog(docs, "text", "doc_id", k = 2)
    }
  }

  test("q_repetition: top-2-gram coverage computed over 3-grams is caught") {
    assertCaught("q_repetition") {
      val ta = graft.ml.TextAnalysis
      val base = docs.select($"doc_id", length($"text").as("len"),
        $"text".as("__t"))
      def gramCounts(n: Int) = base
        .select($"doc_id", $"len", explode(ta.ngramsAll($"__t", n)).as("g"))
        .groupBy("doc_id", "len", "g").agg(count(lit(1)).as("c"))
      // bug: the "top 2-gram" pass actually counts 3-grams
      val top2 = gramCounts(3)
        .groupBy("doc_id", "len").agg(max($"c" * length($"g")).as("m"))
        .select($"doc_id", ($"m".cast("double") / $"len").as("top2_frac"))
      val dup5 = gramCounts(5)
        .groupBy("doc_id", "len")
        .agg(sum(when($"c" >= 2, $"c" * length($"g")).otherwise(0L)).as("s"))
        .select($"doc_id", ($"s".cast("double") / $"len").as("dup5_frac"))
      docs.select($"doc_id")
        .join(top2, Seq("doc_id"), "left")
        .join(dup5, Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"top2_frac", lit(0.0)).as("top2_frac"),
          coalesce($"dup5_frac", lit(0.0)).as("dup5_frac"))
    }
  }
}
