package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Gate-layer mutation audit, round 11: the r18 addition
  * (q_rename_clobber — rename-onto-existing + index-render parity).
  * Same contract as rounds 1-10 (seed one plausible bug, assert the
  * driver-canonical compare differs). Fixture variance DuckDB-probed
  * before authoring: at sf0.01 events spans all 7 weekdays
  * (1,265-1,677 rows each), value is DOUBLE with 6,583 distinct values,
  * event_type has 5 levels — every axis below moves published values.
  *
  * One bug class is deliberately NOT seeded here: the original
  * withColumnRenamed duplicate-column defect (r17 ADVICE) makes the
  * output frame unwritable/ambiguous, which surfaces as a Verify ERROR
  * in errors.json — a louder failure than a hash mismatch, and
  * FiltersSpec pins the fixed single-column shape directly. */
class OracleMutation10Spec extends SparkSpec with MutationAudit {

  /** The gate's fixture, verbatim. */
  private def ev: DataFrame =
    Tables.load(spark, dir, "events").withColumn("@timestamp", col("ts"))

  test("q_rename_clobber: stringifying a non-string index field instead " +
      "of rendering the literal 'null'") {
    // the pre-r18 behavior (and the tempting 'nicer' one): a numeric
    // field renders its value — every row's idx then disagrees with the
    // reference's errNotString contract
    assertCaught("q_rename_clobber") {
      ev.select(col("event_id"), col("value").as("event_type"),
        concat(lit("ev-"), col("value").cast("string"), lit("-"),
          col("event_type"), lit("-"),
          date_format(col("@timestamp"), "EEEE")).as("idx"))
    }
  }

  test("q_rename_clobber: rendering the layout off the wall clock when " +
      "the ts column resolution silently fails") {
    // the classic fallback bug: a misresolved @timestamp falls back to
    // current_timestamp() — one constant (wrong) weekday for all rows
    assertCaught("q_rename_clobber") {
      ev.select(col("event_id"), col("value").as("event_type"),
        concat(lit("ev-null-"), col("event_type"), lit("-"),
          date_format(current_timestamp(), "EEEE")).as("idx"))
    }
  }

  test("q_rename_clobber: a rename that SKIPS when dst exists instead " +
      "of overwriting") {
    // the other easy wrong answer to the duplicate-column defect:
    // refuse the clobber — event_type keeps its string value and the
    // moved double never lands
    assertCaught("q_rename_clobber") {
      ev.select(col("event_id"), col("event_type"),
        concat(lit("ev-null-"), col("event_type"), lit("-"),
          date_format(col("@timestamp"), "EEEE")).as("idx"))
    }
  }

  /** The q_map_delete fixture, verbatim. */
  private def evMap: DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("m", map(
        lit("b"), map(lit("c"), col("value"), lit("keep"), col("value") * 2),
        lit("o"), map(lit("c"), col("value") * 3)))

  test("q_map_delete: wiping the whole intermediate key instead of " +
      "rewriting its inner map") {
    // the heavy-handed bug: [m][b][c] drops key b entirely — the
    // sibling 'keep' entry (and b itself) vanish
    assertCaught("q_map_delete") {
      evMap.select(col("event_id"),
        lit(null).cast("double").as("kept"),
        lit(null).cast("double").as("dropped"),
        (col("value") * 3).as("sibling"),
        lit(null).cast("int").as("b_size"))
    }
  }

  test("q_map_delete: deleting the leaf key from EVERY inner map " +
      "instead of only under the addressed key") {
    // transform_values without the key guard: o.c dies alongside b.c
    assertCaught("q_map_delete") {
      evMap.select(col("event_id"),
        (col("value") * 2).as("kept"),
        lit(null).cast("double").as("dropped"),
        lit(null).cast("double").as("sibling"),
        lit(1).as("b_size"))
    }
  }

  test("q_map_delete: a silent no-op delete leaves the leaf in place") {
    // the pre-r18 'fix' shape: refuse the nested-map path quietly —
    // dropped still reads its value and the inner map keeps 2 entries
    assertCaught("q_map_delete") {
      evMap.select(col("event_id"),
        (col("value") * 2).as("kept"),
        col("value").as("dropped"),
        (col("value") * 3).as("sibling"),
        lit(2).as("b_size"))
    }
  }

  test("q_rename_clobber: a rename that sets dst but forgets to delete " +
      "src ships the field under both names") {
    // the r17 review's half-rename shape: schema gains a fourth column
    // — visible in the canonical compare as a row-shape change
    assertCaught("q_rename_clobber") {
      ev.select(col("event_id"), col("value").as("event_type"),
        col("value"),
        concat(lit("ev-null-"), col("event_type"), lit("-"),
          date_format(col("@timestamp"), "EEEE")).as("idx"))
    }
  }
}
