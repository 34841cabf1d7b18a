package graft.streaming

import graft.operators.cdc.ChangeStream
import graft.sources.cdc.CdcSourceProvider
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The assembled engine — the one-call equivalent of the reference's
  * `WalEx.Supervisor.start_link(config)` + `use WalEx.Event` module setup
  * (lib/walex/supervisor.ex:12-24, README.md:229-285):
  *
  * {{{
  * val engine = new Engine()
  *   .onInsert("user") { events => ... }
  *   .onUpdate("user", EventFilters(unwatchedFields = Seq("updated_at"))) { ... }
  * val query = Graft.start(spark, config, walDir, engine)
  * }}}
  *
  * Pipeline: DSv2 CDC source (config-driven options, subscription filter
  * pushed into the scan) → cross-batch transaction assembly → typed Event
  * view → per-handler dispatch. Durable-slot configs run checkpointed
  * (restart = resume); temporary-slot configs start at the stream head and
  * die with the query.
  */
object Graft {

  /** The Event view for a config, unstarted — callers can stack further
    * transforms (windowed aggregations, joins against dimension tables)
    * before attaching handlers or sinks.
    */
  def events(spark: SparkSession, config: GraftConfig, walDir: String): DataFrame = {
    var reader = spark.readStream.format(classOf[CdcSourceProvider].getName)
    config.sourceOptions(walDir).foreach { case (k, v) => reader = reader.option(k, v) }
    val raw = reader.load()
    // F4 subscription filter BEFORE assembly. The disjunction (keep
    // begin/commit, whose table_name is null, for the assembler) is not a
    // pushable predicate — table-level dropping at decode time is the
    // publication's job (F8, inside the source); subscriptions are the
    // per-engine dynamic subset and filter post-scan, pre-state.
    val subscribed =
      if (config.subscriptions.isEmpty) raw
      else raw.filter(
        !col("msg").isin("insert", "update", "delete", "truncate") ||
          col("table_name").isin(config.subscriptions: _*))
    ChangeStream.eventsFromAssembled(TxnAssembler.assemble(subscribed).toDF())
  }

  /** Start the full engine: events → registered handlers, supervised per
    * the slot-durability semantics of `config`.
    */
  def start(spark: SparkSession, config: GraftConfig, walDir: String,
      engine: Engine, trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    engine.start(events(spark, config, walDir),
      checkpoint = config.effectiveCheckpoint,
      trigger = trigger,
      queryName = s"graft-${config.appName}")
}
