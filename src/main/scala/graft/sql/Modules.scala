package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's module system (LOAD/UNLOAD MODULE, USE MODULES,
  * SHOW [FULL] MODULES — flink-table-api SqlToOperationConverter +
  * ModuleManager): modules contribute FUNCTION DEFINITIONS, and the
  * USED module ORDER resolves conflicting names (first match wins,
  * ModuleManager.getFunctionDefinition's contract).
  *
  * Two modules exist here: `core` (Spark's builtin registry — always
  * loaded, since the engine itself resolves through it) and `graft`
  * (the Flink-name surface [[graft.functions.FlinkFunctions]]
  * registers, including the deliberate builtin SHADOWS cot /
  * to_timestamp_ltz that carry Flink signatures). `graft` ships FIRST
  * in the default order so the Flink spellings win — `USE MODULES
  * core, graft` flips precedence and the two shadowed names resolve
  * to the Spark builtins again, exactly the reference's
  * order-sensitive resolution. `hive` is rejected with a reason (the
  * reference's hive module re-exposes Hive's function catalog; Spark
  * sessions get those natively via enableHiveSupport, so there is
  * nothing separate to load). Caveat, documented: a direct library
  * call to FlinkFunctions.registerAll — every DataFrame-API operator
  * makes one defensively — re-loads the graft surface; module state
  * governs the SQL front door, matching the reference where the
  * module system is a table-environment concept.
  */
object Modules {

  final class State {
    /** Loaded modules in LOAD order. */
    var loaded: Vector[String] = Vector("graft", "core")
    /** Used modules in resolution order (a subset of loaded). */
    var used: Vector[String] = Vector("graft", "core")
  }

  private val states =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, State])

  private def state(spark: SparkSession): State = {
    var s = states.get(spark)
    if (s == null) { s = new State; states.put(spark, s) }
    s
  }

  private val known = Set("core", "graft")

  def load(spark: SparkSession, name: String): Unit = {
    require(name != "hive",
      "LOAD MODULE hive: Spark sessions expose Hive's function catalog natively " +
        "(enableHiveSupport) — there is no separate module to load")
    require(known(name), s"LOAD MODULE: unknown module '$name' (core, graft)")
    val s = state(spark)
    require(!s.loaded.contains(name), s"LOAD MODULE: '$name' is already loaded")
    // the reference appends a newly loaded module to the END of the
    // used list (ModuleManager.loadModule)
    s.loaded :+= name; s.used :+= name
    apply(spark)
  }

  def unload(spark: SparkSession, name: String): Unit = {
    val s = state(spark)
    require(s.loaded.contains(name), s"UNLOAD MODULE: '$name' is not loaded")
    require(name != "core",
      "UNLOAD MODULE core: the engine resolves its own operators through the core " +
        "registry — unloading it is not supported (the reference allows this; " +
        "declared deviation)")
    s.loaded = s.loaded.filterNot(_ == name)
    s.used = s.used.filterNot(_ == name)
    apply(spark)
  }

  def use(spark: SparkSession, names: Seq[String]): Unit = {
    val s = state(spark)
    require(names.distinct.length == names.length, "USE MODULES: duplicate module name")
    names.foreach(n => require(s.loaded.contains(n),
      s"USE MODULES: '$n' is not loaded (SHOW FULL MODULES lists loaded modules)"))
    require(names.contains("core"), "USE MODULES must keep 'core' (declared deviation)")
    s.used = names.toVector
    apply(spark)
  }

  def showModules(spark: SparkSession): DataFrame = {
    val s = spark.implicits
    import s._
    state(spark).used.toDF("module name")
  }

  def showFullModules(spark: SparkSession): DataFrame = {
    val st = state(spark)
    val sp = spark.implicits
    import sp._
    st.loaded.map(n => (n, st.used.contains(n))).toDF("module name", "used")
  }

  /** Re-apply the session's module state to the function registry. */
  def apply(spark: SparkSession): Unit = {
    val u = state(spark).used
    if (!u.contains("graft")) graft.functions.FlinkFunctions.unregisterAll(spark)
    else {
      graft.functions.FlinkFunctions.reloadAll(spark)
      if (u.indexOf("core") < u.indexOf("graft"))
        graft.functions.FlinkFunctions.demoteShadows(spark)
    }
  }

  /** Front-door entry hook: the cheap sentinel path when the session
    * has default module state; the full re-apply otherwise.
    */
  def ensure(spark: SparkSession): Unit = {
    val s = states.get(spark)
    if (s == null || (s.used == Vector("graft", "core") && s.loaded == s.used))
      graft.functions.FlinkFunctions.registerAll(spark)
    else apply(spark)
  }
}
