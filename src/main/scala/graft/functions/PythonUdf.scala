package graft.functions

import java.io.{BufferedReader, BufferedWriter, File, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.SparkFiles
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.api.java._
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Python UDF/UDAF bridge — the reference's script-function surface
  * (tajo-plan/src/main/java/org/apache/tajo/plan/function/python/PythonScriptEngine.java:75-117,
  * tajo-core/src/main/resources/python/controller.py) re-expressed for
  * Spark's execution model.
  *
  * Script surface (reference-parity):
  *   - module-level `def f(a, b):` with a `@output_type('int4')` decorator
  *     (from a `tajo_util` shim module this bridge provides) registers a
  *     scalar SQL function `f`; an undecorated def registers as BLOB
  *     (binary), the reference's default
  *     (PythonScriptEngine.java:142-190 parses the same decorator).
  *   - a class with `eval / merge / get_partial_result / get_final_result`
  *     methods is a two-stage aggregate function
  *     (PythonScriptEngine.java:119-140 validates the same shape).
  *
  * Execution design (Spark-first, NOT the reference's per-query process):
  *   - one long-lived python3 worker per (task thread x script) per
  *     executor JVM, speaking a line-delimited JSON protocol over
  *     stdin/stdout; workers are spawned lazily and reused across tasks,
  *     so process startup amortizes to zero on the scan path.
  *   - scripts ship to executors via `SparkContext.addFile`, so the bridge
  *     works on a real cluster, not just local mode.
  *   - scalar calls are row-at-a-time through Spark's Java UDF interface
  *     (a pipe round trip per row — fine for dimension-sized columns; for
  *     corpus-scale columns use [[mapColumn]], which batches
  *     `batchSize` rows per protocol message through `mapPartitions`).
  *   - aggregates run the reference's own two-stage contract
  *     distributed: stage 1 is a per-partition python fold (map-side
  *     partial aggregation — per-group state lives in the worker, one
  *     partial per (partition, group)), the only shuffle moves
  *     (group, partial) pairs, and stage 2 merges <= numPartitions
  *     partials per group. Nothing data-sized ever reaches the driver.
  */
object PythonUdf {

  // ---------------------------------------------------------------- types

  /** Scalar function parsed from a script. */
  final case class PyFunc(name: String, paramCount: Int, returnType: DataType)
  /** Aggregate class parsed from a script (eval arity minus self). */
  final case class PyAgg(className: String, evalParamCount: Int, returnType: DataType)

  /** Tajo type name -> Spark type (reference names:
    * tajo-common/src/main/proto/DataTypes.proto). Undecorated defs are
    * BLOB per the reference's default. */
  def tajoType(name: String): DataType = name.toLowerCase match {
    case "int1" | "int2" | "smallint"        => ShortType
    case "int4" | "int" | "integer"          => IntegerType
    case "int8" | "bigint"                   => LongType
    case "float4" | "real"                   => FloatType
    case "float8" | "double"                 => DoubleType
    case "text" | "varchar" | "char"         => StringType
    case "bool" | "boolean"                  => BooleanType
    case "blob" | "bytea"                    => BinaryType
    case other =>
      throw new IllegalArgumentException(
        s"unsupported @output_type('$other') — use int2/int4/int8/float4/float8/text/bool/blob")
  }

  // ------------------------------------------------------------ parsing

  private val decoratorRe = """^\s*@output_type\(\s*['"]([A-Za-z0-9_]+)['"].*""".r
  private val defRe       = """^def\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(([^)]*)\).*""".r
  private val methodRe    = """^\s+def\s+([A-Za-z_][A-Za-z0-9_]*)\s*\(([^)]*)\).*""".r
  private val classRe     = """^class\s+([A-Za-z_][A-Za-z0-9_]*).*""".r

  private def countParams(params: String): Int =
    params.split(",").map(_.trim).count(_.nonEmpty)

  /** Parse scalar defs and aggregate classes out of a script's source.
    * Mirrors the reference's line-regex discovery
    * (PythonScriptEngine.java:142 `pSchema`): a decorator binds to the
    * next def; module-level defs are scalars, classes with the 4-method
    * aggregate contract are UDAFs. */
  def parseScript(src: String): (Seq[PyFunc], Seq[PyAgg]) = {
    val funcs = ArrayBuffer.empty[PyFunc]
    val aggs = ArrayBuffer.empty[PyAgg]
    var pendingType: Option[String] = None
    var curClass: Option[String] = None
    var methods = Map.empty[String, (Int, Option[String])] // name -> (arity, decorator)
    def closeClass(): Unit = {
      curClass.foreach { cn =>
        val needed = Seq("eval", "merge", "get_partial_result", "get_final_result")
        if (needed.forall(methods.contains)) {
          val rt = methods("get_final_result")._2.map(tajoType).getOrElse(BinaryType)
          aggs += PyAgg(cn, math.max(0, methods("eval")._1 - 1), rt)
        }
      }
      curClass = None; methods = Map.empty
    }
    src.linesIterator.foreach {
      case decoratorRe(t) => pendingType = Some(t)
      case classRe(name) => closeClass(); curClass = Some(name); pendingType = None
      case defRe(name, params) => // module level: ends any open class
        closeClass()
        funcs += PyFunc(name, countParams(params), pendingType.map(tajoType).getOrElse(BinaryType))
        pendingType = None
      case methodRe(name, params) if curClass.isDefined =>
        methods += name -> (countParams(params), pendingType)
        pendingType = None
      case line if line.trim.nonEmpty && !line.startsWith(" ") && !line.startsWith("\t") &&
                   !line.trim.startsWith("#") && !line.trim.startsWith("@") =>
        // any other module-level statement ends an open class body
        closeClass()
      case _ => ()
    }
    closeClass()
    (funcs.toSeq, aggs.toSeq)
  }

  // ------------------------------------------------- controller material

  /** `tajo_util` shim so reference-style scripts import cleanly. The
    * decorator is declaration-only — the type is read by the Scala parser,
    * python just passes the function through. */
  private val tajoUtilPy =
    """def output_type(*types):
      |    def _wrap(f):
      |        return f
      |    return _wrap
      |
      |class udf_logging(object):
      |    @classmethod
      |    def set_log_level_error(cls): pass
      |    @classmethod
      |    def set_log_level_warn(cls): pass
      |    @classmethod
      |    def set_log_level_info(cls): pass
      |    @classmethod
      |    def set_log_level_debug(cls): pass
      |""".stripMargin

  /** Worker loop. One JSON object per line on stdin, one per line on
    * stdout. Requests:
    *   {"f": name, "b": [[args]...]}          -> {"rs": [results]}
    *   {"e": [key, [args]], "c": class}       -> (no reply; eval into state)
    *   {"p": 1}                               -> {"partials": [[key, partial]...]} and reset
    *   {"fb": [[partials-of-row1], ...], "c": class} -> {"rs": [finals]}
    * Any raised exception -> {"error": msg} and the Scala side fails the task. */
  private val controllerPy =
    """import sys, os, json, importlib.util
      |sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
      |_spec = importlib.util.spec_from_file_location("graft_udf_script", sys.argv[1])
      |_mod = importlib.util.module_from_spec(_spec)
      |_spec.loader.exec_module(_mod)
      |_state = {}
      |def _inst(cls_name, key):
      |    d = _state.setdefault(cls_name, {})
      |    if key not in d:
      |        d[key] = getattr(_mod, cls_name)()
      |    return d[key]
      |for _line in sys.stdin:
      |    if not _line.strip():
      |        continue
      |    try:
      |        _req = json.loads(_line)
      |        if "f" in _req:
      |            _fn = getattr(_mod, _req["f"])
      |            _out = {"rs": [_fn(*_args) for _args in _req["b"]]}
      |        elif "e" in _req:
      |            _key, _args = _req["e"]
      |            _inst(_req["c"], _key).eval(*_args)
      |            continue
      |        elif "p" in _req:
      |            _out = {"partials": [[_k, _v.get_partial_result()]
      |                                 for _cls in _state.values()
      |                                 for _k, _v in _cls.items()]}
      |            _state = {}
      |        elif "rp" in _req:
      |            _partial, _args = _req["rp"]
      |            _agg = getattr(_mod, _req["c"])()
      |            if _partial is not None:
      |                _agg.merge(_partial)
      |            _agg.eval(*_args)
      |            _out = {"p": _agg.get_partial_result()}
      |        elif "mp" in _req:
      |            _p1, _p2 = _req["mp"]
      |            _agg = getattr(_mod, _req["c"])()
      |            if _p1 is not None:
      |                _agg.merge(_p1)
      |            if _p2 is not None:
      |                _agg.merge(_p2)
      |            _out = {"p": _agg.get_partial_result()}
      |        elif "fb" in _req:
      |            _finals = []
      |            for _parts in _req["fb"]:
      |                _agg = getattr(_mod, _req["c"])()
      |                for _p in _parts:
      |                    _agg.merge(_p)
      |                _finals.append(_agg.get_final_result())
      |            _out = {"rs": _finals}
      |        else:
      |            _out = {"error": "unknown request"}
      |    except Exception as _ex:
      |        _out = {"error": "%s: %s" % (type(_ex).__name__, _ex)}
      |    sys.stdout.write(json.dumps(_out) + "\n")
      |    sys.stdout.flush()
      |""".stripMargin

  /** Per-JVM staging dir for the controller + shim (executor side). */
  private lazy val controllerDir: Path = {
    val dir = Files.createTempDirectory("graft-pyudf")
    dir.toFile.deleteOnExit()
    val c = dir.resolve("controller.py"); val u = dir.resolve("tajo_util.py")
    Files.write(c, controllerPy.getBytes(StandardCharsets.UTF_8))
    Files.write(u, tajoUtilPy.getBytes(StandardCharsets.UTF_8))
    c.toFile.deleteOnExit(); u.toFile.deleteOnExit()
    dir
  }

  // ------------------------------------------------------------- worker

  /** One python3 process; NOT thread-safe — callers hold one per thread. */
  final class Worker(scriptPath: String) {
    private val proc = {
      val pb = new ProcessBuilder("python3",
        controllerDir.resolve("controller.py").toString, resolveScript(scriptPath))
      pb.redirectErrorStream(false)
      val p = pb.start()
      // drain stderr so the child can't block on a full pipe
      val drain = new Thread(() => {
        val r = new BufferedReader(new InputStreamReader(p.getErrorStream, StandardCharsets.UTF_8))
        var line = r.readLine()
        while (line != null) { System.err.println(s"[pyudf] $line"); line = r.readLine() }
      }, "pyudf-stderr")
      drain.setDaemon(true); drain.start()
      p
    }
    private val out = new BufferedWriter(
      new OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8))
    private val in = new BufferedReader(
      new InputStreamReader(proc.getInputStream, StandardCharsets.UTF_8))

    def send(req: JValue): Unit = {
      out.write(JsonMethods.compact(JsonMethods.render(req))); out.write("\n"); out.flush()
    }
    def sendRecv(req: JValue): JValue = {
      send(req)
      val line = in.readLine()
      if (line == null)
        throw new RuntimeException(s"python udf worker for $scriptPath died (see [pyudf] stderr)")
      val resp = JsonMethods.parse(line)
      resp \ "error" match {
        case JString(msg) => throw new RuntimeException(s"python udf error: $msg")
        case _ => resp
      }
    }
    def alive: Boolean = proc.isAlive
    def close(): Unit = proc.destroy()
  }

  private def resolveScript(path: String): String = {
    val name = new File(path).getName
    val shipped = new File(SparkFiles.get(name))
    if (shipped.isFile) shipped.getAbsolutePath else path
  }

  /** (thread, script) -> worker. Bounded by task threads x scripts. */
  private val pool = new ConcurrentHashMap[(Long, String), Worker]()
  sys.addShutdownHook { pool.forEach((_, w) => w.close()) }

  private def worker(scriptPath: String): Worker = {
    val key = (Thread.currentThread().getId, scriptPath)
    var w = pool.get(key)
    if (w == null || !w.alive) { w = new Worker(scriptPath); pool.put(key, w) }
    w
  }

  // --------------------------------------------------------- conversions

  private def toJ(v: Any): JValue = v match {
    case null                      => JNull
    case b: java.lang.Boolean      => JBool(b)
    case i: java.lang.Integer      => JLong(i.longValue)
    case l: java.lang.Long         => JLong(l)
    case s: java.lang.Short        => JLong(s.longValue)
    case b: java.lang.Byte         => JLong(b.longValue)
    case f: java.lang.Float        => JDouble(f.doubleValue)
    case d: java.lang.Double       => JDouble(d)
    case d: java.math.BigDecimal   => JDecimal(BigDecimal(d))
    case d: BigDecimal             => JDecimal(d)
    case s: String                 => JString(s)
    case other                     => JString(other.toString)
  }

  private def fromJ(v: JValue, dt: DataType): Any = (v, dt) match {
    case (JNull | JNothing, _) => null
    case (j, ShortType)        => jLong(j).shortValue
    case (j, IntegerType)      => jLong(j).intValue
    case (j, LongType)         => jLong(j).longValue
    case (j, FloatType)        => jDouble(j).floatValue
    case (j, DoubleType)       => jDouble(j).doubleValue
    case (JString(s), StringType) => s
    case (j, StringType)       => JsonMethods.compact(JsonMethods.render(j))
    case (JBool(b), BooleanType) => b
    case (JString(s), BinaryType) => s.getBytes(StandardCharsets.UTF_8)
    case (j, BinaryType)       => JsonMethods.compact(JsonMethods.render(j)).getBytes(StandardCharsets.UTF_8)
    case (j, dt) =>
      throw new IllegalArgumentException(s"cannot convert python result $j to $dt")
  }
  private def jLong(j: JValue): java.lang.Long = j match {
    case JLong(l) => l
    case JInt(i) => i.longValue
    case JDouble(d) => d.longValue
    case JDecimal(d) => d.longValue
    case JString(s) => s.toLong
    case other => throw new IllegalArgumentException(s"expected integer, got $other")
  }
  private def jDouble(j: JValue): java.lang.Double = j match {
    case JDouble(d) => d
    case JDecimal(d) => d.doubleValue
    case JLong(l) => l.doubleValue
    case JInt(i) => i.doubleValue
    case JString(s) => s.toDouble
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }

  /** One scalar call (row-at-a-time path). */
  def call(scriptPath: String, func: String, returnType: DataType, args: Seq[Any]): Any = {
    val resp = worker(scriptPath).sendRecv(
      JObject("f" -> JString(func), "b" -> JArray(List(JArray(args.map(toJ).toList)))))
    (resp \ "rs") match {
      case JArray(r :: Nil) => fromJ(r, returnType)
      case other => throw new RuntimeException(s"bad python udf response: $other")
    }
  }

  // ----------------------------------------------------- SQL aggregate

  private def partialOp(scriptPath: String, cls: String, req: JObject): String = {
    val resp = worker(scriptPath).sendRecv(req)
    (resp \ "p") match {
      case JNull | JNothing => null
      case p => JsonMethods.compact(JsonMethods.render(p))
    }
  }

  private def parseOrNull(s: String): JValue =
    if (s == null) JNull else JsonMethods.parse(s)

  /** buffer-partial ⊕ one input row -> new partial (controller `rp`). */
  def reducePartial(scriptPath: String, cls: String, partial: String, args: Seq[Any]): String =
    partialOp(scriptPath, cls, JObject(
      "rp" -> JArray(List(parseOrNull(partial), JArray(args.map(toJ).toList))),
      "c" -> JString(cls)))

  /** two partials -> merged partial (controller `mp`). */
  def mergePartials(scriptPath: String, cls: String, p1: String, p2: String): String =
    partialOp(scriptPath, cls, JObject(
      "mp" -> JArray(List(parseOrNull(p1), parseOrNull(p2))), "c" -> JString(cls)))

  /** partial -> final value (controller `fb` over a single row). */
  def finishPartial(scriptPath: String, cls: String, partial: String, rt: DataType): Any = {
    val parts = if (partial == null) Nil else List(parseOrNull(partial))
    val resp = worker(scriptPath).sendRecv(JObject(
      "fb" -> JArray(List(JArray(parts))), "c" -> JString(cls)))
    (resp \ "rs") match {
      case JArray(v :: Nil) => fromJ(v, rt)
      case other => throw new RuntimeException(s"bad finals response: $other")
    }
  }

  /** The reference registers an aggregate class as a SQL function named
    * `classname.toLowerCase` (PythonScriptEngine.java "funcName =
    * className.toLowerCase()"): `SELECT avgpy(x) FROM t GROUP BY g` works
    * directly. The reference's param types are ANY; Spark's untyped UDAF
    * needs a declared input schema, so [[registerScript]] defaults every
    * parameter to DOUBLE (widest numeric — ints cast losslessly to 2^53)
    * and [[registerUdaf]] lets callers declare exact types. The buffer
    * holds the python partial as a JSON string, so partial aggregation
    * and merges distribute exactly like the reference's two-stage
    * contract. One pipe round trip per input ROW — dimension-scale; use
    * [[aggregate]] (one round trip per PARTITION of rows) at corpus
    * scale. */
  final class PythonSqlUdaf(scriptPath: String, cls: String, rt: DataType,
                            inputTypes: Seq[DataType])
      extends org.apache.spark.sql.expressions.UserDefinedAggregateFunction {
    override def inputSchema: StructType =
      StructType(inputTypes.zipWithIndex.map { case (t, i) => StructField(s"a$i", t) })
    override def bufferSchema: StructType =
      StructType(Seq(StructField("partial", StringType)))
    override def dataType: DataType = rt
    override def deterministic: Boolean = true
    override def initialize(b: org.apache.spark.sql.expressions.MutableAggregationBuffer): Unit =
      b.update(0, null)
    override def update(b: org.apache.spark.sql.expressions.MutableAggregationBuffer, in: Row): Unit =
      b.update(0, reducePartial(scriptPath, cls, b.getString(0), in.toSeq))
    override def merge(b1: org.apache.spark.sql.expressions.MutableAggregationBuffer, b2: Row): Unit =
      b1.update(0, mergePartials(scriptPath, cls, b1.getString(0), b2.getString(0)))
    override def evaluate(b: Row): Any =
      finishPartial(scriptPath, cls, b.getString(0), rt)
  }

  /** Register one aggregate class as a SQL function with explicit input
    * types; name defaults to the reference's lowercase-class-name. */
  def registerUdaf(spark: SparkSession, scriptPath: String, agg: PyAgg,
                   inputTypes: Seq[DataType], name: String = null): String = {
    val n = Option(name).getOrElse(agg.className.toLowerCase)
    spark.sparkContext.addFile(scriptPath)
    spark.udf.register(n, new PythonSqlUdaf(scriptPath, agg.className, agg.returnType, inputTypes))
    n
  }

  // --------------------------------------------------------- registration

  /** Register every function in a script as a SQL function; returns the
    * registered names. Scalars keep their def names; aggregate classes
    * register under `classname.toLowerCase` with DOUBLE inputs (the
    * reference's ANY-typed params — see [[PythonSqlUdaf]]; use
    * [[registerUdaf]] for exact input types, [[aggregate]] for the
    * corpus-scale batched path). */
  def registerScript(spark: SparkSession, path: String): Seq[String] = {
    val src = new String(Files.readAllBytes(new File(path).toPath), StandardCharsets.UTF_8)
    val (funcs, aggs) = parseScript(src)
    spark.sparkContext.addFile(path)
    val scalarNames = funcs.map { f =>
      register(spark, path, f)
      f.name
    }
    val aggNames = aggs.map(a =>
      registerUdaf(spark, path, a, Seq.fill(a.evalParamCount)(DoubleType)))
    scalarNames ++ aggNames
  }

  private def register(spark: SparkSession, path: String, f: PyFunc): Unit = {
    val (p, n, rt) = (path, f.name, f.returnType)
    f.paramCount match {
      case 0 => spark.udf.register(n, new UDF0[Any] {
        override def call(): Any = PythonUdf.call(p, n, rt, Nil) }, rt)
      case 1 => spark.udf.register(n, new UDF1[Any, Any] {
        override def call(a: Any): Any = PythonUdf.call(p, n, rt, Seq(a)) }, rt)
      case 2 => spark.udf.register(n, new UDF2[Any, Any, Any] {
        override def call(a: Any, b: Any): Any = PythonUdf.call(p, n, rt, Seq(a, b)) }, rt)
      case 3 => spark.udf.register(n, new UDF3[Any, Any, Any, Any] {
        override def call(a: Any, b: Any, c: Any): Any = PythonUdf.call(p, n, rt, Seq(a, b, c)) }, rt)
      case 4 => spark.udf.register(n, new UDF4[Any, Any, Any, Any, Any] {
        override def call(a: Any, b: Any, c: Any, d: Any): Any = PythonUdf.call(p, n, rt, Seq(a, b, c, d)) }, rt)
      case 5 => spark.udf.register(n, new UDF5[Any, Any, Any, Any, Any, Any] {
        override def call(a: Any, b: Any, c: Any, d: Any, e: Any): Any = PythonUdf.call(p, n, rt, Seq(a, b, c, d, e)) }, rt)
      case 6 => spark.udf.register(n, new UDF6[Any, Any, Any, Any, Any, Any, Any] {
        override def call(a: Any, b: Any, c: Any, d: Any, e: Any, g: Any): Any = PythonUdf.call(p, n, rt, Seq(a, b, c, d, e, g)) }, rt)
      case k => throw new IllegalArgumentException(s"python udf $n: unsupported arity $k (max 6)")
    }
  }

  /** Parse a script without registering (API access to the inventory). */
  def parse(path: String): (Seq[PyFunc], Seq[PyAgg]) =
    parseScript(new String(Files.readAllBytes(new File(path).toPath), StandardCharsets.UTF_8))

  // ------------------------------------------------------ batched column

  /** Batched scalar application — the corpus-scale path. Appends
    * `outCol` = func(inCols...) with `batchSize` rows per protocol round
    * trip (pipe latency amortizes ~1000x vs the SQL-UDF path). */
  def mapColumn(df: DataFrame, scriptPath: String, func: String, returnType: DataType,
                inCols: Seq[String], outCol: String, batchSize: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    spark.sparkContext.addFile(scriptPath)
    val inIdx = inCols.map(df.schema.fieldIndex)
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, returnType))
    val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { it =>
      val w = worker(scriptPath)
      it.grouped(batchSize).flatMap { rows =>
        val batch = JArray(rows.map(r => JArray(inIdx.map(i => toJ(r.get(i))).toList)).toList)
        val resp = w.sendRecv(JObject("f" -> JString(func), "b" -> batch))
        val rs = (resp \ "rs") match {
          case JArray(vs) => vs
          case other => throw new RuntimeException(s"bad python udf response: $other")
        }
        rows.iterator.zip(rs.iterator).map { case (r, v) =>
          Row.fromSeq(r.toSeq :+ fromJ(v, returnType))
        }
      }
    }(enc)
  }

  // ------------------------------------------------------------ aggregate

  /** Distributed two-stage python aggregate (the reference's
    * eval/partial/merge/final contract, PythonScriptEngine.java:119-140):
    *
    * stage 1 `mapPartitions`: the worker folds every row of the partition
    * into per-group instances (`eval`), then emits one
    * (group, partial-JSON) row per group — map-side partial aggregation,
    * so the shuffle carries one row per (partition, group), never the data.
    *
    * stage 2 `groupBy(group).agg(collect_list(partial))` (bounded: <=
    * numPartitions partials per group) then one `fb` batch per output row
    * reconstructs an instance from merged partials and takes
    * `get_final_result`. */
  def aggregate(df: DataFrame, scriptPath: String, agg: PyAgg,
                groupCols: Seq[String], inputCols: Seq[String],
                resultCol: String): DataFrame = {
    val spark = df.sparkSession
    spark.sparkContext.addFile(scriptPath)
    val narrowed = df.select((groupCols ++ inputCols).map(col): _*)
    val gIdx = groupCols.indices
    val iIdx = inputCols.indices.map(_ + groupCols.length)
    val stage1Schema = StructType(
      groupCols.map(c => narrowed.schema(c)) :+ StructField("__partial", StringType))
    val enc1 = RowEncoder.encoderFor(stage1Schema)
    val cls = agg.className

    val partials = narrowed.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else {
        val w = worker(scriptPath)
        val keyOf = scala.collection.mutable.HashMap.empty[String, Seq[Any]]
        it.foreach { r =>
          val gVals = gIdx.map(r.get)
          val key = JsonMethods.compact(JsonMethods.render(JArray(gVals.map(toJ).toList)))
          keyOf.getOrElseUpdate(key, gVals)
          w.send(JObject("e" -> JArray(List(JString(key),
            JArray(iIdx.map(i => toJ(r.get(i))).toList))), "c" -> JString(cls)))
        }
        val resp = w.sendRecv(JObject("p" -> JLong(1)))
        (resp \ "partials") match {
          case JArray(ps) => ps.iterator.map {
            case JArray(List(JString(key), partial)) =>
              Row.fromSeq(keyOf(key) :+ JsonMethods.compact(JsonMethods.render(partial)))
            case other => throw new RuntimeException(s"bad partial: $other")
          }
          case other => throw new RuntimeException(s"bad partials response: $other")
        }
      }
    }(enc1)

    val merged = partials.groupBy(groupCols.map(col): _*)
      .agg(collect_list(col("__partial")).as("__partials"))
    val outSchema = StructType(
      groupCols.map(c => narrowed.schema(c)) :+ StructField(resultCol, agg.returnType))
    val encOut = RowEncoder.encoderFor(outSchema)
    val pIdx = groupCols.length
    merged.mapPartitions { it =>
      val w = worker(scriptPath)
      it.grouped(256).flatMap { rows =>
        val fb = JArray(rows.map { r =>
          JArray(r.getSeq[String](pIdx).map(JsonMethods.parse(_)).toList)
        }.toList)
        val resp = w.sendRecv(JObject("fb" -> fb, "c" -> JString(cls)))
        val rs = (resp \ "rs") match {
          case JArray(vs) => vs
          case other => throw new RuntimeException(s"bad finals response: $other")
        }
        rows.iterator.zip(rs.iterator).map { case (r, v) =>
          Row.fromSeq(gIdx.map(r.get) :+ fromJ(v, agg.returnType))
        }
      }
    }(encOut)
  }
}
