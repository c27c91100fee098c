package graft.tools

/**
 * Per-query warm-median floors from gate-clean bench passes at each
 * scale (VERDICT r15 next #2: the contention gate's entry/exit probes
 * have a mid-pass blind spot — the committed r15 sf1 leg ran three
 * untouched, plan-gated queries 3-8x their isolated steadies with
 * `sf1_contended:false`, and BASELINE.md had to adjudicate it by hand).
 * The floor gate makes that adjudication mechanical: a warm median far
 * above the recorded clean-window floor on a CLUSTER of queries is host
 * contention by construction (the plans are PlanSpec-gated, the data is
 * fixed per scale), so the pass self-flags and the recovery loop
 * re-runs it.
 *
 * PROVENANCE IS MECHANICAL (VERDICT r16 next #5 — the tables were
 * hand-edited source, an unaudited transcription step): the committed
 * floors live in the `graft/floors.json` RESOURCE, every gate-clean
 * protocol pass makes [[graft.Bench]] write its warm medians to
 * `floors_delta.json`, and [[FloorsFold]] folds the delta into the
 * resource with the elementwise MIN — no medians are ever typed by
 * hand. Floors are contention detectors, not perf targets: a genuinely
 * faster engine only ever lowers real medians below floor, which never
 * flags. Queries without a floor entry (new rows) are simply unchecked
 * until the next clean pass records them.
 *
 * Committed lineage: sf1 = min over the r14 closing artifact (git
 * 8027241, contended:false), the r16 closing clean leg (54.0 s warm)
 * and every later fold; sf01 = min over the r15 gate-recovered pass,
 * the r16 closing pass 0 and every later fold.
 */
object Floors {

  /** Flat `"name": number` pairs from a one-level JSON object body. */
  private[graft] def parseFlat(js: String): Map[String, Double] =
    "\"([^\"]+)\"\\s*:\\s*(-?[0-9][0-9.eE+-]*)".r.findAllMatchIn(js)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap

  /** One suite table out of the two-level floors JSON
    * (`{"sf1": {...}, "sf01": {...}}`). */
  private[graft] def parseSuite(js: String, tag: String): Map[String, Double] = {
    val m = (s""""$tag"\\s*:\\s*\\{([^}]*)\\}""").r.findFirstMatchIn(js)
    m.map(x => parseFlat(x.group(1))).getOrElse(Map.empty)
  }

  /** Elementwise min across clean-pass median tables: keys union, so a
    * NEW query's first clean median becomes its floor; an existing
    * floor only ever moves DOWN (min-of-clean-passes is the tightest
    * legitimate contention reference). */
  private[graft] def foldMin(tables: Seq[Map[String, Double]]): Map[String, Double] =
    tables.foldLeft(Map.empty[String, Double]) { (acc, t) =>
      (acc.keySet ++ t.keySet).map { k =>
        k -> math.min(acc.getOrElse(k, Double.MaxValue),
          t.getOrElse(k, Double.MaxValue))
      }.toMap
    }

  private lazy val committed: String =
    try {
      val in = getClass.getResourceAsStream("/graft/floors.json")
      if (in == null) "{}"
      else try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[floors] resource unreadable ($e) — floor gate disarmed")
      "{}"
    }

  private lazy val sf1: Map[String, Double] = parseSuite(committed, "sf1")
  private lazy val sf01: Map[String, Double] = parseSuite(committed, "sf01")

  /** Floor table for a suite tag ("sf1" / "sf01"); empty for others. */
  def of(tag: String): Map[String, Double] = tag match {
    case "sf1" => sf1
    case "sf01" | "sf01warm" => sf01
    case _ => Map.empty
  }

  /** Render the two-level floors JSON (sorted keys — stable diffs). */
  private[graft] def render(tables: Map[String, Map[String, Double]]): String = {
    def one(t: Map[String, Double]) =
      t.toSeq.sortBy(_._1).map { case (k, v) =>
        "  \"" + k + "\": " + java.lang.String.format(
          java.util.Locale.ROOT, "%.3f", Double.box(v))
      }.mkString("{\n", ",\n", "\n }")
    tables.toSeq.sortBy(_._1).map { case (tag, t) =>
      " \"" + tag + "\": " + one(t)
    }.mkString("{\n", ",\n", "\n}\n")
  }
}

/** Fold a bench-emitted `floors_delta.json` (written by [[graft.Bench]]
  * from every gate-clean protocol pass) into the committed
  * `graft/floors.json` resource: elementwise min, new queries adopted.
  * The ONLY sanctioned way to update floors — no hand-typed medians.
  *
  * Usage: runMain graft.tools.FloorsFold [deltaPath] [resourcePath]
  */
object FloorsFold {
  def main(args: Array[String]): Unit = {
    val deltaPath = if (args.length > 0) args(0) else "floors_delta.json"
    val resPath = if (args.length > 1) args(1)
      else "src/main/resources/graft/floors.json"
    val delta = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(deltaPath)), "UTF-8")
    val folded = Seq("sf1", "sf01").map { tag =>
      tag -> Floors.foldMin(Seq(Floors.of(tag), Floors.parseSuite(delta, tag)))
    }.toMap
    java.nio.file.Files.write(java.nio.file.Paths.get(resPath),
      Floors.render(folded).getBytes("UTF-8"))
    println(s"[floors] folded $deltaPath into $resPath " +
      folded.map { case (t, m) => s"$t=${m.size}" }.mkString("(", ", ", ")"))
  }
}
