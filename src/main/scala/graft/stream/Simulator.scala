package graft.stream

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.util.Random

import graft.schema.CensusRecord

/** Workload generator — the reference's stream_simulator.py (G1-G4)
  * re-expressed as a seeded, deterministic Scala generator.
  *
  * G1: uniform sample of 3-10 rows per tick (stream_simulator.py:33-35)
  * G2: 5% anomaly injection into hours_per_week from {90,95,100,5,3,1}
  *     (stream_simulator.py:23-28)
  * G3: 10 s tick, stop at >=500 rows (stream_simulator.py:32,53)
  * G4: stale `*.csv` cleanup (stream_simulator.py:16-18)
  */
object Simulator {

  final case class Config(
      seed: Long = 42L,
      batchMin: Int = 3,
      batchMax: Int = 10,
      anomalyRate: Double = 0.05,
      anomalyHours: Seq[Int] = Seq(90, 95, 100, 5, 3, 1),
      totalRows: Int = 500,
      tickMillis: Long = 10000L,
  )

  private val workclasses = Seq("Private", "Self-emp-not-inc", "Self-emp-inc",
    "Federal-gov", "Local-gov", "State-gov", "Without-pay")
  private val educations = Seq("Bachelors", "HS-grad", "Masters", "Doctorate",
    "Some-college", "11th", "9th", "Assoc-acdm", "Prof-school", "7th-8th")
  private val maritals = Seq("Married-civ-spouse", "Never-married", "Divorced",
    "Separated", "Widowed")
  private val occupations = Seq("Tech-support", "Craft-repair", "Sales",
    "Exec-managerial", "Prof-specialty", "Handlers-cleaners", "Machine-op-inspct",
    "Adm-clerical", "Farming-fishing", "Transport-moving", "Priv-house-serv",
    "Protective-serv")
  private val relationships = Seq("Husband", "Wife", "Own-child", "Not-in-family",
    "Other-relative", "Unmarried")
  private val races = Seq("White", "Black", "Asian-Pac-Islander",
    "Amer-Indian-Eskimo", "Other")
  private val genders = Seq("Male", "Female")
  private val countries = Seq("United-States", "United-States", "United-States",
    "Mexico", "Philippines", "Germany", "Canada", "India")

  /** Synthesizes the seed corpus (the reference's absent
    * `modified_file.csv`) over the FIXTURES.md §1 value domains,
    * guaranteeing every bucket-boundary value appears (FIXTURES §1).
    */
  def generateSeed(n: Int, seed: Long = 42L): Vector[CensusRecord] = {
    val rng = new Random(seed)
    val boundaryAges = Seq(17, 18, 29, 30, 44, 45, 64, 65)
    val boundaryHours = Seq(19, 20, 40, 41)
    val boundaryCapital = Seq(-1, 0, 1, 4999, 5000, 19999, 20000)
    (0 until n).map { i =>
      val age =
        if (i < boundaryAges.length) boundaryAges(i)
        else 17 + rng.nextInt(74)
      val hours =
        if (i < boundaryHours.length) boundaryHours(i)
        else 1 + rng.nextInt(99)
      val gain = if (rng.nextDouble() < 0.2) rng.nextInt(100000) else 0
      val loss = if (rng.nextDouble() < 0.1) rng.nextInt(4357) else 0
      val capital =
        if (i < boundaryCapital.length) boundaryCapital(i)
        else gain - loss
      CensusRecord(
        age = Some(age),
        workclass = Some(workclasses(rng.nextInt(workclasses.length))),
        education = Some(educations(rng.nextInt(educations.length))),
        marital_status = Some(maritals(rng.nextInt(maritals.length))),
        occupation = Some(occupations(rng.nextInt(occupations.length))),
        relationship = Some(relationships(rng.nextInt(relationships.length))),
        race = Some(races(rng.nextInt(races.length))),
        gender = Some(genders(rng.nextInt(genders.length))),
        capital_gain = Some(gain),
        capital_loss = Some(loss),
        hours_per_week = Some(hours),
        native_country = Some(countries(rng.nextInt(countries.length))),
        income = Some(rng.nextInt(2)),
        capital_income = Some(capital),
      )
    }.toVector
  }

  /** G1 + G2 — one tick's batch: uniform row sample + anomaly injection. */
  def sampleBatch(seedRows: Vector[CensusRecord], rng: Random, cfg: Config): Vector[CensusRecord] = {
    val n = cfg.batchMin + rng.nextInt(cfg.batchMax - cfg.batchMin + 1)
    Vector.fill(n) {
      val row = seedRows(rng.nextInt(seedRows.length))
      if (rng.nextDouble() < cfg.anomalyRate)
        row.copy(hours_per_week =
          Some(cfg.anomalyHours(rng.nextInt(cfg.anomalyHours.length))))
      else row
    }
  }

  /** S4 — headerless positional CSV batch file `batch_{ts}_{n}.csv`
    * (stream_simulator.py:41-43).
    */
  def writeBatchCsv(rows: Seq[CensusRecord], dir: String, unixTs: Long): File = {
    def f(o: Option[_]): String = o.map(_.toString).getOrElse("")
    val lines = rows.map { r =>
      Seq(f(r.age), f(r.workclass), f(r.education), f(r.marital_status),
        f(r.occupation), f(r.relationship), f(r.race), f(r.gender),
        f(r.capital_gain), f(r.capital_loss), f(r.hours_per_week),
        f(r.native_country), f(r.income), f(r.capital_income)).mkString(",")
    }
    val file = new File(dir, s"batch_${unixTs}_${rows.length}.csv")
    Files.write(file.toPath, lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    file
  }

  /** G4 — remove stale batch CSVs (stream_simulator.py:16-18). */
  def cleanDir(dir: String): Unit = {
    val d = new File(dir)
    if (d.exists()) d.listFiles().filter(_.getName.endsWith(".csv")).foreach(_.delete())
    else { Files.createDirectories(Paths.get(dir)); () }
  }

  /** G3 — the tick/stop loop, with the clock and sleep injectable so
    * the loop itself is testable (SimulatorSpec) without wall-clock
    * sleeps. Returns the total rows written. The tick counter feeds the
    * batch filename, so same-second ticks can't collide on
    * `batch_{ts}_{n}.csv` (the reference relies on its 10 s sleep to
    * avoid that).
    */
  def runLoop(dir: String, cfg: Config,
      sleep: Long => Unit = Thread.sleep,
      clock: () => Long = () => System.currentTimeMillis() / 1000): Int = {
    cleanDir(dir)
    val seedRows = generateSeed(2000, cfg.seed)
    val rng = new Random(cfg.seed)
    var count = 0
    var tick = 0
    while (count < cfg.totalRows) {
      val batch = sampleBatch(seedRows, rng, cfg)
      writeBatchCsv(batch, dir, clock() * 1000 + tick)
      count += batch.length
      tick += 1
      println(s"[simulator] wrote ${batch.length} rows ($count/${cfg.totalRows})")
      sleep(cfg.tickMillis)
    }
    count
  }

  /** Demo loop entry point (G3): tick every `tickMillis`, stop at
    * `totalRows`.
    */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_stream_input")
    runLoop(dir, Config())
    ()
  }
}
