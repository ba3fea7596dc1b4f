package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.VersionedTable

/** Versioned-table commit protocol: snapshot isolation, time travel,
  * deterministic MERGE, orphan invisibility, vacuum retention, and
  * checksum conservation across a merge. */
class VersionedTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("vtable").resolve("t").toString

  private def rows(root: String): Set[(Long, String)] =
    VersionedTable.read(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("commits number sequentially; read returns the latest") {
    val root = tmpRoot()
    assert(VersionedTable.commit(
      Seq((1L, "a")).toDF("k", "v"), root) === 0L)
    assert(VersionedTable.commit(
      Seq((1L, "b")).toDF("k", "v"), root) === 1L)
    assert(VersionedTable.versions(spark, root) === Seq(0L, 1L))
    assert(rows(root) === Set((1L, "b")))
  }

  test("time travel reads a pinned version") {
    val root = tmpRoot()
    VersionedTable.commit(Seq((1L, "a"), (2L, "x")).toDF("k", "v"), root)
    VersionedTable.commit(Seq((1L, "b")).toDF("k", "v"), root)
    val v0 = VersionedTable.readVersion(spark, root, 0L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(v0 === Set((1L, "a"), (2L, "x")))
  }

  test("merge upserts: replace, append, carry over; checksums conserved") {
    val root = tmpRoot()
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), root)
    val v = VersionedTable.merge(spark, root,
      Seq((2L, "B"), (4L, "d")).toDF("k", "v"), Seq("k"))
    assert(v === 1L)
    assert(rows(root) === Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")))
    // untouched rows carried over byte-identically: checksum of the
    // untouched subset matches between versions
    def sumOf(ver: Long, keys: Seq[Long]) =
      VersionedTable.readVersion(spark, root, ver)
        .filter(col("k").isin(keys: _*))
        .select(xxhash64(col("k"), col("v")).as("h"))
        .agg(expr("bit_xor(h)")).collect()(0).getLong(0)
    assert(sumOf(0L, Seq(1L, 3L)) === sumOf(1L, Seq(1L, 3L)))
  }

  test("merge resolves duplicate update keys deterministically") {
    val root = tmpRoot()
    val dup = Seq((1L, "x"), (1L, "y"), (1L, "x")).toDF("k", "v")
    VersionedTable.merge(spark, root, dup, Seq("k"))
    val first = rows(root)
    assert(first.size === 1)
    // replaying the same batch commits an identical snapshot
    VersionedTable.merge(spark, root, dup, Seq("k"))
    assert(rows(root) === first)
  }

  test("orphan data dirs (crash before marker) are invisible; vacuum removes them") {
    val root = tmpRoot()
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "v"), root)
    // simulate a crash: data for v=1 fully written, no marker
    Seq((9L, "ghost")).toDF("k", "v")
      .write.parquet(s"$root/v=1")
    assert(VersionedTable.latestVersion(spark, root) === Some(0L))
    assert(rows(root) === Set((1L, "a")))
    // the next commit must NOT reuse the orphaned number blindly —
    // v=1 exists on disk, so commit throws (ErrorIfExists) and the
    // operator runs vacuum to clear debris first
    intercept[Exception] {
      VersionedTable.commit(Seq((2L, "b")).toDF("k", "v"), root)
    }
    VersionedTable.vacuum(spark, root, keep = 1)
    assert(VersionedTable.commit(
      Seq((2L, "b")).toDF("k", "v"), root) === 1L)
    assert(rows(root) === Set((2L, "b")))
  }

  test("vacuum keeps the newest K; vacuumed time travel fails cleanly") {
    val root = tmpRoot()
    for (i <- 0 to 3)
      VersionedTable.commit(Seq((i.toLong, "v")).toDF("k", "v"), root)
    val removed = VersionedTable.vacuum(spark, root, keep = 2)
    assert(removed === Seq(0L, 1L))
    assert(VersionedTable.versions(spark, root) === Seq(2L, 3L))
    intercept[IllegalArgumentException] {
      VersionedTable.readVersion(spark, root, 0L)
    }
    assert(rows(root) === Set((3L, "v")))
  }

  test("optimize commits a z-ordered NEW version; old layout survives") {
    val root = tmpRoot()
    val df = spark.range(0, 2000).toDF("id")
      .select(col("id").cast("long").as("k"),
        (col("id") % 7).cast("string").as("v"),
        (col("id") * 37 % 1000).as("x"), (col("id") * 61 % 1000).as("y"))
      .repartition(8) // fragmented layout
    VersionedTable.commit(df, root)
    val nv = VersionedTable.optimize(spark, root, Seq("x", "y"))
    assert(nv === 1L)
    assert(VersionedTable.versions(spark, root) === Seq(0L, 1L))
    // content identical across layouts (checksum over all rows)
    def sumOf(ver: Long) = VersionedTable.readVersion(spark, root, ver)
      .select(xxhash64(col("k"), col("v"), col("x"), col("y")).as("h"))
      .agg(expr("bit_xor(h)")).collect()(0).getLong(0)
    assert(sumOf(0L) === sumOf(1L))
    // the optimized snapshot is the new latest; the old one still reads
    assert(VersionedTable.read(spark, root).count() === 2000L)
    assert(VersionedTable.readVersion(spark, root, 0L).count() === 2000L)
    // rollback is free: vacuum keeping 1 drops the OLD version only
    VersionedTable.vacuum(spark, root, keep = 1)
    assert(VersionedTable.versions(spark, root) === Seq(1L))
  }

  test("diffVersions reports added/removed/changed by fingerprint") {
    val root = tmpRoot()
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), root)
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v"), root)
    val d = VersionedTable.diffVersions(spark, root, 0L, 1L, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d === Set((2L, "changed"), (3L, "removed"), (4L, "added")))
  }

  test("changes: CDC round-trip — applying the feed to v_from yields v_to") {
    val root = tmpRoot()
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (5L, "e")).toDF("k", "v"), root)
    VersionedTable.commit(
      Seq((1L, "a"), (2L, "B"), (4L, "d"), (5L, "e")).toDF("k", "v"), root)
    val ch = VersionedTable.changes(spark, root, 0L, 1L, Seq("k"))
    val got = ch.select("k", "v", "change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      (2L, "b", "update_preimage"), (2L, "B", "update_postimage"),
      (3L, "c", "delete"), (4L, "d", "insert")),
      s"unchanged keys must emit nothing: $got")
    assert(ch.select("v_from", "v_to").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((0L, 1L)))
    // round-trip: v0 minus (deletes + update_preimages) plus
    // (inserts + update_postimages) == v1 exactly
    val v0 = VersionedTable.readVersion(spark, root, 0L)
    val minus = ch.filter(col("change_type")
      .isin("delete", "update_preimage")).select("k", "v")
    val plus = ch.filter(col("change_type")
      .isin("insert", "update_postimage")).select("k", "v")
    val applied = v0.except(minus).union(plus)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val v1 = VersionedTable.readVersion(spark, root, 1L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(applied === v1, "change feed must reconstruct the target snapshot")
  }
}
