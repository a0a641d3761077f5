package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.SnapshotStore

/** Branch contract: a fork is a manifest write (no data copied), writes
  * are isolated in BOTH directions, parent vacuum never eats a branch's
  * shared history, and the fork inherits the table's CHECK contract. */
class BranchSpec extends SparkSpec {

  private def df(ids: Long*): DataFrame = {
    val s = spark
    import s.implicits._
    ids.map(i => (i, i % 7)).toDF("id", "grp")
  }

  private def idsOf(root: String): Set[Long] =
    SnapshotStore.read(spark, root).select("id").collect()
      .map(_.getLong(0)).toSet

  /** MULTISET view of the ids — duplicates visible (a Set comparison
    * masks a dir referenced twice reading its rows twice). */
  private def idBag(root: String): Seq[Long] =
    SnapshotStore.read(spark, root).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq

  private def withRoot(f: String => Unit): Unit = {
    val root = java.nio.file.Files.createTempDirectory("br_spec").toString
    try f(root) finally SnapshotStore.deleteTree(root)
  }

  test("fork is a manifest write: dirs shared, zero data copied") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 100L: _*), root)
      SnapshotStore.append(df(101L to 200L: _*), root)
      val br = SnapshotStore.createBranch(root, "exp")
      assert(SnapshotStore.manifestDirs(br, 1).toSet
        == SnapshotStore.manifestDirs(root, 2).toSet)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(br, "data")),
        "fork copied data")
      assert(idsOf(br) == (1L to 200L).toSet)
      // duplicate name refuses; time-travel fork reads the old snapshot
      intercept[IllegalArgumentException](SnapshotStore.createBranch(root, "exp"))
      val old = SnapshotStore.createBranch(root, "asof-v1", fromVersion = 1)
      assert(idsOf(old) == (1L to 100L).toSet)
    }
  }

  test("writes are isolated in both directions; branch CoW never touches parent") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 100L: _*), root)
      val br = SnapshotStore.createBranch(root, "exp")
      SnapshotStore.append(df(201L to 210L: _*), br)          // branch append
      SnapshotStore.deleteWhere(spark, br, col("id") % 2 === 0) // branch CoW
      SnapshotStore.append(df(301L to 310L: _*), root)         // parent append
      assert(idsOf(br) ==
        ((1L to 100L) ++ (201L to 210L)).filter(_ % 2 == 1).toSet)
      assert(idsOf(root) == ((1L to 100L) ++ (301L to 310L)).toSet,
        "branch write leaked into the parent")
      // sub-branch of a branch works and sees the branch's state
      val sub = SnapshotStore.createBranch(br, "deeper")
      assert(idsOf(sub) == idsOf(br))
      // dropping the branch leaves the parent intact
      SnapshotStore.deleteBranch(root, "exp")
      assert(SnapshotStore.branches(root).isEmpty)
      assert(idsOf(root) == ((1L to 100L) ++ (301L to 310L)).toSet)
    }
  }

  test("parent vacuum retains every branch-referenced directory") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 50L: _*), root)
      val br = SnapshotStore.createBranch(root, "keepme")
      // the parent rewrites itself past the fork: the fork's dirs drop
      // out of the parent's OWN retained manifests entirely
      SnapshotStore.deleteWhere(spark, root, col("id") <= 25L)
      SnapshotStore.compact(spark, root)
      SnapshotStore.vacuum(root, keepFrom = SnapshotStore.currentVersion(root))
      // without branch retention this read would hit deleted files
      assert(idsOf(br) == (1L to 50L).toSet,
        "parent vacuum deleted the branch's shared history")
      // and after the branch is gone, a re-vacuum reclaims those dirs
      SnapshotStore.deleteBranch(root, "keepme")
      SnapshotStore.vacuum(root, keepFrom = SnapshotStore.currentVersion(root))
      assert(idsOf(root) == (26L to 50L).toSet)
    }
  }

  test("fast-forward merge: by reference, divergence refuses, delete guarded") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 50L: _*), root)
      val br = SnapshotStore.createBranch(root, "work")
      SnapshotStore.deleteWhere(spark, br, col("id") % 2 === 0)
      SnapshotStore.append(df(101L to 110L: _*), br)
      SnapshotStore.mergeBranch(spark, root, "work")
      // main now IS the branch content, by reference — no data copied
      assert(idsOf(root) ==
        ((1L to 50L).filter(_ % 2 == 1) ++ (101L to 110L)).toSet)
      assert(SnapshotStore.manifestOp(root, SnapshotStore.currentVersion(root))
        .contains("merge"))
      // the merged branch is parent data now: deleting it refuses loudly
      intercept[IllegalArgumentException](SnapshotStore.deleteBranch(root, "work"))
      // migrate the content into parent-owned storage, then delete works
      SnapshotStore.compact(spark, root)
      SnapshotStore.vacuum(root, keepFrom = SnapshotStore.currentVersion(root))
      SnapshotStore.deleteBranch(root, "work")
      assert(idsOf(root) ==
        ((1L to 50L).filter(_ % 2 == 1) ++ (101L to 110L)).toSet)
    }
  }

  test("a diverged parent refuses the merge") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 10L: _*), root)
      SnapshotStore.createBranch(root, "work")
      SnapshotStore.append(df(11L), root) // parent moves after the fork
      val e = intercept[IllegalArgumentException](
        SnapshotStore.mergeBranch(spark, root, "work"))
      assert(e.getMessage.contains("fast-forward"))
      assert(idsOf(root) == (1L to 11L).toSet) // nothing changed
    }
  }

  test("branch vacuum retains dirs a post-merge parent still references") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 20L: _*), root)
      val br = SnapshotStore.createBranch(root, "work")
      SnapshotStore.append(df(21L to 30L: _*), br) // branch-own dir
      SnapshotStore.mergeBranch(spark, root, "work")
      // the branch keeps moving, then vacuums its own history: the
      // branch-own dir the PARENT's merged manifest references must
      // survive even though the branch's retained manifests are the
      // only thing its own math would keep
      SnapshotStore.deleteWhere(spark, br, col("id") > 25L)
      SnapshotStore.vacuum(br, keepFrom = SnapshotStore.currentVersion(br))
      assert(idsOf(root) == (1L to 30L).toSet,
        "branch vacuum deleted data the parent's merged manifest serves")
      assert(idsOf(br) == (1L to 25L).toSet)
    }
  }

  test("deleteBranch refuses while a post-merge SIBLING fork still references it") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 10L: _*), root)
      val work = SnapshotStore.createBranch(root, "work")
      SnapshotStore.append(df(11L to 20L: _*), work) // work-own dir
      SnapshotStore.mergeBranch(spark, root, "work")
      // a sibling forked AFTER the merge references work's data dir
      val exp = SnapshotStore.createBranch(root, "exp")
      // the old remediation path: parent's merge manifests go away...
      SnapshotStore.compact(spark, root)
      SnapshotStore.vacuum(root, keepFrom = SnapshotStore.currentVersion(root))
      // ...but exp still serves work's dir — delete must refuse
      intercept[IllegalArgumentException](SnapshotStore.deleteBranch(root, "work"))
      assert(idsOf(exp) == (1L to 20L).toSet)
      SnapshotStore.deleteBranch(root, "exp")
      SnapshotStore.deleteBranch(root, "work") // now unreferenced: fine
      assert(idsOf(root) == (1L to 20L).toSet)
    }
  }

  test("iterate-merge-iterate: a second fast-forward merge succeeds") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 10L: _*), root)
      val br = SnapshotStore.createBranch(root, "work")
      SnapshotStore.append(df(11L), br)
      SnapshotStore.mergeBranch(spark, root, "work")
      SnapshotStore.append(df(12L), br) // branch keeps iterating
      SnapshotStore.mergeBranch(spark, root, "work") // parent == merge point
      assert(idsOf(root) == (1L to 12L).toSet)
    }
  }

  test("merge enforces the parent's POST-fork constraints and carries epochs") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 10L: _*), root)
      SnapshotStore.createBranch(root, "work")
      val br = SnapshotStore.branchRoot(root, "work")
      SnapshotStore.appendEpoch(df(50L), br, epochId = 7L) // stream into branch
      SnapshotStore.addConstraint(spark, root, "cap", "id <= 100")
      SnapshotStore.appendEpoch(df(500L), br, epochId = 8L) // violates cap
      val e = intercept[IllegalArgumentException](
        SnapshotStore.mergeBranch(spark, root, "work"))
      assert(e.getMessage.contains("cap"))
      // drop the violating rows on the branch; merge lands and the
      // branch's epoch resume position survives on the parent
      SnapshotStore.deleteWhere(spark, br, col("id") > 100L)
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(idsOf(root) == ((1L to 10L) :+ 50L).toSet)
      assert(SnapshotStore.lastEpoch(root).contains(8L),
        "merge dropped the branch's epoch stamps")
    }
  }

  test("merge with BOTH sides epoch-stamped refuses unless a chain is chosen") {
    withRoot { root =>
      // parent and branch each stream-fed: two INDEPENDENT epoch chains
      // whose counters are not comparable (parent at 3, branch at 7)
      SnapshotStore.appendEpoch(df(1L to 10L: _*), root, epochId = 3L)
      val br = SnapshotStore.createBranch(root, "work")
      SnapshotStore.appendEpoch(df(11L), br, epochId = 7L)
      val e = intercept[IllegalArgumentException](
        SnapshotStore.mergeBranch(spark, root, "work"))
      assert(e.getMessage.contains("independent stream chains"))
      assert(idsOf(root) == (1L to 10L).toSet, "refused merge must not publish")
      // naming the survivor lands the merge and stamps THAT chain — the
      // parent's 3 would have LOST a max() comparison against the
      // branch's 7, silently invalidating the parent stream's resume
      // position (the double-ingest the refusal exists for)
      SnapshotStore.mergeBranch(spark, root, "work",
        keepEpochChain = Some("parent"))
      assert(SnapshotStore.lastEpoch(root).contains(3L))
      assert(idsOf(root) == (1L to 11L).toSet)
    }
  }

  test("rebase replays disjoint branch edits onto a moved parent; merge then fast-forwards") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 10L: _*), root)    // base dir A
      SnapshotStore.append(df(11L to 20L: _*), root)   // base dir B
      val br = SnapshotStore.createBranch(root, "work")
      // branch: curate dir A's region (CoW rewrite) and append its own
      SnapshotStore.deleteWhere(spark, br, col("id") <= 5L)
      SnapshotStore.append(df(31L to 35L: _*), br)
      // parent moves: append only (disjoint from the branch's edits)
      SnapshotStore.append(df(21L to 25L: _*), root)
      // pre-rebase, merge refuses (diverged)
      val e = intercept[IllegalArgumentException](
        SnapshotStore.mergeBranch(spark, root, "work"))
      assert(e.getMessage.contains("rebaseBranch"))
      // rebase is manifest surgery: no new data dirs appear in the branch
      val dirsBefore = SnapshotStore.manifestDirs(br,
        SnapshotStore.currentVersion(br)).toSet
      SnapshotStore.rebaseBranch(spark, root, "work")
      val dirsAfter = SnapshotStore.manifestDirs(br,
        SnapshotStore.currentVersion(br)).toSet
      assert((dirsAfter -- dirsBefore).forall(d =>
        SnapshotStore.manifestDirs(root, SnapshotStore.currentVersion(root))
          .contains(d)), "rebase copied data instead of referencing")
      // content = parent's edits + branch's edits composed
      assert(idsOf(br) ==
        ((6L to 25L) ++ (31L to 35L)).toSet)
      // parent untouched by the rebase
      assert(idsOf(root) == (1L to 25L).toSet)
      // idempotent while the parent stays put
      val v = SnapshotStore.currentVersion(br)
      SnapshotStore.rebaseBranch(spark, root, "work")
      assert(SnapshotStore.currentVersion(br) == v)
      // and now the merge fast-forwards through the rebase base
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(idsOf(root) == ((6L to 25L) ++ (31L to 35L)).toSet)
      // iterate: branch keeps working after its own merge, parent quiet
      SnapshotStore.append(df(41L), br)
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(idsOf(root).contains(41L))
    }
  }

  test("rebase refuses when both sides rewrote the same region; vacuum stays safe post-rebase") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 10L: _*), root)
      val br = SnapshotStore.createBranch(root, "work")
      // BOTH sides CoW the same base dir: genuine overlap
      SnapshotStore.deleteWhere(spark, br, col("id") === 1L)
      SnapshotStore.deleteWhere(spark, root, col("id") === 10L)
      val e = intercept[Exception](
        SnapshotStore.rebaseBranch(spark, root, "work"))
      assert(e.getMessage.contains("conflict"))
      // branch state untouched by the refusal
      assert(idsOf(br) == (2L to 10L).toSet)
    }
    withRoot { root =>
      // vacuum safety: after a rebase the branch references parent dirs
      // the parent may compact away — parent vacuum must retain them
      // while the branch lives (same retained-set math as a fork)
      SnapshotStore.append(df(1L to 10L: _*), root)
      val br = SnapshotStore.createBranch(root, "work")
      SnapshotStore.append(df(21L to 25L: _*), br)
      SnapshotStore.append(df(11L to 15L: _*), root) // parent moves
      SnapshotStore.rebaseBranch(spark, root, "work")
      SnapshotStore.compact(spark, root)
      SnapshotStore.vacuum(root, keepFrom = SnapshotStore.currentVersion(root))
      // the branch still reads every row it referenced pre-vacuum
      assert(idsOf(br) == ((1L to 15L) ++ (21L to 25L)).toSet)
      // branch's own epoch chain survives a rebase
      SnapshotStore.appendEpoch(df(99L), br, epochId = 5L)
      SnapshotStore.append(df(16L), root)
      SnapshotStore.rebaseBranch(spark, root, "work")
      assert(SnapshotStore.lastEpoch(br).contains(5L),
        "rebase dropped the branch's epoch stamp")
      assert(idsOf(br) ==
        ((1L to 16L) ++ (21L to 25L) :+ 99L).toSet)
    }
  }

  test("an orphan rebase-base sidecar never lets a diverged merge pass") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 10L: _*), root)
      val br = SnapshotStore.createBranch(root, "work")
      SnapshotStore.append(df(11L to 15L: _*), root) // parent moves
      // simulate a CRASHED rebase: the base sidecar for v2 was written
      // (recording the parent's current dirs) but the rebase manifest
      // never committed...
      val parentDirs = SnapshotStore.manifestDirs(
        root, SnapshotStore.currentVersion(root))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(br, "_manifests", "rebase_base_v2.json"),
        parentDirs.map(d => s""""$d"""")
          .mkString("{\"dirs\": [", ", ", "]}").getBytes("UTF-8"))
      // ...and an ordinary APPEND later takes version 2
      SnapshotStore.append(df(21L), br)
      assert(SnapshotStore.currentVersion(br) == 2)
      // the sidecar must NOT attach to the append: merging now would
      // publish {fork + 21} over the parent, silently dropping 11..15
      val e = intercept[IllegalArgumentException](
        SnapshotStore.mergeBranch(spark, root, "work"))
      assert(e.getMessage.contains("not an ancestor"))
      assert(idsOf(root) == (1L to 15L).toSet, "diverged merge published")
      // the real remediation still works: rebase (writes a REAL rebase
      // manifest) then merge
      SnapshotStore.rebaseBranch(spark, root, "work")
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(idsOf(root) == ((1L to 15L) :+ 21L).toSet)
    }
  }

  test("rebase after merge honors post-merge branch deletes and never duplicates merged dirs") {
    withRoot { root =>
      // the exact corruption shape a review pass caught: append on the
      // branch → rebase → MERGE (the branch's dirs enter the parent by
      // reference) → branch deletes a merged row (CoW rewrite of a dir
      // the parent now also references) → rebase. Without the merge
      // re-anchoring the branch, the parent's copy of the pre-rewrite
      // dir rode back in: row 11 read TWICE and the delete of row 10
      // silently undone — then merged into the parent.
      SnapshotStore.append(df(1L, 2L), root)
      SnapshotStore.createBranch(root, "work")
      val br = SnapshotStore.branchRoot(root, "work")
      SnapshotStore.append(df(10L, 11L), br)
      SnapshotStore.rebaseBranch(spark, root, "work")
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(idBag(root) == Seq(1L, 2L, 10L, 11L))
      SnapshotStore.deleteWhere(spark, br, col("id") === 10L)
      SnapshotStore.rebaseBranch(spark, root, "work")
      assert(idBag(br) == Seq(1L, 2L, 11L),
        "post-merge rebase duplicated or resurrected rows")
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(idBag(root) == Seq(1L, 2L, 11L))
      // and a post-merge branch edit CONFLICTING with a parent edit of
      // the same (merged) region refuses instead of silently composing:
      // both sides rewrite the dir that carries row 11
      SnapshotStore.createBranch(root, "two")
      val b2 = SnapshotStore.branchRoot(root, "two")
      SnapshotStore.deleteWhere(spark, b2, col("id") === 11L)
      SnapshotStore.deleteWhere(spark, root, col("id") === 11L)
      val e = intercept[IllegalArgumentException](
        SnapshotStore.rebaseBranch(spark, root, "two"))
      assert(e.getMessage.contains("conflict"))
    }
    withRoot { root =>
      // the merge-anchor CRASH WINDOW: the parent merge committed but the
      // branch-side anchor write never happened. The load-bearing
      // direction is a PARENT edit of a merged-in branch dir: without
      // anchor REPAIR (re-deriving the anchor from the parent's
      // surviving merge manifest), the branch's copy of the pre-rewrite
      // dir would ride back in — rows duplicated, the parent's delete
      // resurrected
      SnapshotStore.append(df(1L, 2L), root)
      SnapshotStore.createBranch(root, "work")
      val br = SnapshotStore.branchRoot(root, "work")
      SnapshotStore.append(df(10L, 11L), br)
      val bvAtMerge = SnapshotStore.currentVersion(br)
      SnapshotStore.mergeBranch(spark, root, "work")
      // simulate the crash: delete the anchor the merge just wrote (the
      // assert pins the filename handshake — a silent rename would make
      // this test stop exercising the repair path)
      assert(java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        br, "_manifests", s"merge_anchor_v$bvAtMerge.json")),
        "merge anchor sidecar not found where the test expects it")
      // PARENT edits the merged-in dir
      SnapshotStore.deleteWhere(spark, root, col("id") === 10L)
      SnapshotStore.rebaseBranch(spark, root, "work")
      assert(idBag(br) == Seq(1L, 2L, 11L),
        "anchor repair failed: crash-window rebase duplicated/resurrected rows")
      // and the repaired anchor persists: branch edits then compose
      SnapshotStore.deleteWhere(spark, br, col("id") === 11L)
      SnapshotStore.rebaseBranch(spark, root, "work")
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(idBag(root) == Seq(1L, 2L))
    }
  }

  test("second rebase filters dirs the branch dropped BEFORE its rebase anchor") {
    withRoot { root =>
      // fork → branch curate (drops dir A entirely, CoW-rewrites dir B)
      // → parent append → rebase → parent append → rebase. The second
      // rebase's anchor is the FIRST rebase, whose base carries dirs A
      // and B that no branch manifest in (anchor..head) ever carried —
      // a droppedSince built only from carried manifests misses them
      // and the second rebase resurrects the deleted rows (1..7) and
      // reads the rewritten ones (8..10) twice.
      SnapshotStore.append(df(1L to 5L: _*), root)   // dir A
      SnapshotStore.append(df(6L to 10L: _*), root)  // dir B
      SnapshotStore.createBranch(root, "work")
      val br = SnapshotStore.branchRoot(root, "work")
      SnapshotStore.deleteWhere(spark, br, col("id") <= 7L)
      SnapshotStore.append(df(11L, 12L), root)       // parent moves
      SnapshotStore.rebaseBranch(spark, root, "work")
      assert(idBag(br) == (8L to 12L), "first rebase composed wrong")
      SnapshotStore.append(df(13L, 14L), root)       // parent moves again
      SnapshotStore.rebaseBranch(spark, root, "work")
      assert(idBag(br) == (8L to 14L),
        "second rebase resurrected pre-anchor deletes or duplicated rewrites")
      // and the composed state merges clean
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(idBag(root) == (8L to 14L))
      // conflict detection vs the pre-anchor drop is restored too: a
      // parent rewrite of dir B (which the branch rewrote pre-anchor)
      // must refuse, not silently compose
      SnapshotStore.createBranch(root, "two")
      val b2 = SnapshotStore.branchRoot(root, "two")
      SnapshotStore.deleteWhere(spark, b2, col("id") === 8L)
      SnapshotStore.append(df(15L), root)
      SnapshotStore.rebaseBranch(spark, root, "two") // anchor = this rebase
      SnapshotStore.deleteWhere(spark, root, col("id") === 9L)
      val e = intercept[IllegalArgumentException](
        SnapshotStore.rebaseBranch(spark, root, "two"))
      assert(e.getMessage.contains("conflict"))
    }
  }

  test("merge-anchor crash at the rebase version still repairs on the next rebase") {
    withRoot { root =>
      // canonical rebase → merge: the merge anchors AT the rebase
      // version (av0 == bv). If that anchor write is lost in the crash
      // window, anchorOf falls back to the STALE rebase base — the next
      // rebase must re-derive the anchor from the parent's surviving
      // merge manifest, or a parent edit of a merged-in branch dir is
      // undone (10 resurrected) and its kept rows read twice (11).
      SnapshotStore.append(df(1L, 2L), root)         // dir A
      SnapshotStore.createBranch(root, "work")
      val br = SnapshotStore.branchRoot(root, "work")
      SnapshotStore.append(df(10L, 11L), br)         // branch-own dir B
      SnapshotStore.append(df(3L, 4L), root)         // parent moves (dir C)
      SnapshotStore.rebaseBranch(spark, root, "work")
      val bvAtMerge = SnapshotStore.currentVersion(br)
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        br, "_manifests", s"merge_anchor_v$bvAtMerge.json")),
        "merge anchor sidecar not found where the test expects it")
      // parent edits the merged-in branch dir
      SnapshotStore.deleteWhere(spark, root, col("id") === 10L)
      SnapshotStore.rebaseBranch(spark, root, "work")
      assert(idBag(br) == Seq(1L, 2L, 3L, 4L, 11L),
        "merge-at-rebase-version anchor loss: stale rebase base used")
      // repaired anchor persists: branch edits compose and merge clean
      SnapshotStore.deleteWhere(spark, br, col("id") === 4L)
      SnapshotStore.rebaseBranch(spark, root, "work")
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(idBag(root) == Seq(1L, 2L, 3L, 11L))
    }
  }

  test("key-granular rebase composes disjoint row edits in ONE dir; genuine row conflict refuses") {
    withRoot { root =>
      // both sides CoW the SAME directory on DISJOINT rows: dir-granular
      // refuses, key-granular composes
      SnapshotStore.append(df(1L to 20L: _*), root) // one dir
      SnapshotStore.createBranch(root, "work")
      val br = SnapshotStore.branchRoot(root, "work")
      SnapshotStore.deleteWhere(spark, br, col("id") <= 5L)
      SnapshotStore.append(df(101L, 102L), br)
      SnapshotStore.deleteWhere(spark, root, col("id") >= 16L)
      val e = intercept[Exception](
        SnapshotStore.rebaseBranch(spark, root, "work"))
      assert(e.getMessage.contains("conflict"))
      SnapshotStore.rebaseBranch(spark, root, "work", keys = Seq("id"))
      assert(idBag(br) == ((6L to 15L) ++ Seq(101L, 102L)),
        "key-granular rebase lost or duplicated rows")
      // the row-rebase anchors like any rebase: merge fast-forwards
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(idBag(root) == ((6L to 15L) ++ Seq(101L, 102L)))
      // and the NEXT (dir-granular) rebase composes off the new anchor
      SnapshotStore.append(df(200L), root)
      SnapshotStore.deleteWhere(spark, br, col("id") === 6L)
      SnapshotStore.rebaseBranch(spark, root, "work")
      assert(idBag(br) == ((7L to 15L) ++ Seq(101L, 102L, 200L)))
    }
    withRoot { root =>
      // GENUINE row conflict: the branch deletes key 7, the parent
      // upserts it to a NEW value — both changed the same key, keys=
      // must still refuse (an upsert to the identical value nets to no
      // change and legitimately composes — that is not this fixture)
      val s = spark
      import s.implicits._
      SnapshotStore.append(df(1L to 10L: _*), root)
      SnapshotStore.createBranch(root, "work")
      val br = SnapshotStore.branchRoot(root, "work")
      SnapshotStore.deleteWhere(spark, br, col("id") === 7L)
      SnapshotStore.upsert(spark, Seq((7L, 99L)).toDF("id", "grp"),
        root, Seq("id"))
      val e = intercept[Exception](
        SnapshotStore.rebaseBranch(spark, root, "work", keys = Seq("id")))
      assert(e.getMessage.contains("row-conflict"))
      // the refusal leaves both sides untouched
      assert(idsOf(br) == ((1L to 10L).toSet - 7L))
      assert(idsOf(root) == (1L to 10L).toSet)
    }
  }

  test("key-granular rebase of a schema-evolved store keeps the widened column") {
    withRoot { root =>
      val s = spark
      import s.implicits._
      // the store spans a schema evolution BEFORE the fork: a plain
      // (sampled-footer) read could plan the narrow era's shape and the
      // materializing row-rebase would write the widened column out of
      // existence — permanently, and the merge would carry the loss
      SnapshotStore.append(df(1L to 10L: _*), root) // narrow era
      SnapshotStore.append(
        (11L to 14L).map(i => (i, i % 7, s"n$i")).toDF("id", "grp", "note"),
        root) // widened era
      SnapshotStore.createBranch(root, "work")
      val br = SnapshotStore.branchRoot(root, "work")
      SnapshotStore.deleteWhere(spark, br, col("id") === 1L)
      SnapshotStore.deleteWhere(spark, root, col("id") === 2L)
      SnapshotStore.rebaseBranch(spark, root, "work", keys = Seq("id"))
      val got = SnapshotStore.read(spark, br, mergeSchema = true)
        .select("id", "note").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got.keySet == ((3L to 14L).toSet),
        s"row-rebase lost or resurrected rows: ${got.keySet.toSeq.sorted}")
      assert((11L to 14L).forall(i => got(i).contains(s"n$i")),
        s"row-rebase dropped the evolved column's values: $got")
      assert((3L to 10L).forall(i => got(i).isEmpty),
        "narrow-era rows must read the evolved column as null")
      // and the composed state merges clean with the column intact
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(SnapshotStore.read(spark, root, mergeSchema = true)
        .where(col("note").isNotNull).count() == 4)
    }
  }

  test("key-granular rebase torture: parity-disjoint row edits compose through repeated rebase + merge") {
    withRoot { root =>
      // seeded → deterministic. The branch owns ODD ids, the parent EVEN
      // ids — deletes hit shared fork-time dirs from both sides (the
      // dir-overlap shape), so most rounds escalate to the row-level
      // replay; appends land in per-side ranges. After every
      // rebase(keys) + merge, BOTH stores must equal the model exactly
      // (multiset view — duplicates would expose a bad compose).
      val rnd = new scala.util.Random(7331)
      SnapshotStore.append(df(1L to 40L: _*), root)
      var model = (1L to 40L).toSet
      SnapshotStore.createBranch(root, "work")
      val br = SnapshotStore.branchRoot(root, "work")
      var nextB = 1001L; var nextP = 2000L
      (1 to 6).foreach { round =>
        // 2-4 random ops per side per round
        (0 until 1 + rnd.nextInt(2)).foreach { _ =>
          rnd.nextInt(2) match {
            case 0 => // branch delete of a random ODD id still present
              val odd = model.filter(_ % 2 == 1)
              if (odd.nonEmpty) {
                val victim = odd.toSeq.sorted.apply(rnd.nextInt(odd.size))
                SnapshotStore.deleteWhere(spark, br, col("id") === victim)
                model -= victim
              }
            case 1 => // branch append in its own ODD range
              SnapshotStore.append(df(nextB), br)
              model += nextB; nextB += 2
          }
        }
        (0 until 1 + rnd.nextInt(2)).foreach { _ =>
          rnd.nextInt(2) match {
            case 0 => // parent delete of a random EVEN id still present
              val even = model.filter(id => id % 2 == 0 && id < 1000L)
              if (even.nonEmpty) {
                val victim = even.toSeq.sorted.apply(rnd.nextInt(even.size))
                SnapshotStore.deleteWhere(spark, root, col("id") === victim)
                model -= victim
              }
            case 1 => // parent append in its own EVEN range
              SnapshotStore.append(df(nextP), root)
              model += nextP; nextP += 2
          }
        }
        SnapshotStore.rebaseBranch(spark, root, "work", keys = Seq("id"))
        assert(idBag(br) == model.toSeq.sorted,
          s"branch diverged from the model after round $round rebase")
        SnapshotStore.mergeBranch(spark, root, "work")
        assert(idBag(root) == model.toSeq.sorted,
          s"parent diverged from the model after round $round merge")
      }
    }
  }

  test("rebase torture: random disjoint parent/branch histories compose through rebase + merge") {
    withRoot { root =>
      // seeded → deterministic interleaving. Edit regions kept disjoint
      // BY ID RANGE (parent owns 100-999 post-fork, the branch owns
      // 1000+), so every rebase must compose cleanly — any refusal or
      // content drift is a bug, not a legitimate conflict. Invariants
      // are MULTISET comparisons (a Set would mask duplicated dirs) and
      // the model honors post-merge branch deletes of merged rows: the
      // branch view is (parent ∖ branchDeleted) ∪ (adds ∖ deleted).
      val rnd = new scala.util.Random(99)
      SnapshotStore.append(df(1L to 20L: _*), root)
      var parentIds = (1L to 20L).toSet
      SnapshotStore.createBranch(root, "work")
      val br = SnapshotStore.branchRoot(root, "work")
      var branchAdds = Set.empty[Long]
      var branchDeleted = Set.empty[Long]
      var nextP = 100L; var nextB = 1000L
      def expectedBranch: Seq[Long] =
        ((parentIds -- branchDeleted) ++ (branchAdds -- branchDeleted))
          .toSeq.sorted
      (1 to 12).foreach { step =>
        rnd.nextInt(4) match {
          case 0 => // parent append (its own range)
            SnapshotStore.append(df(nextP, nextP + 1), root)
            parentIds ++= Set(nextP, nextP + 1); nextP += 2
          case 1 => // parent delete restricted to its own post-fork rows
                    // (NOT merged-in branch ids >= 1000 — those dirs are
                    // the branch's edit region, and touching them would
                    // make the disjointness premise false)
            val victim = parentIds.filter(id => id >= 100L && id < 1000L)
            if (victim.nonEmpty) {
              val x = victim.min
              SnapshotStore.deleteWhere(spark, root, col("id") === x)
              parentIds -= x
            }
          case 2 => // branch append (its own range)
            SnapshotStore.append(df(nextB, nextB + 1), br)
            branchAdds ++= Set(nextB, nextB + 1); nextB += 2
          case 3 => // branch delete restricted to its own rows — which
                    // after a merge may live in PARENT-referenced dirs
            val victim = branchAdds -- branchDeleted
            if (victim.nonEmpty) {
              val x = victim.min
              SnapshotStore.deleteWhere(spark, br, col("id") === x)
              branchDeleted += x
            }
        }
        if (step % 3 == 0) {
          SnapshotStore.rebaseBranch(spark, root, "work")
          assert(idBag(br) == expectedBranch,
            s"rebase diverged at step $step")
          assert(idsOf(root) == parentIds,
            s"rebase touched the parent at step $step")
        }
        if (step % 6 == 0) {
          SnapshotStore.rebaseBranch(spark, root, "work")
          SnapshotStore.mergeBranch(spark, root, "work")
          parentIds = ((parentIds -- branchDeleted) ++
            (branchAdds -- branchDeleted))
          assert(idBag(root) == parentIds.toSeq.sorted,
            s"merge diverged at step $step")
        }
      }
      // closing round-trip
      SnapshotStore.rebaseBranch(spark, root, "work")
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(idBag(root) == expectedBranch)
    }
  }

  test("the fork inherits CHECK constraints") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 10L: _*), root)
      SnapshotStore.addConstraint(spark, root, "pos", "id > 0")
      val br = SnapshotStore.createBranch(root, "exp")
      intercept[Exception](SnapshotStore.append(df(-5L), br))
      assert(idsOf(br) == (1L to 10L).toSet) // violating batch never landed
      SnapshotStore.append(df(11L), br)      // a clean batch still lands
      assert(idsOf(br).contains(11L))
    }
  }

  test("key-granular rebase composes a POST-fork one-sided widening; rename signature refuses") {
    withRoot { root =>
      val s = spark
      import s.implicits._
      SnapshotStore.append(df(1L to 10L: _*), root)
      val br = SnapshotStore.createBranch(root, "work")
      // branch widens (appends a batch with a new column) AND CoW-deletes
      // a fork-time row; parent CoW-deletes a DIFFERENT row of the same dir
      SnapshotStore.deleteWhere(spark, br, col("id") === 1L)
      SnapshotStore.append(
        Seq((100L, 100L % 7, "w100")).toDF("id", "grp", "note"), br)
      SnapshotStore.deleteWhere(spark, root, col("id") === 2L)
      SnapshotStore.rebaseBranch(spark, root, "work", keys = Seq("id"))
      SnapshotStore.mergeBranch(spark, root, "work")
      val got = SnapshotStore.read(spark, root, mergeSchema = true)
        .select("id", "note").collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(got.keySet == (3L to 10L).toSet + 100L,
        s"evolved row-rebase lost or resurrected rows: ${got.keySet.toSeq.sorted}")
      assert(got(100L).contains("w100") && (3L to 10L).forall(got(_).isEmpty),
        s"null-fill contract broken: $got")
    }
    withRoot { root =>
      val s = spark
      import s.implicits._
      // BOTH sides carry exclusive columns — the rename/diverging-
      // evolution signature: refuse rather than split one logical column
      SnapshotStore.append(df(1L to 10L: _*), root)
      val br = SnapshotStore.createBranch(root, "work")
      SnapshotStore.deleteWhere(spark, br, col("id") === 1L)
      SnapshotStore.append(
        Seq((100L, 2L, "b")).toDF("id", "grp", "branch_note"), br)
      SnapshotStore.deleteWhere(spark, root, col("id") === 2L)
      SnapshotStore.append(
        Seq((200L, 4L, "p")).toDF("id", "grp", "parent_note"), root)
      val e = intercept[IllegalArgumentException](
        SnapshotStore.rebaseBranch(spark, root, "work", keys = Seq("id")))
      assert(e.getMessage.contains("rename"),
        s"expected the rename-signature refusal, got: ${e.getMessage}")
    }
  }

  test("vacuum pins an un-anchored merge manifest; the repair sweep releases it") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 10L: _*), root)
      SnapshotStore.append(df(11L to 20L: _*), root)
      val br = SnapshotStore.createBranch(root, "work")
      SnapshotStore.deleteWhere(spark, br, col("id") % 2 === 0)
      val mv = SnapshotStore.mergeBranch(spark, root, "work")
      // simulate the merge crash window: the parent commit landed, the
      // branch-side anchor sidecar never did
      val bv = SnapshotStore.currentVersion(br)
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        br, "_manifests", s"merge_anchor_v$bv.json"))
      SnapshotStore.append(df(21L to 30L: _*), root)
      SnapshotStore.vacuum(root, keepFrom = SnapshotStore.currentVersion(root))
      assert(SnapshotStore.hasManifest(root, mv),
        "vacuum reclaimed the merge manifest a live branch still needs " +
          "for anchor repair")
      // the repair sweep re-derives and PERSISTS the anchor → pin released
      SnapshotStore.rebaseBranch(spark, root, "work")
      SnapshotStore.vacuum(root, keepFrom = SnapshotStore.currentVersion(root))
      assert(!SnapshotStore.hasManifest(root, mv),
        "anchored merge manifest should reclaim")
      // and the branch is fully healthy: merge fast-forwards, content exact
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(idsOf(root) ==
        ((1L to 20L).filter(_ % 2 != 0) ++ (21L to 30L)).toSet)
    }
  }

  test("the force flag reclaims past a merge pin; an anchored idle merge never pins") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 10L: _*), root)
      val br = SnapshotStore.createBranch(root, "work")
      SnapshotStore.deleteWhere(spark, br, col("id") % 2 === 0)
      val mv = SnapshotStore.mergeBranch(spark, root, "work")
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        br, "_manifests",
        s"merge_anchor_v${SnapshotStore.currentVersion(br)}.json"))
      SnapshotStore.append(df(11L to 20L: _*), root)
      SnapshotStore.vacuum(root, keepFrom = SnapshotStore.currentVersion(root))
      assert(SnapshotStore.hasManifest(root, mv), "pin expected while the branch lives")
      // the force flag overrides (acknowledging the stale-anchor risk)
      SnapshotStore.vacuum(root, keepFrom = SnapshotStore.currentVersion(root),
        ignoreBranchAnchors = true)
      assert(!SnapshotStore.hasManifest(root, mv), "force must reclaim")
      // standard merged-branch remediation: compact migrates the content
      // into parent-owned storage, vacuum drops the by-reference
      // manifests, THEN the branch deletes
      SnapshotStore.compact(spark, root)
      SnapshotStore.vacuum(root, keepFrom = SnapshotStore.currentVersion(root),
        ignoreBranchAnchors = true)
      SnapshotStore.deleteBranch(root, "work")
      assert(idsOf(root) == ((1L to 10L).filter(_ % 2 != 0) ++ (11L to 20L)).toSet)
    }
    withRoot { root =>
      // an IDLE branch's crashed merge anchors at the fork version with
      // the fork's own dirs — the fork anchor is equivalent, so the
      // merge manifest is NOT needed and must not pin
      SnapshotStore.append(df(1L to 10L: _*), root)
      val br = SnapshotStore.branchRoot(root, "idle")
      SnapshotStore.createBranch(root, "idle")
      val mv = SnapshotStore.mergeBranch(spark, root, "idle")
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        br, "_manifests",
        s"merge_anchor_v${SnapshotStore.currentVersion(br)}.json"))
      SnapshotStore.append(df(11L to 20L: _*), root)
      SnapshotStore.vacuum(root, keepFrom = SnapshotStore.currentVersion(root))
      assert(!SnapshotStore.hasManifest(root, mv),
        "an idle branch's merge is fork-equivalent — no pin")
    }
  }

  test("parent vacuum retains a live branch's rebase-base content; a second key-granular rebase composes") {
    withRoot { root =>
      SnapshotStore.append(df(1L to 40L: _*), root)
      val br = SnapshotStore.createBranch(root, "work")
      // both sides CoW the SAME fork-time dir on disjoint rows → the
      // first rebase escalates to key granularity and records its base
      SnapshotStore.deleteWhere(spark, br, col("id") === 1L)
      SnapshotStore.deleteWhere(spark, root, col("id") === 10L)
      SnapshotStore.rebaseBranch(spark, root, "work", keys = Seq("id"))
      // both sides churn again, then the parent compacts and vacuums —
      // the rebase BASE dirs leave every parent manifest; only the
      // branch's anchor sidecar still needs their content
      SnapshotStore.deleteWhere(spark, root, col("id") === 20L)
      SnapshotStore.deleteWhere(spark, br, col("id") === 2L)
      SnapshotStore.compact(spark, root)
      SnapshotStore.vacuum(root, keepFrom = SnapshotStore.currentVersion(root))
      // pre-guard this refused: "anchor base content ... was vacuumed"
      SnapshotStore.rebaseBranch(spark, root, "work", keys = Seq("id"))
      SnapshotStore.mergeBranch(spark, root, "work")
      assert(idsOf(root) == (1L to 40L).toSet -- Set(1L, 2L, 10L, 20L),
        "second key-granular rebase must compose both curation passes")
    }
  }
}
