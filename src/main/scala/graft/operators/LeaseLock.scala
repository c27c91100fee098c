package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Advisory single-writer LEASE lock on a filesystem path (VERDICT r14
 * #5) — shared by [[VectorStore]] and [[PostingIndex]].
 *
 * Acquisition is atomic create-if-absent (O_CREAT|O_EXCL through
 * java.io on the local FS — Hadoop's RawLocalFileSystem create is
 * check-then-act; `create(overwrite = false)` elsewhere, atomic on
 * HDFS; object stores without atomic create should front this with an
 * external lock service, like every Hadoop committer documents).
 *
 * The lock is a LEASE, not a tombstone: the holder heartbeats an
 * owner-keyed SIBLING file (`<lock>.hb.<owner>`) from a daemon thread
 * (leaseMs/4 cadence — see [[holderAlive]] for why the beat never
 * touches the lock file itself), and waiters STEAL a lock whose
 * liveness evidence exceeds the lease — a crashed holder delays
 * the next writer by ~one lease, not the whole acquisition timeout,
 * and a human deleting the lock (or `clear(force)`) stops being the
 * only recovery. The steal cannot race other stealers: the stale lock
 * is RENAMED to a unique tombstone first — exactly one stealer wins
 * the rename — then everyone re-contends on the normal create path.
 *
 * A LIVE holder is never stolen (its heartbeat keeps the lock young);
 * a holder frozen past the lease (multi-minute GC / VM pause) is
 * indistinguishable from dead and loses the lock. Releases are
 * OWNER-CHECKED (a uuid stamped into the lock at acquisition): a
 * zombie holder resuming after a steal must not delete its
 * successor's lock on top of its own lateness — it logs loudly and
 * leaves the lock alone.
 */
private[operators] object LeaseLock {

  private def tryLock(fs: FileSystem, lock: Path): Boolean =
    if ("file" == Option(lock.toUri.getScheme).getOrElse(fs.getScheme))
      try new java.io.File(lock.toUri.getPath).createNewFile()
      catch {
        case _: java.io.IOException => // parent vanished mid-spin
          fs.mkdirs(lock.getParent); false
      }
    else
      try { fs.create(lock, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
      }

  private def ageMs(fs: FileSystem, lock: Path): Long =
    try System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime
    catch { case _: java.io.IOException => -1L }

  /** Heartbeat sibling, keyed by owner IN THE FILENAME (ADVICE r16 #1):
    * a single shared `<lock>.hb` could be overwritten by a zombie whose
    * lock was stolen mid-beat (TOCTOU between its ownership read and
    * its hb write), destroying the successor's liveness evidence for up
    * to one beat interval — long enough for a third waiter to steal a
    * LIVE holder's lock. With the owner in the name, a zombie's write
    * lands in its own dead file and can never clobber anyone's. */
  private def hbPath(lock: Path, owner: String): Path =
    new Path(lock.getParent, s"${lock.getName}.hb.$owner")

  /** Best-effort sweep of every heartbeat sibling of `lock` (any
    * owner) — steal and legacy-cleanup paths. */
  private def deleteHbSiblings(fs: FileSystem, lock: Path): Unit =
    try fs.listStatus(lock.getParent).foreach { st =>
      if (st.getPath.getName.startsWith(s"${lock.getName}.hb"))
        try fs.delete(st.getPath, false)
        catch { case _: java.io.IOException => () }
    } catch { case _: java.io.IOException => () }

  private def readContent(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Is the holder provably alive? Either the lock file itself is
    * young, or the heartbeat sibling NAMED BY the lock's current owner
    * exists and is young. The heartbeat lives in a sibling file rather
    * than as a lock rewrite/setTimes because a rewrite from a zombie
    * whose lock was stolen mid-beat would clobber the successor's lock
    * — two writers both believing they hold it (ADVICE r15 #4) — and
    * the owner keys the FILENAME, not just the content (ADVICE r16 #1):
    * with one shared hb file a zombie's in-flight beat could overwrite
    * the successor's fresh evidence, making a LIVE holder stealable for
    * up to a beat interval. The file holderAlive consults is chosen by
    * the lock's own content, so only the true holder can refresh it. */
  private def holderAlive(fs: FileSystem, lock: Path, leaseMs: Long): Boolean = {
    val lockAge = ageMs(fs, lock)
    if (lockAge >= 0 && lockAge <= leaseMs) return true
    readContent(fs, lock).exists { o =>
      val owner = o.trim
      owner.nonEmpty && {
        val hbAge = ageMs(fs, hbPath(lock, owner))
        hbAge >= 0 && hbAge <= leaseMs
      }
    }
  }

  private def tryStealStale(fs: FileSystem, lock: Path, leaseMs: Long): Unit =
    if (leaseMs > 0 && !holderAlive(fs, lock, leaseMs)) {
      val tomb = new Path(lock.getParent,
        s"${lock.getName}.stale.${java.util.UUID.randomUUID().toString.take(8)}")
      val won = try fs.rename(lock, tomb)
      catch { case _: java.io.IOException => false }
      if (won) { fs.delete(tomb, false); deleteHbSiblings(fs, lock) }
    }

  /** Run `f` holding the lease lock at `lock`: spin (100 ms) up to
    * `timeoutMs`, stealing stale locks along the way, then fail loudly
    * with the lock's age (`what` prefixes the message with the
    * caller's context). Only exists-contention reads as "lock held":
    * genuine I/O errors propagate instead of masquerading as a busy
    * writer for the whole timeout. */
  def withLock[T](fs: FileSystem, lock: Path, timeoutMs: Long,
                  leaseMs: Long, what: String)(f: => T): T = {
    fs.mkdirs(lock.getParent)
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!tryLock(fs, lock)) {
      tryStealStale(fs, lock, leaseMs)
      if (System.currentTimeMillis() > deadline) {
        throw new IllegalStateException(
          s"graft: $what $lock not acquired in ${timeoutMs} ms" +
            s" (lock age ${ageMs(fs, lock) / 1000} s). A live writer is" +
            s" heartbeating it (stale locks self-steal after ${leaseMs} ms)" +
            " — raise the lock timeout or wait.")
      }
      Thread.sleep(100)
    }
    // stamp ownership for the owner-checked release. A FAILED stamp
    // must propagate (ADVICE r15 #4): swallowing it left an empty lock
    // whose holder's own heartbeat saw held != owner and stopped —
    // making a LIVE writer stealable mid-write. Back out the unowned
    // lock (best-effort) so waiters don't spin on wreckage.
    val owner = java.util.UUID.randomUUID().toString
    try {
      val out = fs.create(lock, true)
      out.write(owner.getBytes("UTF-8")); out.close()
    } catch { case e: java.io.IOException =>
      try fs.delete(lock, false)
      catch { case _: java.io.IOException => () }
      throw new IllegalStateException(
        s"graft: $what could not stamp ownership into $lock — " +
          "an unstamped lock cannot be heartbeated and would be " +
          "stolen from a live writer", e)
    }
    // each beat VERIFIES ownership first: a zombie holder whose lock
    // was stolen must stop beating. The beat itself writes the
    // owner-keyed SIBLING file (see [[holderAlive]]) — never the lock:
    // setTimes/rewrite variants could clobber a successor's lock from
    // a zombie (ADVICE r15 #4), and the sibling write is inert after a
    // steal because its owner no longer matches the lock's. ANY
    // non-fatal error (e.g. an UnsupportedOperationException from a
    // FileSystem shim — NOT just IOException) must never kill the
    // thread silently, or the lease silently disables and a LIVE
    // writer gets stolen from.
    val beat = new Thread(() => {
      try {
        var live = true
        while (live && !Thread.interrupted()) {
          Thread.sleep(math.max(200L, leaseMs / 4))
          try {
            if (!readContent(fs, lock).contains(owner)) live = false // stolen: stop quietly
            else {
              // owner-keyed FILENAME: even when this check races a
              // steal (TOCTOU), the write lands in OUR hb file, which
              // the successor's lock content no longer names — inert
              val out = fs.create(hbPath(lock, owner), true)
              out.write(owner.getBytes("UTF-8")); out.close()
            }
          } catch { case scala.util.control.NonFatal(_) => () } // transient: retry next beat
        }
      } catch { case _: InterruptedException => () }
    }, s"graft-lock-heartbeat-${lock.getParent}")
    beat.setDaemon(true)
    if (leaseMs > 0) beat.start()
    try f finally {
      beat.interrupt()
      // JOIN, not just interrupt: a beat mid-write when `f` finishes
      // would otherwise land its hb AFTER the release's cleanup —
      // leaving a stray owner-keyed hb next to a future holder's lock
      // (harmless to correctness — its owner can never match a newer
      // lock — but a dangling file and a test-visible race). Bounded:
      // a beat wedged in pathological IO past 2 s is abandoned, and
      // its eventual write is the harmless stray above.
      try beat.join(2000) catch { case _: InterruptedException => () }
      // release states: MINE -> delete; GONE (f itself wiped the root —
      // clear() — or a force reset) -> nothing to do, NOT a steal;
      // THEIRS -> a stealer took it past our lease: leave the
      // successor's lock alone and say so loudly
      val state = try {
        if (!fs.exists(lock)) "gone"
        else if (readContent(fs, lock).contains(owner)) "mine" else "theirs"
      } catch { case _: java.io.IOException => "theirs" }
      if (state == "mine") {
        fs.delete(lock, false)
        try fs.delete(hbPath(lock, owner), false)
        catch { case _: java.io.IOException => () }
      }
      else if (state == "theirs") System.err.println(
        s"graft: $what $lock no longer owned at release — this writer" +
          " exceeded its lease and the lock was stolen; its work raced" +
          " the successor's (single-writer contract: size the lease" +
          " above worst-case JVM pauses)")
    }
  }
}
