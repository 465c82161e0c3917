package graft.core

/** The tool's own log stream, mirroring the reference's `--logfile` setup
  * (`/root/reference/dbsink/listen.py:47-57`): when a logfile is configured,
  * the CLI's log lines go to that file (appending, parents created);
  * otherwise they go to stdout. This covers graft's own lines only — Spark's
  * log4j stays on its own configuration, just as the reference's logfile
  * captures the dbsink logger, not the kafka client's. */
object Log {
  @volatile private var out: Option[java.io.PrintWriter] = None

  def init(logfile: String): Unit = synchronized {
    close()
    if (logfile.nonEmpty) {
      val f = new java.io.File(logfile)
      Option(f.getParentFile).foreach(_.mkdirs())
      out = Some(new java.io.PrintWriter(new java.io.FileWriter(f, true), true))
    }
  }

  def info(msg: String): Unit = synchronized {
    val line = s"${java.time.Instant.now()} INFO graft - $msg"
    out match {
      case Some(w) => w.println(line)
      case None    => println(line)
    }
  }

  def close(): Unit = synchronized {
    out.foreach(_.close())
    out = None
  }
}
