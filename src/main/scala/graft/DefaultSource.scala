package graft

/** `format("graft")` / `USING graft` resolution WITHOUT a packaged
  * service registry: Spark's provider lookup falls back to
  * `<name>.DefaultSource`, so this alias makes the short name work even
  * on a bare class-dir classpath (scripts/run.sh) where
  * `META-INF/services` may not ride along. The service file is also
  * shipped for the packaged path. */
class DefaultSource extends graft.sources.GraftDataSource
