package graft.operators

/** Round-tripping file names captured via `input_file_name()` back into
  * `spark.read.parquet(...)`.
  *
  * `input_file_name()` reports the file's URI form — spaces become
  * `%20`, and other reserved characters arrive percent-escaped — while
  * `DataFrameReader.parquet` treats every argument as a GLOB pattern,
  * where `%`-escapes fail to match the on-disk name and metacharacters
  * (`[`, `{`, `*`, `?`) match the wrong files entirely. Every file-level
  * index that lists files from scan output and re-reads the survivors
  * ([[BloomIndex]], [[ZoneMap]]) funnels through [[readablePath]] so the
  * round-trip is exact for any file name. */
private[graft] object FileListing {

  /** URI-decode `fileUri` (keeping scheme and authority — an HDFS/S3
    * URI's host must survive) and backslash-escape glob metacharacters
    * so the reader lists exactly this file. */
  def readablePath(fileUri: String): String = {
    val decoded =
      try new org.apache.hadoop.fs.Path(new java.net.URI(fileUri)).toString
      catch {
        // not URI-shaped (already a plain path): use as-is
        case _: java.net.URISyntaxException => fileUri
        case _: IllegalArgumentException => fileUri
      }
    decoded.replaceAll("([{}\\[\\]*?\\\\])", "\\\\$1")
  }
}
