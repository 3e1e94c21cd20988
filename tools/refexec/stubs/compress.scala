// commons-compress stand-in: gzip delegates to java.util.zip; bzip2 throws.
package org.apache.commons.compress.compressors.gzip {
  class GzipCompressorInputStream(is: java.io.InputStream) extends java.util.zip.GZIPInputStream(is)
  class GzipCompressorOutputStream(os: java.io.OutputStream) extends java.util.zip.GZIPOutputStream(os)
}

package org.apache.commons.compress.compressors.bzip2 {
  class BZip2CompressorInputStream(is: java.io.InputStream) extends java.io.FilterInputStream(is) {
    throw new UnsupportedOperationException("bzip2 stub: unavailable offline")
  }
  class BZip2CompressorOutputStream(os: java.io.OutputStream) extends java.io.FilterOutputStream(os) {
    throw new UnsupportedOperationException("bzip2 stub: unavailable offline")
  }
}
