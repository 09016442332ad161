// Native reader for the `images.bin` acquisition stream format.
//
// Format contract (defined by an external C++ acquisition program; spec
// quoted in the reference at tools/ms_opencv_process.py:1-29): a raw
// concatenation of frames, each
//     int32 rows | int32 cols | int32 cv_type | rows*cols*elemSize() bytes
// with cv_type an OpenCV Mat type: depth = type & 7, channels = (type >> 3) + 1.
//
// This library scans a stream in one pass and bulk-decodes frames into a
// caller-provided uint8 grayscale batch buffer — the host-side feeding path
// for the TPU classical pipeline (a ~17k-frame stream decodes without any
// per-frame Python overhead).
//
// Build: g++ -O3 -shared -fPIC -o libimages_bin.so images_bin.cc

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

typedef struct {
  int64_t data_offset;  // byte offset of pixel data
  int32_t rows;
  int32_t cols;
  int32_t cv_type;
} IbinFrame;

static const int kBytesPerDepth[8] = {1, 1, 2, 2, 4, 4, 8, 0};

static int64_t elem_size(int32_t cv_type) {
  int depth = cv_type & 7;
  int channels = (cv_type >> 3) + 1;
  int b = kBytesPerDepth[depth];
  if (b == 0 || channels < 1 || channels > 4) return -1;
  return (int64_t)b * channels;
}

// Scan the stream. Fills `out` (if non-null) with up to `max_frames`
// entries. Returns the total number of frames, or a negative error code
// (-1 open failure, -2 corrupt header/truncated frame).
int64_t ibin_scan(const char* path, IbinFrame* out, int64_t max_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, 0, SEEK_END) != 0) { fclose(f); return -1; }
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  int64_t count = 0;
  for (;;) {
    int32_t hdr[3];
    size_t got = fread(hdr, sizeof(int32_t), 3, f);
    if (got == 0) break;  // clean EOF
    if (got != 3) { fclose(f); return -2; }
    int64_t es = elem_size(hdr[2]);
    if (es < 0 || hdr[0] <= 0 || hdr[1] <= 0 || hdr[0] > 1 << 20 || hdr[1] > 1 << 20) {
      fclose(f);
      return -2;
    }
    int64_t data_bytes = (int64_t)hdr[0] * hdr[1] * es;
    long pos = ftell(f);
    if (out && count < max_frames) {
      out[count].data_offset = pos;
      out[count].rows = hdr[0];
      out[count].cols = hdr[1];
      out[count].cv_type = hdr[2];
    }
    // fseek happily passes EOF on regular files: bound against file size
    if (pos + data_bytes > fsize) { fclose(f); return -2; }
    if (fseek(f, (long)data_bytes, SEEK_CUR) != 0) { fclose(f); return -2; }
    count++;
  }
  fclose(f);
  return count;
}

// Decode `n` frames (described by `frames`) into `dst`, a contiguous
// (n, rows, cols) uint8 grayscale buffer. All frames must share rows/cols.
// Channels are averaged; 16-bit depths are right-shifted to 8 bits; float
// depths are clamped to [0, 255]. Returns 0 on success, negative on error.
int32_t ibin_read_gray8(const char* path, const IbinFrame* frames, int64_t n,
                        uint8_t* dst, int64_t rows, int64_t cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t frame_px = rows * cols;
  // temp buffer for the widest supported frame
  int64_t max_bytes = frame_px * 8 * 4;
  char* tmp = new char[max_bytes];
  for (int64_t i = 0; i < n; i++) {
    const IbinFrame& fr = frames[i];
    if (fr.rows != rows || fr.cols != cols) { delete[] tmp; fclose(f); return -3; }
    int depth = fr.cv_type & 7;
    int channels = (fr.cv_type >> 3) + 1;
    int64_t es = elem_size(fr.cv_type);
    // es < 0 means an unknown cv_type from a caller-supplied frame: reject
    // here rather than let `bytes` go negative past the size guard.
    int64_t bytes = frame_px * es;
    if (es < 0 || bytes > max_bytes) { delete[] tmp; fclose(f); return -4; }
    if (fseek(f, (long)fr.data_offset, SEEK_SET) != 0 ||
        fread(tmp, 1, (size_t)bytes, f) != (size_t)bytes) {
      delete[] tmp;
      fclose(f);
      return -2;
    }
    uint8_t* out = dst + i * frame_px;
    for (int64_t p = 0; p < frame_px; p++) {
      double acc = 0.0;
      for (int c = 0; c < channels; c++) {
        int64_t idx = p * channels + c;
        double v = 0.0;
        switch (depth) {
          case 0: v = ((uint8_t*)tmp)[idx]; break;                    // CV_8U
          case 1: v = ((int8_t*)tmp)[idx]; break;                     // CV_8S
          case 2: v = ((uint16_t*)tmp)[idx] / 257.0; break;           // CV_16U
          case 3: v = ((int16_t*)tmp)[idx] < 0 ? 0.0                  // CV_16S
                      : ((int16_t*)tmp)[idx] / 128.0; break;
          case 4: v = (double)((int32_t*)tmp)[idx]; break;            // CV_32S
          case 5: v = ((float*)tmp)[idx]; break;                      // CV_32F
          case 6: v = ((double*)tmp)[idx]; break;                     // CV_64F
        }
        acc += v;
      }
      acc /= channels;
      if (acc < 0.0) acc = 0.0;
      if (acc > 255.0) acc = 255.0;
      out[p] = (uint8_t)(acc + 0.5);
    }
  }
  delete[] tmp;
  fclose(f);
  return 0;
}

}  // extern "C"
