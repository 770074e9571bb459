// Native COCO-style RLE codec (column-major runs, leading zero run) —
// the serialization hot loop of BOP eval (hundreds of masks per frame).
// Semantics match sam6d_tpu/utils/rle.py.

#include <cstdint>

extern "C" {

// mask: (H,W) row-major uint8. counts: caller buffer of H*W+1 uint32.
// Returns the number of counts written (runs in column-major order,
// starting with the zero run).
int sam6d_rle_encode(const uint8_t* mask, int H, int W, uint32_t* counts) {
  int nc = 0;
  uint8_t cur = 0;
  uint32_t run = 0;
  for (long j = 0; j < W; ++j) {
    for (long i = 0; i < H; ++i) {
      const uint8_t v = mask[i * W + j] ? 1 : 0;
      if (v == cur) {
        ++run;
      } else {
        counts[nc++] = run;
        cur = v;
        run = 1;
      }
    }
  }
  counts[nc++] = run;
  return nc;
}

// counts: n column-major runs. mask: (H,W) row-major uint8, zeroed by
// the caller; foreground pixels are set to 1.
void sam6d_rle_decode(const uint32_t* counts, int n, int H, int W,
                      uint8_t* mask) {
  long pos = 0;
  uint8_t val = 0;
  const long total = (long)H * W;
  for (int c = 0; c < n; ++c) {
    if (val) {
      for (uint32_t k = 0; k < counts[c] && pos < total; ++k, ++pos) {
        mask[(pos % H) * W + (pos / H)] = 1;
      }
    } else {
      pos += counts[c];
    }
    val = !val;
  }
}

}  // extern "C"
