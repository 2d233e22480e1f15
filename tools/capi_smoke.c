/* C ABI smoke test: upscale a tiny generated frame through libraisr_tpu.so.
 * Built and run by tools/build_capi.sh. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "raisr_tpu.h"

int main(int argc, char** argv) {
  const char* model = argc > 1 ? argv[1] : "/root/reference/filters_2x/filters_lowres";
  unsigned w = 32, h = 24, ow = 64, oh = 48;

  RTPUStatus st = RTPU_Init(model, 2.0f, 8, RTPU_RANGE_VIDEO, 1, 1);
  if (st != RTPU_OK) {
    fprintf(stderr, "Init failed: %d\n", st);
    return 1;
  }

  uint8_t* in_y = (uint8_t*)malloc(w * h);
  uint8_t* out_y = (uint8_t*)calloc(ow * oh, 1);
  for (unsigned i = 0; i < w * h; ++i) in_y[i] = (uint8_t)(16 + (i * 7) % 200);

  RTPUPlane inp = {in_y, w, h, w};
  RTPUPlane outp = {out_y, ow, oh, ow};
  st = RTPU_SetRes(&inp, NULL, NULL, &outp, NULL, NULL);
  if (st != RTPU_OK) return 2;
  st = RTPU_Process(&inp, NULL, NULL, &outp, NULL, NULL,
                    RTPU_BLEND_COUNT_OF_BITS_CHANGED);
  if (st != RTPU_OK) {
    fprintf(stderr, "Process failed: %d\n", st);
    return 3;
  }

  /* output must be non-trivial and in video range where processed */
  unsigned long sum = 0;
  for (unsigned i = 0; i < ow * oh; ++i) sum += out_y[i];
  if (sum == 0) {
    fprintf(stderr, "output is all zeros\n");
    return 4;
  }
  RTPU_Deinit();
  printf("capi smoke ok (output sum %lu)\n", sum);
  return 0;
}
