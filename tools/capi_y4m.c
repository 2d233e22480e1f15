/* Y4M transcoder over the raisr_tpu C ABI (include/raisr_tpu.h): the
 * frame-by-frame consumer an FFmpeg filter would be, runnable standalone.
 * Mirrors the reference filter's lifecycle (ffmpeg/vf_raisr.c:226-333):
 * Init once, SetRes on the first frame, Process per frame.
 *
 * Usage:
 *   capi_y4m in.y4m out.y4m model_path ratio bits range passes mode blending
 *
 * Supports C420 (8-bit) and C420p10 Y4M streams.
 *
 * Build: cc tools/capi_y4m.c -Iinclude -Lbuild/capi -lraisr_tpu -o capi_y4m
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "raisr_tpu.h"

static int read_line(FILE* f, char* buf, int n) {
  int i = 0, c;
  while (i < n - 1 && (c = fgetc(f)) != EOF && c != '\n') buf[i++] = (char)c;
  buf[i] = 0;
  return i;
}

int main(int argc, char** argv) {
  if (argc < 10) {
    fprintf(stderr,
            "usage: %s in.y4m out.y4m model ratio bits range passes mode "
            "blending\n",
            argv[0]);
    return 2;
  }
  const char* in_path = argv[1];
  const char* out_path = argv[2];
  const char* model = argv[3];
  float ratio = (float)atof(argv[4]);
  int bits = atoi(argv[5]);
  int range = atoi(argv[6]); /* 0 = video, 1 = full (RTPURangeType) */
  int passes = atoi(argv[7]);
  int mode = atoi(argv[8]);
  int blending = atoi(argv[9]);

  FILE* fin = fopen(in_path, "rb");
  if (!fin) {
    fprintf(stderr, "cannot open %s\n", in_path);
    return 1;
  }
  char header[512];
  read_line(fin, header, sizeof(header));
  if (strncmp(header, "YUV4MPEG2", 9)) {
    fprintf(stderr, "not a y4m file\n");
    return 1;
  }
  int w = 0, h = 0;
  char rate[64] = "F25:1";
  char interlace[16] = "Ip";
  char aspect[32] = "A1:1";
  for (char* tok = strtok(header + 9, " "); tok; tok = strtok(NULL, " ")) {
    if (tok[0] == 'W') w = atoi(tok + 1);
    if (tok[0] == 'H') h = atoi(tok + 1);
    if (tok[0] == 'F') snprintf(rate, sizeof(rate), "%s", tok);
    if (tok[0] == 'I') snprintf(interlace, sizeof(interlace), "%s", tok);
    if (tok[0] == 'A') snprintf(aspect, sizeof(aspect), "%s", tok);
    if (tok[0] == 'C') {
      if (!strncmp(tok, "C420p10", 7)) {
        if (bits != 10) fprintf(stderr, "note: C420p10 stream, bits=%d\n", bits);
      } else if (strncmp(tok, "C420", 4)) {
        fprintf(stderr, "only C420/C420p10 supported, got %s\n", tok);
        return 1;
      }
    }
  }
  if (w <= 0 || h <= 0) {
    fprintf(stderr, "bad y4m geometry\n");
    return 1;
  }
  int ow = (int)(w * ratio), oh = (int)(h * ratio);
  int bpp = bits > 8 ? 2 : 1;

  if (RTPU_Init(model, ratio, (unsigned)bits, (RTPURangeType)range,
                (unsigned)passes, (unsigned)mode) != RTPU_OK) {
    fprintf(stderr, "RTPU_Init failed\n");
    return 1;
  }

  FILE* fout = fopen(out_path, "wb");
  /* tags match raisr_tpu.video's writer so outputs are byte-comparable */
  fprintf(fout, "YUV4MPEG2 W%d H%d %s %s %s %s\n", ow, oh, rate, interlace,
          aspect, bits > 8 ? "C420p10" : "C420jpeg");

  size_t ysz = (size_t)w * h * bpp, csz = (size_t)(w / 2) * (h / 2) * bpp;
  size_t oysz = (size_t)ow * oh * bpp, ocsz = (size_t)(ow / 2) * (oh / 2) * bpp;
  unsigned char* iy = malloc(ysz);
  unsigned char* iu = malloc(csz);
  unsigned char* iv = malloc(csz);
  unsigned char* oy = malloc(oysz);
  unsigned char* ou = malloc(ocsz);
  unsigned char* ov = malloc(ocsz);

  RTPUPlane pin[3] = {
      {iy, (unsigned)w, (unsigned)h, (unsigned)(w * bpp)},
      {iu, (unsigned)(w / 2), (unsigned)(h / 2), (unsigned)(w / 2 * bpp)},
      {iv, (unsigned)(w / 2), (unsigned)(h / 2), (unsigned)(w / 2 * bpp)},
  };
  RTPUPlane pout[3] = {
      {oy, (unsigned)ow, (unsigned)oh, (unsigned)(ow * bpp)},
      {ou, (unsigned)(ow / 2), (unsigned)(oh / 2), (unsigned)(ow / 2 * bpp)},
      {ov, (unsigned)(ow / 2), (unsigned)(oh / 2), (unsigned)(ow / 2 * bpp)},
  };

  char fh[256];
  int nframes = 0;
  while (read_line(fin, fh, sizeof(fh)) > 0) {
    if (strncmp(fh, "FRAME", 5)) break;
    if (fread(iy, 1, ysz, fin) != ysz || fread(iu, 1, csz, fin) != csz ||
        fread(iv, 1, csz, fin) != csz) {
      fprintf(stderr, "short frame %d\n", nframes);
      break;
    }
    if (nframes == 0 &&
        RTPU_SetRes(&pin[0], &pin[1], &pin[2], &pout[0], &pout[1], &pout[2]) !=
            RTPU_OK) {
      fprintf(stderr, "RTPU_SetRes failed\n");
      return 1;
    }
    if (RTPU_Process(&pin[0], &pin[1], &pin[2], &pout[0], &pout[1], &pout[2],
                     (RTPUBlendingMode)blending) != RTPU_OK) {
      fprintf(stderr, "RTPU_Process failed at frame %d\n", nframes);
      return 1;
    }
    fputs("FRAME\n", fout);
    fwrite(oy, 1, oysz, fout);
    fwrite(ou, 1, ocsz, fout);
    fwrite(ov, 1, ocsz, fout);
    nframes++;
  }
  fclose(fin);
  fclose(fout);
  RTPU_Deinit();
  fprintf(stderr, "capi_y4m: %d frame(s) %dx%d -> %dx%d\n", nframes, w, h, ow,
          oh);
  return nframes > 0 ? 0 : 1;
}
