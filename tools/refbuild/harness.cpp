/* Harness driving the reference RAISR library (compiled unmodified from
 * /root/reference/Library with the IPP shim in this directory) over raw
 * planar YUV420 input, for ground-truth parity testing of raisr_tpu.
 *
 * Usage:
 *   ref_harness <modelPath> <ratio> <bits> <range 1|2> <threads> <asm 1|2>
 *               <passes> <twoPassMode> <blending 1|2> <inW> <inH>
 *               <in.yuv> <out.yuv> [nframes=1]
 *
 * Input/output are packed planar YUV420 frames (8-bit: 1 byte/sample,
 * 10/16-bit: 2 bytes little-endian). Output geometry = input * ratio.
 *
 * Reference call sequence mirrors ffmpeg/vf_raisr.c:226-333
 * (RNLHandler_Init once, SetRes on first frame, Process per frame).
 */

#include <unistd.h>

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <new>
#include <vector>

#include "RaisrHandler.h"

/* The reference frees 64-byte-aligned new[] buffers (Raisr.cpp:1795) with a
 * plain delete[] (RNLDeinit, Raisr.cpp:1867) - a new-delete-type mismatch
 * that aborts at Deinit under glibc. Route every global allocation through
 * malloc/aligned_alloc so plain free() (which glibc defines for both) makes
 * the mismatch harmless, without modifying the reference source. */
void* operator new(size_t n) {
  void* p = malloc(n ? n : 1);
  if (!p) throw std::bad_alloc();
  return p;
}
void* operator new[](size_t n) { return ::operator new(n); }
void* operator new(size_t n, std::align_val_t a) {
  size_t al = (size_t)a;
  void* p = aligned_alloc(al, (n + al - 1) / al * al);
  if (!p) throw std::bad_alloc();
  return p;
}
void* operator new[](size_t n, std::align_val_t a) {
  return ::operator new(n, a);
}
void operator delete(void* p) noexcept { free(p); }
void operator delete[](void* p) noexcept { free(p); }
void operator delete(void* p, size_t) noexcept { free(p); }
void operator delete[](void* p, size_t) noexcept { free(p); }
void operator delete(void* p, std::align_val_t) noexcept { free(p); }
void operator delete[](void* p, std::align_val_t) noexcept { free(p); }
void operator delete(void* p, size_t, std::align_val_t) noexcept { free(p); }
void operator delete[](void* p, size_t, std::align_val_t) noexcept { free(p); }

static int plane_bytes(int w, int h, int bits) {
  return w * h * (bits > 8 ? 2 : 1);
}

int main(int argc, char** argv) {
  if (argc < 14) {
    fprintf(stderr,
            "usage: %s model ratio bits range threads asm passes twoPassMode "
            "blending inW inH in.yuv out.yuv [nframes]\n",
            argv[0]);
    return 2;
  }
  const char* model = argv[1];
  float ratio = (float)atof(argv[2]);
  int bits = atoi(argv[3]);
  int range = atoi(argv[4]);
  int threads = atoi(argv[5]);
  int asmType = atoi(argv[6]);
  int passes = atoi(argv[7]);
  int twoPassMode = atoi(argv[8]);
  int blending = atoi(argv[9]);
  int inW = atoi(argv[10]);
  int inH = atoi(argv[11]);
  const char* inPath = argv[12];
  const char* outPath = argv[13];
  int nframes = argc > 14 ? atoi(argv[14]) : 1;

  int outW = (int)(inW * ratio);
  int outH = (int)(inH * ratio);

  RNLERRORTYPE err = RNLHandler_Init(model, ratio, (unsigned)bits,
                                     (RangeType)range, (unsigned)threads,
                                     (ASMType)asmType, (unsigned)passes,
                                     (unsigned)twoPassMode);
  if (err != RNLErrorNone) {
    fprintf(stderr, "RNLHandler_Init failed: 0x%x\n", err);
    return 1;
  }

  FILE* fin = fopen(inPath, "rb");
  FILE* fout = fopen(outPath, "wb");
  if (!fin || !fout) {
    fprintf(stderr, "cannot open %s / %s\n", inPath, outPath);
    return 1;
  }

  const int bpp = bits > 8 ? 2 : 1;
  const int cW = inW / 2, cH = inH / 2;
  const int oCW = outW / 2, oCH = outH / 2;
  std::vector<unsigned char> inY(plane_bytes(inW, inH, bits)),
      inU(plane_bytes(cW, cH, bits)), inV(plane_bytes(cW, cH, bits)),
      outY(plane_bytes(outW, outH, bits)), outU(plane_bytes(oCW, oCH, bits)),
      outV(plane_bytes(oCW, oCH, bits));

  VideoDataType vIn[3], vOut[3];
  unsigned char* inP[3] = {inY.data(), inU.data(), inV.data()};
  unsigned char* outP[3] = {outY.data(), outU.data(), outV.data()};
  int iw[3] = {inW, cW, cW}, ih[3] = {inH, cH, cH};
  int ow[3] = {outW, oCW, oCW}, oh[3] = {outH, oCH, oCH};
  for (int p = 0; p < 3; ++p) {
    vIn[p] = {inP[p], (unsigned)iw[p], (unsigned)ih[p],
              (unsigned)(iw[p] * bpp), 0};
    vOut[p] = {outP[p], (unsigned)ow[p], (unsigned)oh[p],
               (unsigned)(ow[p] * bpp), 0};
  }

  for (int f = 0; f < nframes; ++f) {
    if (fread(inY.data(), 1, inY.size(), fin) != inY.size() ||
        fread(inU.data(), 1, inU.size(), fin) != inU.size() ||
        fread(inV.data(), 1, inV.size(), fin) != inV.size()) {
      fprintf(stderr, "short read at frame %d\n", f);
      return 1;
    }
    if (f == 0) {
      err = RNLHandler_SetRes(&vIn[0], &vIn[1], &vIn[2], &vOut[0], &vOut[1],
                              &vOut[2]);
      if (err != RNLErrorNone) {
        fprintf(stderr, "RNLHandler_SetRes failed: 0x%x\n", err);
        return 1;
      }
    }
    err = RNLHandler_Process(&vIn[0], &vIn[1], &vIn[2], &vOut[0], &vOut[1],
                             &vOut[2], (BlendingMode)blending);
    if (err != RNLErrorNone) {
      fprintf(stderr, "RNLHandler_Process failed: 0x%x\n", err);
      return 1;
    }
    fwrite(outY.data(), 1, outY.size(), fout);
    fwrite(outU.data(), 1, outU.size(), fout);
    fwrite(outV.data(), 1, outV.size(), fout);
  }
  fclose(fin);
  fclose(fout);
  RNLHandler_Deinit();
  fprintf(stderr, "ok: %d frame(s) %dx%d -> %dx%d\n", nframes, inW, inH, outW,
          outH);
  /* Raisr_globals.h:160-165 defines std::vector globals (non-static) in
   * every TU that includes it; with first-definition symbol merging each
   * TU's static destructor then destroys the same vector again (double
   * free at exit). Skip static destructors - everything is flushed. */
  fflush(nullptr);
  _exit(0);
}
