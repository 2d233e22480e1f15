/* Minimal Intel IPP shim, just enough to compile and run the reference
 * library (/root/reference/Library) on a host without IPP installed.
 *
 * The reference uses IPP for exactly two things (Raisr.cpp:435-503 resize
 * init, :950-957 + :1374-1388 bilinear resize, :985-991 int->float
 * conversion):
 *   - ippiResizeLinear_{8u,16u}_C1R with ippBorderRepl (cheap upscale)
 *   - ippiConvert_{8u32f,16u32f}_C1R
 * plus ippsMalloc_8u/ippsFree.
 *
 * This shim implements the standard pixel-center bilinear mapping
 *     src = (dst + 0.5) * (in/out) - 0.5, clamped (border replicate),
 * with round-half-up to the integer output, which is the documented
 * behaviour of IPP's linear resizer. CAVEAT (documented in
 * docs/PARITY.md): real IPP computes 8u/16u linear resize in fixed point,
 * so individual pixels may differ by 1 LSB on exact rounding boundaries
 * versus genuine IPP output. Everything else in a reference build using
 * this shim (hashing, filters, CT blending, zones, two-pass) is the
 * reference's own code, compiled unmodified.
 *
 * Original work for the raisr_tpu project; no IPP code consulted or used.
 */

#pragma once

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

typedef uint8_t Ipp8u;
typedef uint16_t Ipp16u;
typedef int16_t Ipp16s;
typedef int32_t Ipp32s;
typedef uint32_t Ipp32u;
typedef float Ipp32f;
typedef double Ipp64f;

typedef enum {
  ippStsNoMemErr = -4,
  ippStsErr = -2,
  ippStsNoErr = 0,
} IppStatus;

typedef struct {
  int width;
  int height;
} IppiSize;

typedef struct {
  int x;
  int y;
} IppiPoint;

typedef enum {
  ippBorderRepl = 1,
} IppiBorderType;

typedef enum {
  ippNearest = 1,
  ippLinear = 2,
  ippCubic = 6,
  ippLanczos = 16,
} IppiInterpolationType;

/* Opaque in real IPP; here it just records the geometry. */
typedef struct {
  IppiSize srcSize;
  IppiSize dstSize;
} IppiResizeSpec_32f;

static inline Ipp8u* ippsMalloc_8u(int len) {
  if (len <= 0) len = 1;
  return (Ipp8u*)aligned_alloc(64, (size_t)((len + 63) / 64) * 64);
}

static inline void ippsFree(void* ptr) { free(ptr); }

static inline IppStatus ippiResizeGetSize_8u(IppiSize srcSize,
                                             IppiSize dstSize,
                                             IppiInterpolationType interp,
                                             Ipp32u antialiasing,
                                             int* pSpecSize, int* pInitSize) {
  (void)srcSize;
  (void)dstSize;
  (void)antialiasing;
  if (interp != ippLinear) return ippStsErr; /* shim: linear only */
  *pSpecSize = (int)sizeof(IppiResizeSpec_32f);
  *pInitSize = 64;
  return ippStsNoErr;
}

static inline IppStatus ippiResizeLinearInit_8u(IppiSize srcSize,
                                                IppiSize dstSize,
                                                IppiResizeSpec_32f* pSpec) {
  pSpec->srcSize = srcSize;
  pSpec->dstSize = dstSize;
  return ippStsNoErr;
}

static inline IppStatus ippiResizeLinearInit_16u(IppiSize srcSize,
                                                 IppiSize dstSize,
                                                 IppiResizeSpec_32f* pSpec) {
  return ippiResizeLinearInit_8u(srcSize, dstSize, pSpec);
}

static inline IppStatus ippiResizeGetBufferSize_8u(
    const IppiResizeSpec_32f* pSpec, IppiSize dstSize, Ipp32u numChannels,
    int* pBufSize) {
  (void)pSpec;
  (void)dstSize;
  (void)numChannels;
  *pBufSize = 64;
  return ippStsNoErr;
}

/* One axis of the pixel-center mapping. idx0/idx1 are the two source taps
 * (clamped = border replicate) and frac the lerp weight of idx1. */
static inline void ipp_shim_axis(int in_size, int out_size, int dst,
                                 int* idx0, int* idx1, float* frac) {
  double src = (dst + 0.5) * ((double)in_size / out_size) - 0.5;
  if (src < 0.0) src = 0.0;
  if (src > in_size - 1) src = in_size - 1;
  int i0 = (int)src;
  if (i0 > in_size - 1) i0 = in_size - 1;
  int i1 = i0 + 1 < in_size ? i0 + 1 : in_size - 1;
  *idx0 = i0;
  *idx1 = i1;
  *frac = (float)(src - i0);
}

#define IPP_SHIM_RESIZE_BODY(T, MAXV)                                       \
  do {                                                                      \
    if (border != ippBorderRepl || !pSpec) return ippStsErr;                \
    (void)pBorderValue;                                                     \
    (void)pBuffer;                                                          \
    const int inW = pSpec->srcSize.width, inH = pSpec->srcSize.height;      \
    const int srcStrideT = srcStep / (int)sizeof(T);                        \
    const int dstStrideT = dstStep / (int)sizeof(T);                        \
    for (int y = 0; y < dstRoiSize.height; ++y) {                           \
      int r0, r1;                                                           \
      float rf;                                                             \
      ipp_shim_axis(inH, pSpec->dstSize.height, dstOffset.y + y, &r0, &r1,  \
                    &rf);                                                   \
      const T* row0 = pSrc + (size_t)r0 * srcStrideT;                       \
      const T* row1 = pSrc + (size_t)r1 * srcStrideT;                       \
      T* out = pDst + (size_t)y * dstStrideT;                               \
      for (int x = 0; x < dstRoiSize.width; ++x) {                          \
        int c0, c1;                                                         \
        float cf;                                                           \
        ipp_shim_axis(inW, pSpec->dstSize.width, dstOffset.x + x, &c0, &c1, \
                      &cf);                                                 \
        float a = (float)row0[c0] + ((float)row0[c1] - (float)row0[c0]) * cf; \
        float b = (float)row1[c0] + ((float)row1[c1] - (float)row1[c0]) * cf; \
        float v = a + (b - a) * rf;                                         \
        long q = (long)(v + 0.5f);                                          \
        if (q < 0) q = 0;                                                   \
        if (q > (MAXV)) q = (MAXV);                                         \
        out[x] = (T)q;                                                      \
      }                                                                     \
    }                                                                       \
    return ippStsNoErr;                                                     \
  } while (0)

static inline IppStatus ippiResizeLinear_8u_C1R(
    const Ipp8u* pSrc, Ipp32s srcStep, Ipp8u* pDst, Ipp32s dstStep,
    IppiPoint dstOffset, IppiSize dstRoiSize, IppiBorderType border,
    const Ipp8u* pBorderValue, const IppiResizeSpec_32f* pSpec,
    Ipp8u* pBuffer) {
  IPP_SHIM_RESIZE_BODY(Ipp8u, 255);
}

static inline IppStatus ippiResizeLinear_16u_C1R(
    const Ipp16u* pSrc, Ipp32s srcStep, Ipp16u* pDst, Ipp32s dstStep,
    IppiPoint dstOffset, IppiSize dstRoiSize, IppiBorderType border,
    const Ipp16u* pBorderValue, const IppiResizeSpec_32f* pSpec,
    Ipp8u* pBuffer) {
  IPP_SHIM_RESIZE_BODY(Ipp16u, 65535);
}

static inline IppStatus ippiConvert_8u32f_C1R(const Ipp8u* pSrc, int srcStep,
                                              Ipp32f* pDst, int dstStep,
                                              IppiSize roiSize) {
  for (int y = 0; y < roiSize.height; ++y) {
    const Ipp8u* s = pSrc + (size_t)y * srcStep;
    Ipp32f* d = (Ipp32f*)((Ipp8u*)pDst + (size_t)y * dstStep);
    for (int x = 0; x < roiSize.width; ++x) d[x] = (Ipp32f)s[x];
  }
  return ippStsNoErr;
}

static inline IppStatus ippiConvert_16u32f_C1R(const Ipp16u* pSrc, int srcStep,
                                               Ipp32f* pDst, int dstStep,
                                               IppiSize roiSize) {
  for (int y = 0; y < roiSize.height; ++y) {
    const Ipp16u* s = (const Ipp16u*)((const Ipp8u*)pSrc + (size_t)y * srcStep);
    Ipp32f* d = (Ipp32f*)((Ipp8u*)pDst + (size_t)y * dstStep);
    for (int x = 0; x < roiSize.width; ++x) d[x] = (Ipp32f)s[x];
  }
  return ippStsNoErr;
}
