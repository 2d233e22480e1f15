/* raisr_tpu C ABI.
 *
 * Drop-in shaped like the reference's 5-function handler API
 * (reference: Library/RaisrHandler.h:15-48, Library/RaisrDefaults.h): a C
 * consumer (e.g. an FFmpeg filter) drives the TPU engine through these
 * entry points. The implementation (native/capi.cpp) embeds CPython and
 * dispatches into the raisr_tpu package.
 */
#ifndef RAISR_TPU_H_
#define RAISR_TPU_H_

#include <stddef.h>
#include <stdint.h>

/* Library version — the analogue of the reference's RaisrVersion.h
 * (RAISR_VERSION_MAJOR/MINOR, printed in the RNLInit banner at
 * Raisr.cpp:1418-1420). Must match raisr_tpu.__version__ (asserted by
 * tests/test_capi.py). */
#define RAISR_TPU_VERSION_MAJOR 1
#define RAISR_TPU_VERSION_MINOR 0
#define RAISR_TPU_VERSION_PATCH 0

#ifdef __cplusplus
extern "C" {
#endif

typedef enum {
  RTPU_OK = 0,
  RTPU_ERROR_BAD_PARAMETER = 1,
  RTPU_ERROR_OUT_OF_MEMORY = 2,
  RTPU_ERROR_UNDEFINED = 3,
} RTPUStatus;

typedef enum {
  RTPU_BLEND_RANDOMNESS = 1,
  RTPU_BLEND_COUNT_OF_BITS_CHANGED = 2,
} RTPUBlendingMode;

typedef enum {
  RTPU_RANGE_VIDEO = 0,
  RTPU_RANGE_FULL = 1,
} RTPURangeType;

/* Precision tier — the analogue of the reference ABI's ASMType parameter
 * (RNLHandler_Init asmType; its FFmpeg filter defaults to avx512fp16).
 * F32 matches the reference's AVX2/AVX512 quality; BF16 is the AVX512FP16
 * analogue, measured strictly closer to the reference's f32 output than
 * the reference's own FP16 tier (docs/PARITY.md). INT8 (8-bit content
 * only) runs the filter matmul as fixed-point hi/lo int8 pairs on the
 * MXU's double-rate int8 path — quality between BF16 and F32. */
typedef enum {
  RTPU_TIER_F32 = 0,
  RTPU_TIER_BF16 = 1,
  RTPU_TIER_INT8 = 2,
} RTPUTier;

/* One plane of 8-bit (uint8) or 10/16-bit (uint16 LE) samples. */
typedef struct {
  uint8_t* data;
  unsigned int width;
  unsigned int height;
  unsigned int step; /* row stride in bytes */
} RTPUPlane;

/* Initialize the engine (mirrors RNLHandler_Init).
 * model_path: filter folder (filters_2x/..., reference binary format)
 * ratio: 1.0 < ratio <= 4.0 (2.0 / 1.5 shipped)
 * bit_depth: 8 | 10 | 16
 * passes: 1 | 2 ; two_pass_mode: 1 | 2 */
RTPUStatus RTPU_Init(const char* model_path, float ratio,
                     unsigned int bit_depth, RTPURangeType range,
                     unsigned int passes, unsigned int two_pass_mode);

/* RTPU_Init with an explicit precision tier (RTPU_Init uses RTPU_TIER_F32). */
RTPUStatus RTPU_InitEx(const char* model_path, float ratio,
                       unsigned int bit_depth, RTPURangeType range,
                       unsigned int passes, unsigned int two_pass_mode,
                       RTPUTier tier);

/* Pin this process's engine to accelerator chip `device_index` (as
 * enumerated by the runtime). Call before RTPU_Init*. The analogue of the
 * reference's RNLHandler_SetOpenCLContext platform/device selection
 * (Library/RaisrHandler.h:42-46): on multi-chip hosts, run one process
 * per stream pinned to distinct chips — the reference's N-streams
 * throughput recipe. Returns RTPU_ERROR_BAD_PARAMETER for an out-of-range
 * index (checked at Init). */
RTPUStatus RTPU_SetDevice(int device_index);

/* Fix frame geometry (mirrors RNLHandler_SetRes; triggers compilation). */
RTPUStatus RTPU_SetRes(const RTPUPlane* in_y, const RTPUPlane* in_cb,
                       const RTPUPlane* in_cr, const RTPUPlane* out_y,
                       const RTPUPlane* out_cb, const RTPUPlane* out_cr);

/* Upscale one frame (mirrors RNLHandler_Process). Cb/Cr may be NULL for
 * luma-only processing.
 *
 * Thread safety: calls are safe from any thread but serialize internally
 * (the embedded interpreter's GIL). For stream-level parallelism use one
 * process per stream — the reference's own N-streams throughput recipe
 * (reference docs/performance.md:8) — or batch frames through the Python
 * engine's process_batch_y. */
RTPUStatus RTPU_Process(const RTPUPlane* in_y, const RTPUPlane* in_cb,
                        const RTPUPlane* in_cr, RTPUPlane* out_y,
                        RTPUPlane* out_cb, RTPUPlane* out_cr,
                        RTPUBlendingMode blending);

/* Release the engine (mirrors RNLHandler_Deinit). */
RTPUStatus RTPU_Deinit(void);

/* Version string "MAJOR.MINOR.PATCH" (static storage; callable before
 * Init). */
const char* RTPU_Version(void);

#ifdef __cplusplus
}
#endif

#endif /* RAISR_TPU_H_ */
