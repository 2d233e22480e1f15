/*
 * RAISR-TPU video super-resolution filter for FFmpeg.
 *
 * Drives the raisr_tpu engine through its C ABI (include/raisr_tpu.h,
 * libraisr_tpu.so) — the TPU-native counterpart of the reference's
 * vf_raisr filter (same option surface and lifecycle: options ->
 * RTPU_Init at filter init; SetRes on the first frame; Process per frame;
 * see the reference ffmpeg/vf_raisr.c:81-94, 226-333 for the contract
 * this mirrors).
 *
 * Build (FFmpeg n6.x tree, after applying
 * ffmpeg/0001-add-raisr-tpu-filter.patch):
 *   ./configure --enable-libraisr_tpu \
 *       --extra-cflags=-I<repo>/include \
 *       --extra-ldflags="-L<repo>/build/capi -lraisr_tpu"
 *
 * Usage:
 *   ffmpeg -i in.mp4 -vf "raisr_tpu=ratio=2:passes=2:filterfolder=filters_2x/filters_highres" out.mp4
 *
 * Validation: (1) type-checked under gcc -Wall -Werror against the REAL
 * libavutil headers via ffmpeg/compile_check.sh (libavfilter surface
 * shimmed, see compile_shim/; wired as tests/test_capi.py::
 * test_ffmpeg_filter_compiles_against_avutil); (2) EXECUTED locally via
 * the functional shim harness (ffmpeg/shim_harness.c): real av_opt option
 * parsing, init/config_props/filter_frame on genuine padded AVFrames,
 * output byte-identical to the Python CLI (tests/test_capi.py::
 * test_ffmpeg_filter_executes_via_shim_harness); (3) built against a
 * genuine FFmpeg n6.1.1 tree in CI (build_ffmpeg_ci.sh) with registration
 * + transcode-parity checks; (4) the same frame loop is exercised
 * end-to-end by tools/capi_y4m.c, tested bit-identical to the Python CLI.
 */

#include <limits.h>
#include <stdio.h>
#include <string.h>

#include "libavutil/avassert.h"
#include "libavutil/imgutils.h"
#include "libavutil/opt.h"
#include "libavutil/pixdesc.h"
#include "avfilter.h"
#include "formats.h"
/* n6.x keeps ff_filter_frame / FILTER_* macros in internal.h; from 7.1 they
 * moved to filters.h. Support both trees. */
#if __has_include("internal.h")
#include "internal.h"
#else
#include "filters.h"
#endif
#include "video.h"

#include "raisr_tpu.h"

typedef struct RaisrTpuContext {
    const AVClass *class;
    float ratio;
    int bits;
    char *range;
    char *filterfolder;
    int blending;
    int passes;
    int mode;
    int evenoutput;
    char *tier;
    char *asm_compat;
    int threadcount;
    int platform;
    int device;
    int framecount;
    int nb_planes;
} RaisrTpuContext;

#define OFFSET(x) offsetof(RaisrTpuContext, x)
#define FLAGS (AV_OPT_FLAG_FILTERING_PARAM | AV_OPT_FLAG_VIDEO_PARAM)

static const AVOption raisr_tpu_options[] = {
    { "ratio", "upscale ratio", OFFSET(ratio), AV_OPT_TYPE_FLOAT,
      { .dbl = 2.0 }, 1.0, 4.0, FLAGS },
    { "bits", "bit depth (8|10|16)", OFFSET(bits), AV_OPT_TYPE_INT,
      { .i64 = 8 }, 8, 16, FLAGS },
    /* string-valued like vf_raisr's range option (vf_raisr.c:84) so
     * reference command lines drop in; "1"/"2" also accepted for users of
     * this filter's earlier integer surface */
    { "range", "input color range (video|full)", OFFSET(range),
      AV_OPT_TYPE_STRING, { .str = "video" }, 0, 0, FLAGS },
    { "filterfolder", "trained filter-bank folder", OFFSET(filterfolder),
      AV_OPT_TYPE_STRING, { .str = "filters_2x/filters_lowres" }, 0, 0, FLAGS },
    { "blending", "1=Randomness 2=CountOfBitsChanged", OFFSET(blending),
      AV_OPT_TYPE_INT, { .i64 = 2 }, 1, 2, FLAGS },
    { "passes", "1 or 2", OFFSET(passes), AV_OPT_TYPE_INT,
      { .i64 = 1 }, 1, 2, FLAGS },
    { "mode", "two-pass mode: 1=upscale in 1st pass, 2=in 2nd", OFFSET(mode),
      AV_OPT_TYPE_INT, { .i64 = 1 }, 1, 2, FLAGS },
    { "evenoutput", "clamp output dims to even", OFFSET(evenoutput),
      AV_OPT_TYPE_INT, { .i64 = 0 }, 0, 1, FLAGS },
    /* precision tier — the analogue of vf_raisr's asm option (which
     * defaults to avx512fp16): f32 matches the reference's AVX2/AVX512
     * quality; bf16 is the qualified fast tier; int8 is the fixed-point
     * fast tier for 8-bit content (docs/PARITY.md) */
    { "tier", "precision tier (f32|bf16|int8)", OFFSET(tier),
      AV_OPT_TYPE_STRING, { .str = NULL }, 0, 0, FLAGS },
    /* vf_raisr's asm option (vf_raisr.c:90), mapped onto precision tiers so
     * reference command lines drop in: avx512fp16 (the reference's
     * half-precision default) -> bf16, avx512/avx2/opencl (f32-grade
     * paths) -> f32. An explicit tier= wins over asm=. */
    { "asm", "vf_raisr compatibility: avx512fp16->bf16 tier, "
      "avx512|avx2|opencl->f32 tier", OFFSET(asm_compat),
      AV_OPT_TYPE_STRING, { .str = NULL }, 0, 0, FLAGS },
    /* accepted for drop-in compatibility with vf_raisr command lines:
     * scheduling is XLA-managed on TPU, so threadcount is advisory */
    { "threadcount", "accepted for vf_raisr compatibility (scheduling is "
      "XLA-managed)", OFFSET(threadcount), AV_OPT_TYPE_INT,
      { .i64 = 20 }, 1, 120, FLAGS },
    /* vf_raisr's OpenCL platform index (vf_raisr.c:91): meaningless on a
     * TPU runtime, accepted so reference command lines drop in */
    { "platform", "accepted for vf_raisr compatibility (no OpenCL "
      "platforms on a TPU runtime)", OFFSET(platform), AV_OPT_TYPE_INT,
      { .i64 = 0 }, 0, INT_MAX, FLAGS },
    /* chip selection for one-process-per-chip deployments — the analogue
     * of vf_raisr's device option (OpenCL device index) */
    { "device", "accelerator chip index", OFFSET(device), AV_OPT_TYPE_INT,
      { .i64 = 0 }, 0, INT_MAX, FLAGS },
    { NULL }
};

AVFILTER_DEFINE_CLASS(raisr_tpu);

static av_cold int init(AVFilterContext *ctx)
{
    RaisrTpuContext *s = ctx->priv;
    RTPUStatus st;
    RTPURangeType range;
    RTPUTier tier;

    if (!s->range || !strcmp(s->range, "video") || !strcmp(s->range, "1")) {
        range = RTPU_RANGE_VIDEO;
    } else if (!strcmp(s->range, "full") || !strcmp(s->range, "2")) {
        range = RTPU_RANGE_FULL;
    } else {
        av_log(ctx, AV_LOG_ERROR,
               "unknown range '%s' (expected video or full)\n", s->range);
        return AVERROR(EINVAL);
    }

    if (s->tier) {
        if (!strcmp(s->tier, "bf16"))      tier = RTPU_TIER_BF16;
        else if (!strcmp(s->tier, "int8")) tier = RTPU_TIER_INT8;
        else if (!strcmp(s->tier, "f32"))  tier = RTPU_TIER_F32;
        else {
            av_log(ctx, AV_LOG_ERROR,
                   "unknown tier '%s' (expected f32, bf16 or int8)\n",
                   s->tier);
            return AVERROR(EINVAL);
        }
    } else if (s->asm_compat) {
        /* reference command lines select precision via asm=; anything
         * f32-grade (avx512, avx2, opencl) maps to the f32 tier.
         * Reject unknown values like vf_raisr does (vf_raisr.c:129-132)
         * so a typo can't silently change the selected tier. */
        if (!strcmp(s->asm_compat, "avx512fp16")) {
            tier = RTPU_TIER_BF16;
        } else if (!strcmp(s->asm_compat, "avx512") ||
                   !strcmp(s->asm_compat, "avx2") ||
                   !strcmp(s->asm_compat, "opencl")) {
            tier = RTPU_TIER_F32;
        } else {
            av_log(ctx, AV_LOG_ERROR,
                   "unknown asm '%s' (expected avx512fp16, avx512, avx2 "
                   "or opencl)\n", s->asm_compat);
            return AVERROR(EINVAL);
        }
    } else {
        tier = RTPU_TIER_F32;
    }

    s->framecount = 0;
    if (s->device > 0) {
        st = RTPU_SetDevice(s->device);
        if (st != RTPU_OK) {
            av_log(ctx, AV_LOG_ERROR, "RTPU_SetDevice(%d) failed: %d\n",
                   s->device, (int)st);
            return AVERROR(EINVAL);
        }
    }
    st = RTPU_InitEx(s->filterfolder, s->ratio, (unsigned)s->bits,
                     range, (unsigned)s->passes, (unsigned)s->mode, tier);
    if (st != RTPU_OK) {
        av_log(ctx, AV_LOG_ERROR, "RTPU_Init failed: %d\n", (int)st);
        return AVERROR(EINVAL);
    }
    return 0;
}

static const enum AVPixelFormat pix_fmts[] = {
    AV_PIX_FMT_YUV420P, AV_PIX_FMT_YUV422P, AV_PIX_FMT_YUV444P,
    AV_PIX_FMT_YUV420P10LE, AV_PIX_FMT_YUV422P10LE, AV_PIX_FMT_YUV444P10LE,
    AV_PIX_FMT_NONE
};

static int config_props_input(AVFilterLink *inlink)
{
    AVFilterContext *ctx = inlink->dst;
    RaisrTpuContext *s = ctx->priv;
    const AVPixFmtDescriptor *desc = av_pix_fmt_desc_get(inlink->format);
    int depth = desc->comp[0].depth;

    /* The bits option selects the engine's sample interpretation while the
     * pixel format is negotiated independently; a mismatch (e.g. 10-bit
     * input without bits=10) would silently feed 16-bit buffers through the
     * 8-bit path. Fail loudly instead. (The reference filter shares this
     * surface but does not validate it, vf_raisr.c:101-121.) */
    if ((depth <= 8 ? 8 : depth) != s->bits) {
        av_log(ctx, AV_LOG_ERROR,
               "pixel format %s has %d-bit samples but bits=%d was "
               "requested; set bits=%d\n",
               desc->name, depth, s->bits, depth <= 8 ? 8 : depth);
        return AVERROR(EINVAL);
    }
    return 0;
}

static int config_props_output(AVFilterLink *outlink)
{
    AVFilterContext *ctx = outlink->src;
    RaisrTpuContext *s = ctx->priv;
    AVFilterLink *inlink = ctx->inputs[0];

    outlink->w = (int)(inlink->w * s->ratio);
    outlink->h = (int)(inlink->h * s->ratio);
    if (s->evenoutput) {
        outlink->w -= outlink->w % 2;
        outlink->h -= outlink->h % 2;
    }
    return 0;
}

static int filter_frame(AVFilterLink *inlink, AVFrame *in)
{
    AVFilterContext *ctx = inlink->dst;
    RaisrTpuContext *s = ctx->priv;
    AVFilterLink *outlink = ctx->outputs[0];
    const AVPixFmtDescriptor *desc = av_pix_fmt_desc_get(inlink->format);
    RTPUPlane pin[3], pout[3];
    AVFrame *out;
    RTPUStatus st;
    int p;

    out = ff_get_video_buffer(outlink, outlink->w, outlink->h);
    if (!out) {
        av_frame_free(&in);
        return AVERROR(ENOMEM);
    }
    av_frame_copy_props(out, in);

    s->nb_planes = av_pix_fmt_count_planes(inlink->format);
    for (p = 0; p < s->nb_planes && p < 3; p++) {
        int hsub = p ? desc->log2_chroma_w : 0;
        int vsub = p ? desc->log2_chroma_h : 0;

        pin[p].data = in->data[p];
        pin[p].width = AV_CEIL_RSHIFT(in->width, hsub);
        pin[p].height = AV_CEIL_RSHIFT(in->height, vsub);
        pin[p].step = in->linesize[p];

        pout[p].data = out->data[p];
        pout[p].width = AV_CEIL_RSHIFT(out->width, hsub);
        pout[p].height = AV_CEIL_RSHIFT(out->height, vsub);
        pout[p].step = out->linesize[p];
    }

    if (s->framecount == 0) {
        st = RTPU_SetRes(&pin[0], &pin[1], &pin[2],
                         &pout[0], &pout[1], &pout[2]);
        if (st != RTPU_OK) {
            av_log(ctx, AV_LOG_ERROR, "RTPU_SetRes failed: %d\n", (int)st);
            av_frame_free(&in);
            av_frame_free(&out);
            return AVERROR(EINVAL);
        }
    }

    st = RTPU_Process(&pin[0], &pin[1], &pin[2],
                      &pout[0], &pout[1], &pout[2],
                      (RTPUBlendingMode)s->blending);
    if (st != RTPU_OK) {
        av_log(ctx, AV_LOG_ERROR, "RTPU_Process failed: %d\n", (int)st);
        av_frame_free(&in);
        av_frame_free(&out);
        return AVERROR(EINVAL);
    }

    s->framecount++;
    av_frame_free(&in);
    return ff_filter_frame(outlink, out);
}

static av_cold void uninit(AVFilterContext *ctx)
{
    RTPU_Deinit();
}

static const AVFilterPad raisr_tpu_inputs[] = {
    {
        .name = "default",
        .type = AVMEDIA_TYPE_VIDEO,
        .filter_frame = filter_frame,
        .config_props = config_props_input,
    },
};

static const AVFilterPad raisr_tpu_outputs[] = {
    {
        .name = "default",
        .type = AVMEDIA_TYPE_VIDEO,
        .config_props = config_props_output,
    },
};

const AVFilter ff_vf_raisr_tpu = {
    .name = "raisr_tpu",
    .description = NULL_IF_CONFIG_SMALL(
        "TPU-accelerated RAISR video super-resolution (raisr_tpu)"),
    .priv_size = sizeof(RaisrTpuContext),
    .init = init,
    .uninit = uninit,
    FILTER_INPUTS(raisr_tpu_inputs),
    FILTER_OUTPUTS(raisr_tpu_outputs),
    FILTER_PIXFMTS_ARRAY(pix_fmts),
    .priv_class = &raisr_tpu_class,
    .flags = AVFILTER_FLAG_SUPPORT_TIMELINE_GENERIC,
};
