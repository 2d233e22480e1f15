/*
 * COMPILE-CHECK SHIM — not the FFmpeg API.
 *
 * Hosts without libavfilter-dev can still type-check vf_raisr_tpu.c under a
 * real compiler against the REAL libavutil headers (AVFrame, AVOption,
 * pixdesc, error codes — the parts the frame loop actually manipulates).
 * This header declares only the minimal libavfilter surface the filter
 * touches, with layouts sufficient for compilation; it is NEVER used to
 * build a runnable filter. The authoritative build is against a genuine
 * FFmpeg n6.x tree (ffmpeg/build_ffmpeg_ci.sh, run in CI), mirroring how
 * the reference builds its vf_raisr (reference ffmpeg/vf_raisr.c).
 */
#ifndef RAISR_TPU_COMPILE_SHIM_AVFILTER_H
#define RAISR_TPU_COMPILE_SHIM_AVFILTER_H

#include "libavutil/avutil.h"
#include "libavutil/frame.h"
#include "libavutil/log.h"
#include "libavutil/opt.h"

typedef struct AVFilterContext AVFilterContext;
typedef struct AVFilterLink AVFilterLink;
typedef struct AVFilterPad AVFilterPad;

struct AVFilterLink {
    AVFilterContext *src;
    AVFilterContext *dst;
    int format;
    int w, h;
};

struct AVFilterContext {
    const AVClass *av_class;
    void *priv;
    AVFilterLink **inputs;
    AVFilterLink **outputs;
};

struct AVFilterPad {
    const char *name;
    enum AVMediaType type;
    int (*filter_frame)(AVFilterLink *link, AVFrame *frame);
    int (*config_props)(AVFilterLink *link);
};

typedef struct AVFilter {
    const char *name;
    const char *description;
    int priv_size;
    int (*init)(AVFilterContext *ctx);
    void (*uninit)(AVFilterContext *ctx);
    const AVFilterPad *inputs;
    const AVFilterPad *outputs;
    unsigned nb_inputs;
    unsigned nb_outputs;
    const enum AVPixelFormat *pix_fmts;
    const AVClass *priv_class;
    int flags;
} AVFilter;

#define AVFILTER_FLAG_SUPPORT_TIMELINE_GENERIC (1 << 16)

#define AVFILTER_DEFINE_CLASS(fname)                                        \
    static const AVClass fname##_class = {                                  \
        .class_name = #fname,                                               \
        .item_name = av_default_item_name,                                  \
        .option = fname##_options,                                          \
        .version = LIBAVUTIL_VERSION_INT,                                   \
    }

#define FILTER_INPUTS(array)                                                \
    .inputs = array, .nb_inputs = sizeof(array) / sizeof((array)[0])
#define FILTER_OUTPUTS(array)                                               \
    .outputs = array, .nb_outputs = sizeof(array) / sizeof((array)[0])
#define FILTER_PIXFMTS_ARRAY(array) .pix_fmts = array

#ifndef NULL_IF_CONFIG_SMALL
#define NULL_IF_CONFIG_SMALL(x) (x)
#endif

int ff_filter_frame(AVFilterLink *link, AVFrame *frame);

#endif /* RAISR_TPU_COMPILE_SHIM_AVFILTER_H */
