/* COMPILE-CHECK SHIM — see avfilter.h in this directory. */
#ifndef RAISR_TPU_COMPILE_SHIM_VIDEO_H
#define RAISR_TPU_COMPILE_SHIM_VIDEO_H
#include "avfilter.h"

AVFrame *ff_get_video_buffer(AVFilterLink *link, int w, int h);

#endif
