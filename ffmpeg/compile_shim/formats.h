/* COMPILE-CHECK SHIM — see avfilter.h in this directory. */
#ifndef RAISR_TPU_COMPILE_SHIM_FORMATS_H
#define RAISR_TPU_COMPILE_SHIM_FORMATS_H
#include "avfilter.h"
#endif
