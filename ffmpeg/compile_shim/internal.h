/* COMPILE-CHECK SHIM — see avfilter.h in this directory. */
#ifndef RAISR_TPU_COMPILE_SHIM_INTERNAL_H
#define RAISR_TPU_COMPILE_SHIM_INTERNAL_H
#include "avfilter.h"
#endif
