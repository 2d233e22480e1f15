from raisr_tpu.utils.metrics import psnr, ssim
from raisr_tpu.utils.profiler import Tracer, device_fence, xprof_trace
from raisr_tpu.utils import logging

__all__ = ["psnr", "ssim", "Tracer", "device_fence", "xprof_trace", "logging"]
