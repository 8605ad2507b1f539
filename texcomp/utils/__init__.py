"""Auxiliary subsystems: profiling, debug checks, serialization.

The reference ships none of these (SURVEY.md section 5: no tracing, no
runtime logging, DCHECK-only assertions, no persistence helpers); these are
the TPU-framework equivalents built new.
"""

from texcomp.utils.profiling import device_trace, throughput
from texcomp.utils.archive import load_archive, save_archive

__all__ = ["device_trace", "throughput", "save_archive", "load_archive"]
