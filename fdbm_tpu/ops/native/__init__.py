"""Native (C++) host-side components, loaded via ctypes.

Build: `python -m fdbm_tpu.ops.native.build` (or automatic on first use).
The framework falls back to pure-python implementations when the shared
library is unavailable.
"""

from fdbm_tpu.ops.native.wavio import (get_lib, load_crop_pair_native,
                                       native_available, read_wav_native)

__all__ = ["get_lib", "native_available", "read_wav_native",
           "load_crop_pair_native"]
