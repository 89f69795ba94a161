from fdbm_tpu.ops.upfirdn2d import downsample_2d, upfirdn2d, upsample_2d

__all__ = ["upfirdn2d", "upsample_2d", "downsample_2d"]
