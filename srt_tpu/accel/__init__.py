from srt_tpu.accel.bvh import build_bvh, FlatBVH  # noqa: F401
