from srt_tpu.utils.metrics import RenderMetrics  # noqa: F401
