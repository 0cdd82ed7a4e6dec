from srt_tpu.render.api import render, RenderConfig  # noqa: F401
from srt_tpu.render.camera import Camera  # noqa: F401
