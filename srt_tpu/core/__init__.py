from srt_tpu.core.vecmath import (  # noqa: F401
    dot, cross, normalize, length, length_sq, vec3, reflect, refract_dir,
)
from srt_tpu.core.onb import OrthonormalBasis  # noqa: F401
from srt_tpu.core.ray import Ray  # noqa: F401
from srt_tpu.core.rng import RaySampler  # noqa: F401
