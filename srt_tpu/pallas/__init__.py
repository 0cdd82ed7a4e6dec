from srt_tpu.pallas.intersect import (  # noqa: F401
    intersect_tris_pallas, pallas_available)
from srt_tpu.pallas.intersect_big import (  # noqa: F401
    intersect_tris_pallas_big, pallas_big_available)
