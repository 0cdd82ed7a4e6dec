from srt_tpu.pallas.intersect import (  # noqa: F401
    intersect_tris_pallas, pallas_available)
