from srt_tpu.materials.textures import texture_value  # noqa: F401
