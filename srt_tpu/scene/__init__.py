from srt_tpu.scene.ir import Scene, MaterialType, TextureType  # noqa: F401
from srt_tpu.scene.build import SceneBuilder  # noqa: F401
